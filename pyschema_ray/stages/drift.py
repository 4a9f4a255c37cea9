"""Distribution-drift checks (E8): KL divergence + PSI of per-source
``n_tok`` histograms vs a baseline profile held in a stateful actor
pool.

``BaselineProfile`` is the serialized reference distribution (built
once from a known-good sample by :func:`build_baseline_profile`).
``DriftScorer`` is the actor-pool stage: the profile is loaded ONCE per
actor in ``__init__`` (never per batch); ``__call__`` bins each batch
with the baseline's binning and emits a tiny histogram-partial row.
The partials merge downstream (associative vector adds) and
:func:`score_drift` computes per-source and overall KL/PSI against the
baseline on the merged result — so the expensive part streams and the
comparison is O(sources × bins).
"""

from __future__ import annotations

import json
import pickle
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..sketches import GroupedHistogram, kl_divergence, psi


@dataclass
class BaselineProfile:
    """Per-group baseline histogram + binning config."""

    lo: float
    hi: float
    nbins: int
    groups: dict  # group -> list[int] counts (nbins + 2 incl. under/overflow)

    def to_json(self) -> str:
        return json.dumps({
            "lo": self.lo, "hi": self.hi, "nbins": self.nbins,
            "groups": {k: [int(x) for x in v] for k, v in self.groups.items()},
        })

    @classmethod
    def from_json(cls, s: str) -> "BaselineProfile":
        d = json.loads(s)
        return cls(d["lo"], d["hi"], d["nbins"],
                   {k: np.asarray(v, dtype=np.int64)
                    for k, v in d["groups"].items()})

    @classmethod
    def load(cls, path: str) -> "BaselineProfile":
        with open(path) as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    def histogram(self) -> GroupedHistogram:
        g = GroupedHistogram(self.lo, self.hi, self.nbins)
        g.groups = {k: np.asarray(v, dtype=np.int64)
                    for k, v in self.groups.items()}
        return g


def build_baseline_profile(ds, value_column: str, group_column: str,
                           lo: float = 1.0, hi: float = 4096.0,
                           nbins: int = 64) -> BaselineProfile:
    """Build a profile from a known-good Dataset: streaming per-batch
    histogram partials, merged on the driver (tiny)."""
    def partial(t: pa.Table) -> pa.Table:
        g = GroupedHistogram(lo, hi, nbins)
        g.add(t[group_column].to_numpy(zero_copy_only=False),
              t[value_column].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([g.to_bytes()], pa.binary())})

    merged = GroupedHistogram(lo, hi, nbins)
    small = ds.select_columns([group_column, value_column]) \
              .map_batches(partial, batch_format="pyarrow")
    for b in small.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b["blob"].to_pylist():
            merged.merge(GroupedHistogram.from_bytes(blob))
    return BaselineProfile(lo, hi, nbins,
                           {k: v for k, v in merged.groups.items()})


class DriftScorer:
    """Actor-pool stage: ``ds.map_batches(DriftScorer,
    fn_constructor_kwargs={"profile_json": ...}, concurrency=(1, n),
    batch_format="pyarrow")``.  Emits one histogram-partial row per
    batch, binned identically to the baseline."""

    def __init__(self, profile_json: str, value_column: str,
                 group_column: str):
        # loaded once per actor — the stateful-stage pattern
        self.profile = BaselineProfile.from_json(profile_json)
        self.value_column = value_column
        self.group_column = group_column

    def __call__(self, t: pa.Table) -> pa.Table:
        g = GroupedHistogram(self.profile.lo, self.profile.hi,
                             self.profile.nbins)
        g.add(t[self.group_column].to_numpy(zero_copy_only=False),
              t[self.value_column].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([g.to_bytes()], pa.binary())})


def merge_partials(blob_ds) -> GroupedHistogram:
    """Merge the tiny partial stream (one row per batch)."""
    merged: GroupedHistogram | None = None
    for b in blob_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b["blob"].to_pylist():
            g = GroupedHistogram.from_bytes(blob)
            merged = g if merged is None else merged.merge(g)
    return merged if merged is not None else GroupedHistogram(0, 1, 1)


def score_drift(actual: GroupedHistogram, baseline: BaselineProfile,
                psi_threshold: float = 0.25,
                kl_threshold: float = 0.5) -> dict:
    """Per-group + overall KL/PSI.  A group present on one side only is
    compared against an eps-smoothed zero vector (maximal drift)."""
    base = baseline.histogram()
    width = baseline.nbins + 2
    zeros = np.zeros(width, dtype=np.int64)
    out: dict = {"groups": {}, "psi_threshold": psi_threshold,
                 "kl_threshold": kl_threshold}
    for g in sorted(set(actual.groups) | set(base.groups)):
        a = actual.groups.get(g, zeros)
        e = base.groups.get(g, zeros)
        out["groups"][g] = {"psi": psi(e, a), "kl": kl_divergence(a, e)}
    out["overall_psi"] = psi(base.total() if base.groups else zeros,
                             actual.total() if actual.groups else zeros)
    out["overall_kl"] = kl_divergence(
        actual.total() if actual.groups else zeros,
        base.total() if base.groups else zeros)
    out["passed"] = bool(out["overall_psi"] <= psi_threshold
                         and out["overall_kl"] <= kl_threshold)
    return out


def self_drift(ds, value_column: str, group_column: str,
               lo: float = 1.0, hi: float = 4096.0, nbins: int = 64,
               concurrency=(1, 4), psi_threshold: float = 0.25,
               kl_threshold: float = 0.5) -> tuple[dict, BaselineProfile]:
    """Drift of a table against ITSELF in ONE scan: the DriftScorer
    partial-histogram stream is computed once (binning-only profile —
    the scorer never reads the baseline's counts, only lo/hi/nbins) and
    the merged result serves as BOTH baseline and actual.  Numerically
    identical to build_baseline_profile + drift_pipeline on the same
    input, at half the scan cost — use it for profile bootstrapping /
    sanity runs; real drift checks against an EXTERNAL baseline use
    :func:`drift_pipeline`.

    Returns (scores, the profile) so callers can persist the profile
    as the baseline for subsequent runs."""
    binning = BaselineProfile(lo, hi, nbins, {})
    small = ds.select_columns([group_column, value_column]).map_batches(
        DriftScorer,
        fn_constructor_kwargs={
            "profile_json": binning.to_json(),
            "value_column": value_column,
            "group_column": group_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = merge_partials(small)
    profile = BaselineProfile(lo, hi, nbins, dict(merged.groups))
    return score_drift(merged, profile, psi_threshold, kl_threshold), profile


def drift_pipeline(ds, profile: BaselineProfile, value_column: str,
                   group_column: str, concurrency=(1, 4),
                   psi_threshold: float = 0.25,
                   kl_threshold: float = 0.5,
                   return_actual: bool = False):
    """End-to-end drift check against a STORED baseline profile:
    actor-pool scoring -> merge -> verdict.  With ``return_actual``,
    also returns the merged actual GroupedHistogram — its integer
    per-(group, bin) counts are exactly reproducible by any engine
    using the same binning, which is what makes the stored-profile
    path externally checkable even though PSI/KL are floats."""
    small = ds.select_columns([group_column, value_column]).map_batches(
        DriftScorer,
        fn_constructor_kwargs={
            "profile_json": profile.to_json(),
            "value_column": value_column,
            "group_column": group_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = merge_partials(small)
    scores = score_drift(merged, profile, psi_threshold, kl_threshold)
    if return_actual:
        return scores, merged
    return scores
