"""Deterministic sampling operators for corpus curation.

All samplers here are hash- (or mod-) deterministic per ROW: the same
row is kept or dropped regardless of partitioning, worker count, or
execution order — the property a resumable 100-TB pipeline needs (Ray's
``random_sample`` is seed-per-block and changes with repartitioning).
Each is a stateless ``map_batches`` filter: no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _key_hash

_U64_SPAN = float(1 << 64)


def hash_sample(ds, key_col: str = "doc_id", fraction: float = 0.1,
                seed: int = 0):
    """Keep rows where hash(key, seed) < fraction·2^64 — a uniform,
    deterministic ``fraction`` sample keyed on the row's identity.
    Different seeds give independent samples (e.g. train/holdout
    splits that remain disjoint under re-runs: disjoint fraction
    intervals of the SAME seed give exact disjointness)."""
    threshold = np.uint64(min(int(fraction * _U64_SPAN), (1 << 64) - 1))

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow")


def mod_sample(ds, key_col: str = "doc_id", modulus: int = 10,
               keep_residues=(0,)):
    """Keep rows where key % modulus ∈ keep_residues (integer keys).
    Less uniform than :func:`hash_sample` for structured keys, but
    exactly expressible in SQL — the oracle-checkable cousin."""
    keep = np.asarray(sorted(set(keep_residues)), dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(k % modulus, keep)))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, strata_col: str, fractions: dict,
                      key_col: str = "doc_id", seed: int = 0,
                      default_fraction: float = 0.0):
    """Per-stratum deterministic sampling: keep each row with its
    stratum's fraction (e.g. down-weight an over-represented source in
    a training mixture).  ``fractions`` = {stratum_value: fraction};
    strata not listed use ``default_fraction``.  Row-deterministic
    like :func:`hash_sample`; no shuffle (the stratum column is read
    per batch, never grouped)."""
    fr = dict(fractions)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        strata = t[strata_col].to_pylist()
        thresh = np.array(
            [min(int(fr.get(s, default_fraction) * _U64_SPAN),
                 (1 << 64) - 1) for s in strata], dtype=np.uint64)
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(f, batch_format="pyarrow")
