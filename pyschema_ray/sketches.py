"""Mergeable sketches carried as binary columns through Arrow batches.

Dependency-free (numpy only) implementations of:

* :class:`TDigest`   — merging t-digest (public algorithm: Dunning &
  Ertl, "Computing extremely accurate quantiles using t-digests",
  arXiv:1902.04023) for quantiles over ``n_tok``.
* :class:`HyperLogLog` — dense HLL (Flajolet et al. 2007 / Heule et al.
  HLL++ linear-counting correction) for ``doc_id`` cardinality.
* :class:`GroupedHistogram` — fixed-width per-group histograms (the
  per-source token-count histograms) with under/overflow bins.

All three support ``add`` (vectorized over a numpy batch), ``merge``
(associative, for the partial -> final reduce), and ``to_bytes`` /
``from_bytes`` so partials travel as data between Ray tasks
(SURVEY.md §7 hard part 1).  The reference (spotify/pyschema) has no
sketches at all — these are mandated by the north rule.
"""

from __future__ import annotations

import pickle
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# stable vectorized hashing
# ---------------------------------------------------------------------------

def hash_strings(values) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a string array.

    Uses pandas' SipHash-based ``hash_array`` (fixed key, stable across
    processes and machines — unlike Python's ``hash``).  ``values`` may
    be a numpy object array, list, or an Arrow array (converted
    zero-copy where possible).
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def pa_key_type(series_or_array) -> pa.DataType:
    """Arrow type for a pandas Series / numpy key array: numeric
    dtypes map via numpy; object dtype means string keys (the only
    object-dtype keys these pipelines carry).  Every pandas-format
    ``map_groups`` emitter derives its output key type through this
    so empty and non-empty group outputs share ONE pinned schema —
    mixed or value-inferred schemas out of an exchange are the
    round-4 driver failure mode."""
    dt = series_or_array.dtype
    if dt == object:
        return pa.string()
    return pa.from_numpy_dtype(dt)


def default_exchange_shards() -> int:
    """Cluster-proportional exchange width (4 tasks per core, floor
    64) — THE sizing rule for every bounded integer-shard shuffle in
    this package (dedup exchanges, uniqueness buckets, session shards,
    range-join buckets).  One definition so the paths cannot diverge.
    Resolved lazily at pipeline-construction time on the driver."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:  # noqa: BLE001
        cpus = 16
    return max(64, cpus * 4)


def hash_strings2(values) -> np.ndarray:
    """Second INDEPENDENTLY-KEYED SipHash of the same strings (different
    SipHash key, not a mix of the first hash — mixing would collide
    exactly when the first does).  Pairs with :func:`hash_strings` for
    a 128-bit combined content identity: at 10^12 distinct texts,
    64-bit equality alone yields ~birthday-bound false merges, 128-bit
    makes them negligible (~1e-14)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False,
                              hash_key="f1e2d3c4b5a69788")


_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(h: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64 finalizer — cheap vectorized re-hash of uint64 values
    with a seed, for minhash permutations / HLL independence."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        z = h + np.uint64((seed + 1) * 0x9E3779B97F4A7C15 % (1 << 64))
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
        return z ^ (z >> np.uint64(31))


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function.

    Centroids kept as parallel numpy arrays; batch ``add`` sorts the
    incoming values, concatenates with existing centroids and
    recompresses — O(n log n) in the batch, with one short Python loop
    over at most ~2*compression centroids.
    """

    __slots__ = ("compression", "means", "weights", "count", "min", "max",
                 "_unmerged")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf

    # -- updates ----------------------------------------------------------
    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += v.size
        m = np.concatenate([self.means, v])
        w = np.concatenate([self.weights, np.ones(v.size)])
        self._compress(m, w)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.count == 0:
            return self
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.count += other.count
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        self._compress(m, w)
        return self

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Fully vectorized compression: each (sorted) point is assigned
        to the k-scale bin ``floor(k(q_mid))``; k has range compression/2,
        so this yields <= compression/2 + 1 centroids, each spanning a
        k-width <= 1 (the t-digest size invariant).  No Python loop over
        values — reduceat does the clustering."""
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()
        norm = self.compression / (2.0 * np.pi)
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        k = norm * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1.0, 1.0))
        bins = np.floor(k).astype(np.int64)
        change = np.nonzero(np.diff(bins))[0] + 1
        starts = np.concatenate([[0], change])
        new_w = np.add.reduceat(weights, starts)
        new_m = np.add.reduceat(means * weights, starts) / new_w
        self.means = new_m
        self.weights = new_w

    # -- queries ----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.count == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        target = q * self.count
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            # interpolate from the minimum
            frac = target / max(cum[0], 1e-12)
            return float(self.min + frac * (self.means[0] - self.min))
        if target >= cum[-1]:
            span = self.count - cum[-1]
            frac = (target - cum[-1]) / max(span, 1e-12)
            return float(self.means[-1] + frac * (self.max - self.means[-1]))
        idx = np.searchsorted(cum, target)
        lo, hi = cum[idx - 1], cum[idx]
        frac = (target - lo) / max(hi - lo, 1e-12)
        return float(self.means[idx - 1]
                     + frac * (self.means[idx] - self.means[idx - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def clone(self) -> "TDigest":
        """Deep copy — ``merge`` mutates self, so any holder that stores a
        sketch it did not create must clone first (aliasing hazard)."""
        td = TDigest(self.compression)
        td.means = self.means.copy()
        td.weights = self.weights.copy()
        td.count, td.min, td.max = self.count, self.min, self.max
        return td

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps({
            "c": self.compression, "m": self.means, "w": self.weights,
            "n": self.count, "lo": self.min, "hi": self.max,
        }, protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        d = pickle.loads(b)
        td = cls(d["c"])
        td.means, td.weights = d["m"], d["w"]
        td.count, td.min, td.max = d["n"], d["lo"], d["hi"]
        return td


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HyperLogLog:
    """Dense HLL over precomputed uint64 hashes.

    p=14 -> 16384 one-byte registers, ~0.8% standard error.  The rank
    computation is fully vectorized: the low ``64-p`` bits fit exactly
    in a float64 (64-14=50 < 53), so ``floor(log2)`` is exact.
    """

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        assert 4 <= p <= 16
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        low_bits = 64 - self.p
        w = h & np.uint64((1 << low_bits) - 1)
        rank = np.empty(h.size, dtype=np.uint8)
        zero = w == 0
        rank[zero] = low_bits + 1
        nz = ~zero
        # exact: values < 2^50 are exactly representable in float64
        rank[nz] = (low_bits - np.floor(np.log2(w[nz].astype(np.float64)))) \
            .astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_strings(self, values) -> "HyperLogLog":
        return self.add_hashes(hash_strings(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def clone(self) -> "HyperLogLog":
        """Deep copy — ``merge`` mutates self (see TDigest.clone)."""
        h = HyperLogLog(self.p)
        h.registers = self.registers.copy()
        return h

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + zlib.compress(self.registers.tobytes(), 1)

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        hll = cls(b[0])
        hll.registers = np.frombuffer(
            zlib.decompress(b[1:]), dtype=np.uint8).copy()
        return hll


# ---------------------------------------------------------------------------
# grouped fixed-width histogram
# ---------------------------------------------------------------------------

class GroupedHistogram:
    """Per-group fixed-width histograms over a numeric column, e.g. the
    per-source ``n_tok`` histograms.  ``nbins`` regular bins over
    [lo, hi) plus an underflow and an overflow bin (indices 0 and
    nbins+1 of each stored vector)."""

    __slots__ = ("lo", "hi", "nbins", "groups")

    def __init__(self, lo: float, hi: float, nbins: int = 64):
        self.lo = float(lo)
        self.hi = float(hi)
        self.nbins = int(nbins)
        self.groups: dict[str, np.ndarray] = {}

    def _bin(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        idx = np.floor((v - self.lo) / (self.hi - self.lo) * self.nbins)
        idx = np.clip(idx + 1, 0, self.nbins + 1)
        return idx.astype(np.int64)

    def add(self, group_keys, values) -> "GroupedHistogram":
        """Vectorized: factorize group keys once, single bincount over
        ``code * width + bin``."""
        keys = np.asarray(group_keys, dtype=object)
        v = np.asarray(values, dtype=np.float64)
        ok = ~np.isnan(v)
        null_key = pd.isnull(keys)
        ok &= ~null_key
        if not ok.any():
            return self
        keys, v = keys[ok], v[ok]
        codes, uniques = pd.factorize(keys)
        width = self.nbins + 2
        combined = codes.astype(np.int64) * width + self._bin(v)
        counts = np.bincount(combined, minlength=len(uniques) * width)
        counts = counts.reshape(len(uniques), width)
        for g, row in zip(uniques, counts):
            cur = self.groups.get(g)
            if cur is None:
                self.groups[g] = row.astype(np.int64)
            else:
                cur += row
        return self

    def merge(self, other: "GroupedHistogram") -> "GroupedHistogram":
        assert (self.lo, self.hi, self.nbins) == (other.lo, other.hi, other.nbins)
        for g, row in other.groups.items():
            cur = self.groups.get(g)
            if cur is None:
                self.groups[g] = row.copy()
            else:
                cur += row
        return self

    def total(self) -> np.ndarray:
        out = np.zeros(self.nbins + 2, dtype=np.int64)
        for row in self.groups.values():
            out += row
        return out

    def clone(self) -> "GroupedHistogram":
        """Deep copy — ``merge`` mutates self (see TDigest.clone)."""
        h = GroupedHistogram(self.lo, self.hi, self.nbins)
        h.groups = {k: v.copy() for k, v in self.groups.items()}
        return h

    def to_bytes(self) -> bytes:
        return pickle.dumps({
            "lo": self.lo, "hi": self.hi, "nb": self.nbins,
            "g": {k: v for k, v in self.groups.items()},
        }, protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "GroupedHistogram":
        d = pickle.loads(b)
        h = cls(d["lo"], d["hi"], d["nb"])
        h.groups = {k: np.asarray(v, dtype=np.int64) for k, v in d["g"].items()}
        return h


# ---------------------------------------------------------------------------
# drift measures over histograms
# ---------------------------------------------------------------------------

def _normalize(counts: np.ndarray, eps: float) -> np.ndarray:
    p = counts.astype(np.float64) + eps
    return p / p.sum()


def kl_divergence(p_counts: np.ndarray, q_counts: np.ndarray,
                  eps: float = 1e-6) -> float:
    """KL(P || Q) over two histogram count vectors (eps-smoothed)."""
    p = _normalize(np.asarray(p_counts), eps)
    q = _normalize(np.asarray(q_counts), eps)
    return float(np.sum(p * np.log(p / q)))


def psi(expected_counts: np.ndarray, actual_counts: np.ndarray,
        eps: float = 1e-6) -> float:
    """Population Stability Index; common rule of thumb: <0.1 stable,
    0.1-0.25 moderate shift, >0.25 drifted."""
    e = _normalize(np.asarray(expected_counts), eps)
    a = _normalize(np.asarray(actual_counts), eps)
    return float(np.sum((a - e) * np.log(a / e)))


# ---------------------------------------------------------------------------
# per-worker broadcast memo
# ---------------------------------------------------------------------------

_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


def cached_broadcast(ref, build):
    """Per-worker memo for derived views of a ``ray.put`` broadcast:
    ``ray.get`` itself is cheap (plasma-cached), but rebuilding a
    Python-side lookup (``to_pylist`` + pandas Series/dict) per BATCH
    turns a broadcast into O(batches x lookup).  ``build(obj)`` runs
    once per worker per ref; a tiny LRU-ish cap bounds worker memory
    across many distinct broadcasts."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    got = _BROADCAST_CACHE.get(key)
    if got is None:
        got = build(ray.get(ref))
        if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = got
    return got


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005 — public
    algorithm): approximate frequencies in ``depth x width`` counters.
    Guarantees (one-sided): estimate >= true count always; estimate
    <= true + eps*N with probability 1 - delta, for eps = e/width,
    delta = e^-depth.  MERGEABLE by elementwise addition, which is
    what makes it a combiner: per-batch sketches sum across any
    exchange or on the driver without error growth.

    Rows are indexed by double hashing over the two keyed SipHashes
    (``(h1 + row*h2) mod width`` — same public Kirsch-Mitzenmacher
    construction as the Bloom filter), so updates and queries are one
    vectorized ``np.add.at`` / gather per row, no per-item Python.
    """

    __slots__ = ("depth", "width", "table")

    def __init__(self, depth: int = 4, width: int = 4096,
                 table: np.ndarray | None = None):
        self.depth = depth
        self.width = width
        self.table = (np.zeros((depth, width), np.int64)
                      if table is None else table)

    def _cols(self, values) -> np.ndarray:
        """(depth, n) column indices via double hashing."""
        values = np.asarray(values, dtype=object)
        h1 = hash_strings(values)
        h2 = hash_strings2(values) | np.uint64(1)
        r = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + r * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def update(self, values, counts=None) -> "CountMinSketch":
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return self
        c = (np.ones(len(values), np.int64) if counts is None
             else np.asarray(counts, np.int64))
        cols = self._cols(values)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], c)
        return self

    def query(self, values) -> np.ndarray:
        """Vectorized point estimates (min over rows)."""
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.zeros(0, np.int64)
        cols = self._cols(values)
        ests = self.table[np.arange(self.depth)[:, None], cols]
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.table += other.table
        return self

    def to_row(self) -> "pa.Table":
        """One-row Arrow table carrying the flattened counters — the
        exchange format for distributed combines."""
        return pa.table({
            "depth": pa.array([self.depth], pa.int64()),
            "width": pa.array([self.width], pa.int64()),
            "counters": pa.array([self.table.reshape(-1)],
                                 pa.list_(pa.int64())),
        })

    @classmethod
    def from_rows(cls, t: "pa.Table") -> "CountMinSketch":
        """Sum any number of ``to_row`` rows back into one sketch."""
        depth = t["depth"][0].as_py()
        width = t["width"][0].as_py()
        out = cls(depth, width)
        for lst in t["counters"].to_pylist():
            out.table += np.asarray(lst, np.int64).reshape(depth, width)
        return out
