"""Weighted reservoir sampling (A-Res): exact distributed-vs-local
parity of the deterministic formula, partitioning invariance, and
weight-proportional inclusion across seeds."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.dedup import _key_hash
from pyschema_ray.functions.sample import _U64_SPAN, weighted_sample_keys


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _local_topk(keys, weights, k, seed):
    h = _key_hash(np.asarray(keys), seed).astype(np.float64)
    u = (h + 0.5) / _U64_SPAN
    score = np.log(u) / np.asarray(weights, np.float64)
    order = np.lexsort((np.asarray(keys), -score))[:k]
    return sorted(np.asarray(keys)[order].tolist())


def test_parity_and_partitioning_invariance():
    rng = np.random.default_rng(3)
    keys = np.arange(500, dtype=np.int64)
    weights = rng.integers(1, 400, 500).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(keys, pa.int64()),
                    "n_chars": pa.array(weights, pa.int64())})
    want = _local_topk(keys, weights, 40, seed=7)
    for blocks in (1, 3, 11):
        out = weighted_sample_keys(_ds(tbl, blocks), "doc_id",
                                   "n_chars", k=40, seed=7)
        got = sorted(out["doc_id"].to_pylist())
        assert got == want, blocks
        # scores are the exact formula values (float64-equal)
        sc = dict(zip(out["doc_id"].to_pylist(),
                      out["score"].to_pylist()))
        h = _key_hash(np.asarray(sorted(sc)), 7).astype(np.float64)
        ref = np.log((h + 0.5) / _U64_SPAN) \
            / weights[np.asarray(sorted(sc))]
        assert np.array_equal(np.array([sc[k_] for k_ in sorted(sc)]),
                              ref)


def test_weight_proportional_inclusion():
    """Across many seeds, a 50x-heavier row is sampled far more often
    — the A-Res guarantee (P[i in sample] increases with w_i)."""
    n = 200
    keys = np.arange(n, dtype=np.int64)
    weights = np.where(keys < 20, 500, 10).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(keys, pa.int64()),
                    "n_chars": pa.array(weights, pa.int64())})
    import ray.data

    ds = ray.data.from_arrow(tbl)
    heavy_hits = light_hits = 0
    for seed in range(30):
        got = weighted_sample_keys(ds, "doc_id", "n_chars", k=20,
                                   seed=seed)["doc_id"].to_pylist()
        heavy_hits += sum(1 for k_ in got if k_ < 20)
        light_hits += sum(1 for k_ in got if k_ >= 20)
    assert heavy_hits > 3 * light_hits


def test_zero_and_null_weights_excluded():
    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "n_chars": pa.array([0, None, -5, 10], pa.int64())})
    out = weighted_sample_keys(_ds(tbl, 2), "doc_id", "n_chars", k=10,
                               seed=1)
    assert out["doc_id"].to_pylist() == [4]
