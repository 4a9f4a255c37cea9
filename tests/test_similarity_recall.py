"""Measured recall of the approximate (LSH) similarity paths against
their exact oracles — the knob that makes the "scale path" claim
checkable: multi-probe for lsh_topk, multi-table for the LSH near-dup
pair finder."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.similarity import (brute_force_topk,
                                               cosine_near_dup_pairs,
                                               cosine_near_dups_lsh,
                                               lsh_topk, _as_matrix)

SF_DIR = "/root/testdata/sf0.01"


def _topk_sets(tbl):
    out: dict = {}
    for q, v in zip(tbl["query_id"].to_pylist(), tbl["vec_id"].to_pylist()):
        out.setdefault(q, set()).add(v)
    return out


def test_lsh_topk_multiprobe_recall():
    """recall(multiprobe=16) >= 0.9 at a ~17/64 scan fraction, and
    multiprobe strictly improves over probe-1 (measured 0.40 -> 1.00 on
    this corpus)."""
    import pyarrow.parquet as pq
    import ray.data

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    q = _as_matrix(t.slice(0, 20)["embedding"])

    exact = _topk_sets(brute_force_topk(ds, q, k=10))

    def recall(mp: int) -> float:
        ap = _topk_sets(lsh_topk(ds, q, k=10, n_planes=6, multiprobe=mp))
        return float(np.mean([
            len(exact[i] & ap.get(i, set())) / len(exact[i])
            for i in exact]))

    r0, r16 = recall(0), recall(16)
    assert r16 >= 0.9
    assert r16 > r0


def test_cosine_near_dups_lsh_table_recall():
    """Synthetic corpus with 40 planted near-dup pairs (cos >= 0.95):
    multi-table LSH recovers >= 0.9 of the exact pair set at 4 tables
    and recall is monotone in n_tables."""
    import ray.data

    rng = np.random.default_rng(17)
    d = 64
    base = rng.standard_normal((200, d)).astype(np.float32)
    jitter = base[:40] + 0.05 * rng.standard_normal((40, d)).astype(np.float32)
    m = np.vstack([base, jitter])
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d),
    })
    ds = ray.data.from_arrow(tbl)

    exact = cosine_near_dup_pairs(ds, threshold=0.9)
    epairs = set(zip(exact["key_a"].to_pylist(),
                     exact["key_b"].to_pylist()))
    assert len(epairs) >= 40  # all planted pairs found by the oracle

    def pair_recall(nt: int) -> float:
        lp = cosine_near_dups_lsh(ds, threshold=0.9, n_planes=10,
                                  n_tables=nt)
        got = set((r["key_a"], r["key_b"]) for r in lp.take_all())
        assert got <= epairs  # within-bucket check is exact: no FPs
        return len(got & epairs) / len(epairs)

    r1, r4 = pair_recall(1), pair_recall(4)
    assert r4 >= 0.9
    assert r4 >= r1
