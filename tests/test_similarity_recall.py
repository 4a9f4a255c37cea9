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


def test_centroid_shift_matches_reference():
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyschema_ray.functions.similarity import centroid_shift

    rng = np.random.default_rng(61)
    n, d = 300, 8
    labels = rng.integers(0, 4, n)
    emb = rng.normal(0, 1, (n, d)).astype(np.float32)
    emb[labels == 2] += 3.0        # label 2 is far from the centroid
    t = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = centroid_shift(ds, "label", "embedding")
    assert out["label"].to_pylist() == [0, 1, 2, 3]

    # quantized reference
    q = np.copysign(np.floor(np.abs(emb.astype(np.float64) * 1e6)
                             + 0.5), emb).astype(object)
    N = n
    S = q.sum(axis=0)
    for row in out.to_pylist():
        g = row["label"]
        m = labels == g
        ng = int(m.sum())
        sg = q[m].sum(axis=0)
        tot = sum(int(sg[i] * N - S[i] * ng) ** 2 for i in range(d))
        want = math.sqrt(float(tot)) / (float(ng) * float(N) * 1e6)
        assert row["n"] == ng
        assert row["shift"] == want
    shifts = {r["label"]: r["shift"] for r in out.to_pylist()}
    assert shifts[2] == max(shifts.values())
    assert shifts[2] > 2.0
