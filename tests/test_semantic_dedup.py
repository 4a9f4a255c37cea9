"""SemDeDup-style semantic dedup: exact parity of the distributed
composition (kmeans -> within-cluster cosine pairs -> connected
components -> anti-join keep) against a single-process numpy reference
run from the SAME centroids, plus planted-duplicate invariants."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.similarity import (_normalize,
                                               kmeans_fit,
                                               semantic_dedup_keep)

D = 16
THRESHOLD = 0.95


def _corpus():
    """160 well-separated bases + 30 planted near-copies of bases
    0..29 (cos >= 0.99 after the 0.01 jitter)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((160, D)).astype(np.float32)
    dups = base[:30] + 0.01 * rng.standard_normal((30, D)).astype(np.float32)
    m = np.vstack([base, dups])
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), D),
    })
    return m, ids, tbl


def _reference_keep(m: np.ndarray, ids: np.ndarray,
                    cent: np.ndarray) -> list[int]:
    """Single-process reference: assign to the given centroids, exact
    within-cluster pairs, union-find with min labels, keep
    label == id."""
    c = cent.astype(np.float32)
    d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
    assign = d2.argmin(axis=1)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mn = _normalize(m)
    for cl in np.unique(assign):
        sel = np.flatnonzero(assign == cl)
        sub = mn[sel]
        sims = sub @ sub.T
        ai, bi = np.nonzero(np.triu(sims >= THRESHOLD, k=1))
        for a, b in zip(sel[ai], sel[bi]):
            ra, rb = find(int(ids[a])), find(int(ids[b]))
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    return sorted(i for i in parent if find(i) == i)


def test_semantic_dedup_parity_and_planted_dups():
    import ray.data

    m, ids, tbl = _corpus()
    ds = ray.data.from_arrow(tbl)

    kept_ds = semantic_dedup_keep(ds, threshold=THRESHOLD, k=6, iters=5,
                                  seed=3)
    kept = sorted(v for t in kept_ds.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)
                  for v in t["vec_id"].to_pylist())

    # reference from the SAME deterministic centroids
    cent = kmeans_fit(ds, k=6, iters=5, seed=3)
    ref = _reference_keep(m, ids, cent)
    assert kept == ref

    # planted invariants: a 0.01-jitter copy is cos>=0.99 similar and
    # lands in the same k-means cell as its base, so the copy (larger
    # id) must be dropped and the base kept
    dropped = set(ids.tolist()) - set(kept)
    assert dropped, "planted near-copies must drop"
    assert all(d >= 160 for d in dropped)  # bases always survive
    assert set(range(160)) <= set(kept)
    # nearly every planted copy dedups against its base; a copy whose
    # jitter crosses a Voronoi boundary is the documented SemDeDup
    # recall loss (clusters partition the candidate space)
    assert dropped <= {160 + i for i in range(30)}
    assert len(dropped) >= 25


def test_semantic_dedup_no_dups_is_identity():
    """Orthogonal-ish corpus with nothing above threshold: every key
    is kept."""
    import ray.data

    rng = np.random.default_rng(11)
    m = rng.standard_normal((64, D)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(64, dtype=np.int64), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), D),
    })
    ds = ray.data.from_arrow(tbl)
    kept_ds = semantic_dedup_keep(ds, threshold=0.99, k=4, iters=3,
                                  seed=5)
    kept = sorted(v for t in kept_ds.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)
                  for v in t["vec_id"].to_pylist())
    assert kept == list(range(64))
