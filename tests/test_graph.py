"""Distributed PageRank vs a single-process numpy reference —
identical update rule (teleport + damped contributions + uniform
dangling redistribution), tolerance 1e-9; plus structural invariants
(mass conservation, dangling handling, parallel-edge multiplicity,
empty input).  One test forces the distributed exchange path with
small_edges_threshold=0; the rest exercise the adaptive driver fast
path (identical semantics, no per-iteration exchange overhead)."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.graph import pagerank


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _ranks(ds) -> dict:
    out = {}
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for n, r in zip(t["node"].to_pylist(), t["rank"].to_pylist()):
            out[n] = r
    return out


def _ref_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dmass = r[deg == 0].sum()
        contrib = np.zeros(n)
        for s, d_ in edges:
            contrib[idx[d_]] += r[idx[s]] / deg[idx[s]]
        r = (1 - damping) / n + damping * (dmass / n + contrib)
    return dict(zip(nodes, r))


def _edge_table(edges):
    return pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([d for _, d in edges], pa.int64()),
    })


EDGES = [(1, 2), (1, 2), (2, 3), (3, 1), (1, 4), (5, 1)]


def test_pagerank_fast_path_matches_reference():
    got = _ranks(pagerank(_ds(_edge_table(EDGES)), damping=0.85,
                          iters=12))
    want = _ref_pagerank(EDGES, 0.85, 12)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_distributed_path_matches_reference():
    """small_edges_threshold=0 forces the full exchange machinery;
    narrow shards + few iters keep the fixed per-round cost sane in
    the 4-CPU test session."""
    rng = np.random.default_rng(13)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(400, 2))]
    got = _ranks(pagerank(_ds(_edge_table(edges), 5), iters=4,
                          num_shards=4, small_edges_threshold=0))
    want = _ref_pagerank(edges, 0.85, 4)
    assert set(got) == set(want)
    err = max(abs(got[k] - want[k]) for k in want)
    assert err < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_ordering():
    """Hub with many in-links outranks leaves."""
    edges = [(i, 0) for i in range(1, 9)] + [(0, 1)]
    got = _ranks(pagerank(_ds(_edge_table(edges)), iters=20))
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(2, 9))


def test_pagerank_empty():
    t = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    assert _ranks(pagerank(_ds(t, 1))) == {}


def _tri_brute(edges) -> int:
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), np.int64)
    for u, v in edges:
        if u != v:
            A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1
    return int(np.trace(A @ A @ A) // 6)


def _tri_count(ds) -> int:
    from pyschema_ray.functions.graph import triangle_count

    t = pa.concat_tables(
        [b for b in triangle_count(ds, "src", "dst", num_shards=5)
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows])
    assert t.num_rows == 1
    return t["n_triangles"][0].as_py()


def _edges_tbl(pairs):
    return pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                     "dst": pa.array([p[1] for p in pairs], pa.int64())})


def test_triangle_count_random_graph():
    rng = np.random.default_rng(5)
    n_nodes, n_edges = 40, 260
    pairs = {(int(a), int(b)) for a, b in
             rng.integers(0, n_nodes, (n_edges, 2)) if a != b}
    # inject duplicates, reversals and self-loops: must be ignored
    raw = (list(pairs) + [(b, a) for a, b in list(pairs)[:50]]
           + list(pairs)[:30] + [(7, 7), (3, 3)])
    got = _tri_count(_ds(_edges_tbl(raw), 4))
    assert got == _tri_brute(pairs)
    assert got > 0


def test_triangle_count_shapes():
    # triangle + dangling edge
    assert _tri_count(_ds(_edges_tbl(
        [(1, 2), (2, 3), (1, 3), (3, 4)]), 2)) == 1
    # star graph: no triangles
    assert _tri_count(_ds(_edges_tbl(
        [(0, i) for i in range(1, 8)]), 2)) == 0
    # K4: 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri_count(_ds(_edges_tbl(k4), 3)) == 4
    # empty
    assert _tri_count(_ds(_edges_tbl([]), 1)) == 0


def test_local_clustering_matches_brute():
    from pyschema_ray.functions.graph import local_clustering

    rng = np.random.default_rng(13)
    pairs = {(int(a), int(b)) for a, b in
             rng.integers(0, 25, (120, 2)) if a != b}
    t = pa.concat_tables(
        [b for b in local_clustering(_ds(_edges_tbl(list(pairs)), 4),
                                     "src", "dst", num_shards=5)
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows]).sort_by([("node", "ascending")])
    # brute adjacency reference
    canon = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({x for e in canon for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), np.int64)
    for a, b in canon:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1
    tri_per = np.diag(A @ A @ A) // 2
    deg = A.sum(1)
    assert t["node"].to_pylist() == nodes
    assert t["degree"].to_pylist() == deg.tolist()
    assert t["n_triangles"].to_pylist() == tri_per.tolist()
    for d, nt, cc in zip(deg, tri_per, t["clustering"].to_pylist()):
        want = (2.0 * nt) / (d * (d - 1)) if d >= 2 else 0.0
        assert cc == want
    # global count consistency: sum of per-node triangles = 3 * total
    assert sum(tri_per) == 3 * _tri_brute(canon)


def test_triangle_paths_agree():
    """All three plans agree: the default driver fast path
    (small_edges), the distributed plan with broadcast degree attach
    (small=0), and the fully distributed sentinel plan (both 0)."""
    from pyschema_ray.functions.graph import (local_clustering,
                                              triangle_count)

    rng = np.random.default_rng(17)
    pairs = list({(int(a), int(b)) for a, b in
                  rng.integers(0, 30, (150, 2)) if a != b})

    def one(**kw):
        t = pa.concat_tables(
            [b for b in triangle_count(_ds(_edges_tbl(pairs), 4),
                                       "src", "dst", num_shards=5,
                                       **kw)
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows])
        return t["n_triangles"][0].as_py()

    local = one()
    bcast = one(small_edges_threshold=0)
    dist = one(small_edges_threshold=0, broadcast_nodes_threshold=0)
    assert local == bcast == dist

    def cc(**kw):
        return pa.concat_tables(
            [b for b in local_clustering(_ds(_edges_tbl(pairs), 4),
                                         "src", "dst", num_shards=5,
                                         **kw)
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]).sort_by("node")

    a = cc()
    b = cc(small_edges_threshold=0)
    c = cc(small_edges_threshold=0, broadcast_nodes_threshold=0)
    assert a.equals(b) and a.equals(c)
