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
