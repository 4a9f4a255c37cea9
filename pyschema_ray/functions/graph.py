"""Distributed graph analytics over edge Datasets, Ray-Data-first.

:func:`pagerank` — power-iteration PageRank over a (src, dst) edge
Dataset: the web-graph quality score a Common-Crawl-scale curation
pipeline attaches to pages before filtering (CCNet / RefinedWeb
lineage).  The implementation is the connected-components exchange
shape from functions/dedup.py re-used for numeric state:

* **Init (2 exchanges, once):** one node-hash groupby computes each
  node's out-degree + the node universe (rank rows, 1/N each); one
  src-hash groupby co-partitions edges with their out-degree to attach
  ``inv_deg`` (adjacency is then MATERIALIZED once and re-streamed
  every iteration — edges never re-shuffle).
* **Per iteration (2 exchanges + 1 column aggregate):** ranks re-shard
  to their sources' shard, each shard emits per-dst partial
  contributions ``rank[src] * inv_deg[src]`` (pre-summed per dst
  inside the shard task — a combiner); contributions then co-partition
  with the rank skeleton to form new ranks
  ``(1-d)/N + d * (contrib + D/N)``.  The dangling mass ``D`` is ONE
  scalar column aggregate over the materialized rank state (the
  ``state.sum`` trick from connected_components) — the driver holds
  two floats per iteration, never rows.

Every emitted block is Arrow with a pinned schema (the round-4
mixed-block lesson).  Scale: both exchanges are bounded node-hash
shard groupbys (`default_exchange_shards`); per-shard state is that
shard's nodes + edges.  Float contributions sum in shard-local numpy
order, so ranks are deterministic up to float associativity —
tolerance-tested against a single-process reference (rows-only at the
driver gate, like k-means).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import pa_key_type as _pa_key_type
from .dedup import _default_shards, _key_shards

_SEED = 23


def _shards_of(values, nb: int) -> np.ndarray:
    return _key_shards(values, nb, _SEED)


def _pagerank_local(edge_tbl: pa.Table, damping: float, iters: int,
                    src_col: str, dst_col: str):
    """Driver fast path: the identical update rule on a dense numpy
    state (node codes via one dictionary encode) — same semantics as
    the distributed path, minus ~1 s of exchange overhead per
    iteration."""
    import ray.data as rd

    src = edge_tbl[src_col].combine_chunks() \
        if isinstance(edge_tbl[src_col], pa.ChunkedArray) \
        else edge_tbl[src_col]
    dst = edge_tbl[dst_col].combine_chunks() \
        if isinstance(edge_tbl[dst_col], pa.ChunkedArray) \
        else edge_tbl[dst_col]
    ok = pc.and_(pc.is_valid(src), pc.is_valid(dst))
    src, dst = src.filter(ok), dst.filter(ok)
    kt = src.type
    both = pa.chunked_array([src, dst]).combine_chunks()
    enc = both.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = enc.dictionary
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], kt),
                                       "rank": pa.array([], pa.float64())}))
    s_codes, d_codes = codes[:len(src)], codes[len(src):]
    deg = np.bincount(s_codes, minlength=n).astype(np.float64)
    dang = deg == 0
    inv = np.where(dang, 0.0, 1.0 / np.maximum(deg, 1.0))
    r = np.full(n, 1.0 / n)
    d = float(damping)
    for _ in range(iters):
        dmass = r[dang].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, d_codes, r[s_codes] * inv[s_codes])
        r = (1.0 - d) / n + d * (dmass / n + contrib)
    return rd.from_arrow(pa.table({"node": nodes.cast(kt),
                                   "rank": pa.array(r, pa.float64())}))


def pagerank(edges, damping: float = 0.85, iters: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             num_shards: int | None = None,
             small_edges_threshold: int = 500_000):
    """PageRank over a directed edge Dataset -> materialized
    Dataset(node, rank) with sum(rank) == 1 (up to float tolerance).

    Parallel edges are counted with multiplicity (standard adjacency-
    matrix semantics); dangling nodes (no out-edges) redistribute
    their mass uniformly.  ``iters`` fixed iterations (the k-means
    contract) — power iteration converges geometrically at rate
    ``damping``.

    ADAPTIVE like :func:`~pyschema_ray.functions.dedup.
    connected_components`: graphs at or under ``small_edges_threshold``
    edges (a few MB of keys; the driver briefly holds the edge list,
    never any payload) run the identical update rule on a dense numpy
    state — each distributed round costs ~1 s of exchange overhead,
    which dominates below millions of edges.  Set the threshold to 0
    to force the distributed path (tests do).
    """
    import ray.data as rd

    nb = num_shards or _default_shards()

    edges = edges.materialize()
    if edges.count() <= small_edges_threshold:
        tbls = [t.select([src_col, dst_col]) for t in
                edges.iter_batches(batch_format="pyarrow",
                                   batch_size=None) if t.num_rows]
        if not tbls:
            try:
                kt = pa.schema(edges.schema().base_schema) \
                    .field(src_col).type
            except Exception:  # noqa: BLE001 — schema unknowable
                kt = pa.int64()
            return rd.from_arrow(pa.table(
                {"node": pa.array([], kt),
                 "rank": pa.array([], pa.float64())}))
        return _pagerank_local(pa.concat_tables(tbls), damping, iters,
                               src_col, dst_col)

    # ---- init exchange 1: node universe + out-degrees -------------
    def node_rows(t: pa.Table) -> pa.Table:
        parts = []
        for col, is_src in ((src_col, 1), (dst_col, 0)):
            node = t[col]
            if isinstance(node, pa.ChunkedArray):
                node = node.combine_chunks()
            node = node.filter(pc.is_valid(node))
            n = len(node)
            kt = node.type
            parts.append(pa.table({
                "nshard": pa.array(_shards_of(
                    node.to_numpy(zero_copy_only=False), nb), pa.int64()),
                "node": node,
                "deg": pa.array(np.full(n, is_src, np.int64), pa.int64()),
            }))
        return pa.concat_tables(parts)

    def fold_nodes(t: pa.Table) -> pa.Table:
        g = t.group_by(["node"], use_threads=False) \
            .aggregate([("deg", "sum")])
        node = g["node"].combine_chunks() \
            if isinstance(g["node"], pa.ChunkedArray) else g["node"]
        return pa.table({
            "nshard": pa.array(_shards_of(
                node.to_numpy(zero_copy_only=False), nb), pa.int64()),
            "node": node,
            "deg": pc.cast(g["deg_sum"], pa.int64()),
        })

    nodes = edges.map_batches(node_rows, batch_format="pyarrow") \
        .groupby("nshard").map_groups(fold_nodes, batch_format="pyarrow") \
        .materialize()
    n_total = nodes.count()
    if n_total == 0:
        try:
            kt = pa.schema(edges.schema().base_schema).field(src_col).type
        except Exception:  # noqa: BLE001 — schema unknowable on empty
            kt = pa.int64()
        return rd.from_arrow(pa.table({"node": pa.array([], kt),
                                       "rank": pa.array([], pa.float64())}))
    r0 = 1.0 / n_total

    # rank state: (nshard, node, rank, drank) — drank = rank if the
    # node is dangling else 0, so the per-iteration dangling mass is
    # ONE state.sum("drank") on the already-materialized Dataset
    def init_ranks(t: pa.Table) -> pa.Table:
        dang = pc.equal(t["deg"], 0).to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            "nshard": t["nshard"], "node": t["node"],
            "rank": pa.array(np.full(n, r0), pa.float64()),
            "drank": pa.array(np.where(dang, r0, 0.0), pa.float64()),
            "dangling": pa.array(dang, pa.bool_()),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    # ---- init exchange 2: adjacency with inv_deg, materialized ----
    # kind 0 = edge (node=src, other=dst), kind 1 = degree row
    def edge_rows(t: pa.Table) -> pa.Table:
        src = t[src_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        dst = t[dst_col]
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        ok = pc.and_(pc.is_valid(src), pc.is_valid(dst))
        src, dst = src.filter(ok), dst.filter(ok)
        return pa.table({
            "nshard": pa.array(_shards_of(
                src.to_numpy(zero_copy_only=False), nb), pa.int64()),
            "src": src, "dst": dst,
            "kind": pa.array(np.zeros(len(src), np.int8), pa.int8()),
            "val": pa.array(np.zeros(len(src)), pa.float64()),
        })

    def deg_rows(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore"):
            inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        return pa.table({
            "nshard": t["nshard"], "src": t["node"], "dst": t["node"],
            "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "val": pa.array(inv, pa.float64()),
        })

    def attach_inv(t: pa.Table) -> pa.Table:
        kt = t.schema.field("src").type
        e = t.filter(pc.equal(t["kind"], 0))
        d = t.filter(pc.equal(t["kind"], 1))
        if e.num_rows == 0:
            return pa.table({"nshard": pa.array([], pa.int64()),
                             "src": pa.array([], kt),
                             "dst": pa.array([], kt),
                             "inv_deg": pa.array([], pa.float64())})
        dk = np.asarray(d["src"].to_numpy(zero_copy_only=False))
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dv_s = d["val"].to_numpy(zero_copy_only=False)[order]
        ek = np.asarray(e["src"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(dk_s, ek)
        return pa.table({
            "nshard": e["nshard"], "src": e["src"], "dst": e["dst"],
            "inv_deg": pa.array(dv_s[idx], pa.float64()),
        })

    adj = edges.map_batches(edge_rows, batch_format="pyarrow") \
        .union(nodes.map_batches(deg_rows, batch_format="pyarrow")) \
        .groupby("nshard").map_groups(attach_inv, batch_format="pyarrow") \
        .materialize()

    # ---- power iteration -------------------------------------------
    d = float(damping)

    def rank_msg(t: pa.Table) -> pa.Table:
        # rank rows re-keyed for the src-shard exchange (same hash, so
        # they land with their adjacency rows)
        return pa.table({
            "nshard": t["nshard"], "src": t["node"], "dst": t["node"],
            "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "val": t["rank"],
        })

    def adj_msg(t: pa.Table) -> pa.Table:
        return pa.table({
            "nshard": t["nshard"], "src": t["src"], "dst": t["dst"],
            "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            "val": t["inv_deg"],
        })

    def contrib(t: pa.Table) -> pa.Table:
        kt = t.schema.field("src").type
        e = t.filter(pc.equal(t["kind"], 0))
        r = t.filter(pc.equal(t["kind"], 1))
        if e.num_rows == 0 or r.num_rows == 0:
            return pa.table({"nshard": pa.array([], pa.int64()),
                             "node": pa.array([], kt),
                             "val": pa.array([], pa.float64()),
                             "kind": pa.array([], pa.int8())})
        rk = np.asarray(r["src"].to_numpy(zero_copy_only=False))
        order = np.argsort(rk, kind="stable")
        rk_s, rv_s = rk[order], \
            r["val"].to_numpy(zero_copy_only=False)[order]
        ek = np.asarray(e["src"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(rk_s, ek)
        vals = rv_s[idx] * e["val"].to_numpy(zero_copy_only=False)
        # per-dst combiner inside the shard task
        part = pa.table({"node": e["dst"],
                         "val": pa.array(vals, pa.float64())}) \
            .group_by(["node"], use_threads=False) \
            .aggregate([("val", "sum")])
        node = part["node"].combine_chunks() \
            if isinstance(part["node"], pa.ChunkedArray) else part["node"]
        return pa.table({
            "nshard": pa.array(_shards_of(
                node.to_numpy(zero_copy_only=False), nb), pa.int64()),
            "node": node,
            "val": pc.cast(part["val_sum"], pa.float64()),
            "kind": pa.array(np.zeros(len(node), np.int8), pa.int8()),
        })

    for _ in range(iters):
        dmass = ranks.sum("drank") or 0.0
        base = (1.0 - d) / n_total + d * dmass / n_total

        def skel(t: pa.Table) -> pa.Table:
            return pa.table({
                "nshard": t["nshard"], "node": t["node"],
                "val": pa.array(np.zeros(t.num_rows), pa.float64()),
                "kind": pa.array(
                    np.where(t["dangling"].to_numpy(zero_copy_only=False),
                             2, 1).astype(np.int8), pa.int8()),
            })

        contribs = ranks.map_batches(rank_msg, batch_format="pyarrow") \
            .union(adj.map_batches(adj_msg, batch_format="pyarrow")) \
            .groupby("nshard") \
            .map_groups(contrib, batch_format="pyarrow")

        def newrank(t: pa.Table, _base=base) -> pa.Table:
            kt = t.schema.field("node").type
            sk = t.filter(pc.not_equal(t["kind"], 0))
            if sk.num_rows == 0:  # contributions to nodes not here
                return pa.table({"nshard": pa.array([], pa.int64()),
                                 "node": pa.array([], kt),
                                 "rank": pa.array([], pa.float64()),
                                 "drank": pa.array([], pa.float64()),
                                 "dangling": pa.array([], pa.bool_())})
            cb = t.filter(pc.equal(t["kind"], 0))
            sk_k = np.asarray(sk["node"].to_numpy(zero_copy_only=False))
            order = np.argsort(sk_k, kind="stable")
            sk_k_s = sk_k[order]
            dang_s = (sk["kind"].to_numpy(zero_copy_only=False)
                      == 2)[order]
            sums = np.zeros(len(sk_k_s))
            if cb.num_rows:
                ck = np.asarray(cb["node"].to_numpy(zero_copy_only=False))
                idx = np.searchsorted(sk_k_s, ck)
                np.add.at(sums, idx,
                          cb["val"].to_numpy(zero_copy_only=False))
            rank = _base + d * sums
            node_sorted = sk["node"].take(pa.array(order))
            return pa.table({
                "nshard": pa.array(_shards_of(sk_k_s, nb), pa.int64()),
                "node": node_sorted,
                "rank": pa.array(rank, pa.float64()),
                "drank": pa.array(np.where(dang_s, rank, 0.0),
                                  pa.float64()),
                "dangling": pa.array(dang_s, pa.bool_()),
            })

        ranks = contribs \
            .union(ranks.map_batches(skel, batch_format="pyarrow")) \
            .groupby("nshard") \
            .map_groups(newrank, batch_format="pyarrow") \
            .materialize()

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "rank": t["rank"]})

    return ranks.map_batches(out, batch_format="pyarrow")
