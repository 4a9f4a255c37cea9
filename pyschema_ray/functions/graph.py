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


def _triangle_pipeline(edges, src_col: str, dst_col: str,
                       num_shards: int | None, per_node: bool,
                       broadcast_nodes_threshold: int = 4_000_000,
                       small_edges_threshold: int = 5_000_000):
    """Shared node-iterator++ plan behind :func:`triangle_count`
    (per_node=False: one global count) and :func:`local_clustering`
    (per_node=True: per-node triangle counts merged with degrees).

    Adaptive degree attach: when the node count fits the broadcast
    budget (``broadcast_nodes_threshold``, ~2 sorted int64 arrays via
    ray.put — the small-dim fast path used across the repo), both
    endpoint degrees attach in ONE map pass with searchsorted probes,
    skipping two sentinel-merge exchanges; above it the distributed
    sentinel path runs unchanged (threshold=0 forces it in tests)."""
    from .dedup import _group_starts, _key_hash

    nb = num_shards or _default_shards()

    E_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def canon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[src_col]),
                             pc.is_valid(t[dst_col])))
        a = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        g = pa.table({"u": pa.array(u, pa.int64()),
                      "v": pa.array(v, pa.int64())}) \
            .group_by(["u", "v"]).aggregate([])           # combiner
        sh = ((_key_hash(g["u"].to_numpy(zero_copy_only=False), 41)
               ^ _key_hash(g["v"].to_numpy(zero_copy_only=False), 43))
              % np.uint64(nb)).astype(np.int64)
        return g.append_column("eshard", pa.array(sh, pa.int64()))

    def edge_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return E_SCHEMA.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("v", "ascending")])
        t = t.take(idx)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        return pa.table({"u": pa.array(u[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    E = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("eshard").map_groups(edge_dedup,
                                      batch_format="pyarrow") \
        .materialize()

    if E.count() <= small_edges_threshold:
        # adaptive driver fast path (the pagerank/connected-components
        # precedent): the DEDUPED canonical edge list is small; wedge
        # expansion + closing run chunked in one task, identical
        # orientation rules.  threshold=0 forces the distributed path.
        import ray.data as rd

        tbls = [b for b in E.iter_batches(batch_format="pyarrow",
                                          batch_size=None)
                if b.num_rows]
        if tbls:
            et = pa.concat_tables(tbls)
            u = et["u"].to_numpy(zero_copy_only=False)
            v = et["v"].to_numpy(zero_copy_only=False)
        else:
            u = v = np.empty(0, np.int64)
        return rd.from_arrow(_tri_local(u, v, per_node))

    # ---- degrees: one node-hash exchange over per-batch partials
    def deg_rows(t: pa.Table) -> pa.Table:
        node = np.concatenate([t["u"].to_numpy(zero_copy_only=False),
                               t["v"].to_numpy(zero_copy_only=False)])
        g = pa.table({"node": pa.array(node, pa.int64())}) \
            .group_by("node").aggregate([([], "count_all")])
        return pa.table({
            "node": g["node"],
            "d": pc.cast(g["count_all"], pa.int64()),
            "nshard": pa.array(_key_shards(
                g["node"].to_numpy(zero_copy_only=False), nb, 47),
                pa.int64())})

    def deg_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        g = t.select(["node", "d"]).group_by("node") \
            .aggregate([("d", "sum")])
        return pa.table({"node": g["node"],
                         "d": pc.cast(g["d_sum"], pa.int64())})

    D = E.map_batches(deg_rows, batch_format="pyarrow") \
        .groupby("nshard").map_groups(deg_sum, batch_format="pyarrow") \
        .materialize()

    # ---- attach deg to each endpoint via sentinel-row merges
    def _merge_deg(end_col: str, out_deg: str, seed: int):
        def tag_edges(t: pa.Table) -> pa.Table:
            cols = {"u": t["u"], "v": t["v"],
                    "k": t[end_col],
                    "d": pa.nulls(t.num_rows, pa.int64()),
                    "tag": pa.array(np.ones(t.num_rows, np.int8))}
            if out_deg == "dv":
                cols["du"] = t["du"]
            else:
                cols["du"] = pa.nulls(t.num_rows, pa.int64())
            out = pa.table(cols)
            return out.append_column("mshard", pa.array(_key_shards(
                t[end_col].to_numpy(zero_copy_only=False), nb, seed),
                pa.int64()))

        def tag_deg(t: pa.Table) -> pa.Table:
            z = pa.nulls(t.num_rows, pa.int64())
            out = pa.table({"u": z, "v": z, "k": t["node"],
                            "d": t["d"],
                            "tag": pa.array(
                                np.zeros(t.num_rows, np.int8)),
                            "du": z})
            return out.append_column("mshard", pa.array(_key_shards(
                t["node"].to_numpy(zero_copy_only=False), nb, seed),
                pa.int64()))

        def merge(t: pa.Table) -> pa.Table:
            cols = {"u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    out_deg: pa.array([], pa.int64())}
            if out_deg == "dv":
                cols["du"] = pa.array([], pa.int64())
            empty = pa.table(cols)
            et = t.filter(pc.equal(t["tag"], 1))
            dt = t.filter(pc.equal(t["tag"], 0))
            if et.num_rows == 0:
                return empty
            dk = dt["k"].to_numpy(zero_copy_only=False)
            dd = dt["d"].to_numpy(zero_copy_only=False)
            o = np.argsort(dk)
            dk, dd = dk[o], dd[o]
            ek = et["k"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dk, ek)
            pos = np.clip(pos, 0, max(len(dk) - 1, 0))
            # every edge endpoint has a degree row by construction
            deg = dd[pos] if len(dk) else np.zeros(len(ek), np.int64)
            cols = {"u": et["u"], "v": et["v"],
                    out_deg: pa.array(deg, pa.int64())}
            if out_deg == "dv":
                cols["du"] = et["du"]
            return pa.table(cols)

        return tag_edges, tag_deg, merge

    import ray
    import ray.data

    n_nodes = D.count()
    if n_nodes <= broadcast_nodes_threshold:
        dt = pa.concat_tables(
            [b for b in D.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if b.num_rows]
            or [pa.table({"node": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64())})])
        dn = dt["node"].to_numpy(zero_copy_only=False)
        dv_ = dt["d"].to_numpy(zero_copy_only=False)
        o = np.argsort(dn)
        deg_ref = ray.put((dn[o], dv_[o]))

        def attach_both(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            # every endpoint has a degree row by construction
            du = degs[np.searchsorted(nodes, u)] if len(nodes) \
                else np.zeros(len(u), np.int64)
            dv = degs[np.searchsorted(nodes, v)] if len(nodes) \
                else np.zeros(len(v), np.int64)
            return pa.table({"u": t["u"], "v": t["v"],
                             "du": pa.array(du, pa.int64()),
                             "dv": pa.array(dv, pa.int64())})

        full = E.map_batches(attach_both, batch_format="pyarrow")
    else:
        te, td, mg = _merge_deg("u", "du", 53)
        half = E.map_batches(te, batch_format="pyarrow") \
            .union(D.map_batches(td, batch_format="pyarrow")) \
            .groupby("mshard").map_groups(mg, batch_format="pyarrow")
        te2, td2, mg2 = _merge_deg("v", "dv", 59)
        full = half.map_batches(te2, batch_format="pyarrow") \
            .union(D.map_batches(td2, batch_format="pyarrow")) \
            .groupby("mshard").map_groups(mg2, batch_format="pyarrow")

    # ---- orient by (deg, id) and generate wedges at each apex
    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        du = t["du"].to_numpy(zero_copy_only=False)
        dv = t["dv"].to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        s = np.where(u_first, u, v)
        d = np.where(u_first, v, u)
        ds_ = np.where(u_first, du, dv)
        dd_ = np.where(u_first, dv, du)
        return pa.table({
            "s": pa.array(s, pa.int64()), "d": pa.array(d, pa.int64()),
            "dd": pa.array(dd_, pa.int64()),
            "wshard": pa.array(_key_shards(s, nb, 61), pa.int64())})

    W_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("apex", pa.int64()), ("cnt", pa.int64())])

    def wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return W_SCHEMA.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("s", "ascending"),
                                            ("dd", "ascending"),
                                            ("d", "ascending")])
        t = t.take(idx)
        s = t["s"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(s)
        n = len(s)
        w = np.arange(n) - np.repeat(starts, sizes)   # pos within run
        reps = np.repeat(sizes, sizes) - 1 - w        # pairs to the right
        total = int(reps.sum())
        if total == 0:
            return W_SCHEMA.empty_table()
        li = np.repeat(np.arange(n), reps)
        csum = np.concatenate([[0], np.cumsum(reps)])
        ri = li + 1 + (np.arange(total) - np.repeat(csum[:-1], reps))
        # neighbors are (deg, id)-sorted within the run, so the pair
        # is already oriented low->high
        a, b = d[li], d[ri]
        if per_node:
            # keep the apex: every matched wedge instance is one
            # triangle attributed to (apex, a, b)
            return pa.table({"a": pa.array(a, pa.int64()),
                             "b": pa.array(b, pa.int64()),
                             "apex": pa.array(s[li], pa.int64()),
                             "cnt": pa.array(np.ones(total, np.int64))})
        g = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())}) \
            .group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "apex": pa.nulls(g.num_rows, pa.int64()),
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    oriented = full.map_batches(orient, batch_format="pyarrow") \
        .materialize()
    wedge_ds = oriented.groupby("wshard").map_groups(
        wedges, batch_format="pyarrow")

    # ---- close wedges against the oriented edge set
    def tag_wedges(t: pa.Table) -> pa.Table:
        sh = ((_key_hash(t["a"].to_numpy(zero_copy_only=False), 67)
               ^ _key_hash(t["b"].to_numpy(zero_copy_only=False), 71))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"], "apex": t["apex"],
                         "cnt": t["cnt"],
                         "tag": pa.array(np.ones(t.num_rows, np.int8)),
                         "cshard": pa.array(sh, pa.int64())})

    def tag_closing_edges(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        sh = ((_key_hash(s, 67) ^ _key_hash(d, 71))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"a": pa.array(s, pa.int64()),
                         "b": pa.array(d, pa.int64()),
                         "apex": pa.nulls(len(s), pa.int64()),
                         "cnt": pa.array(np.zeros(len(s), np.int64)),
                         "tag": pa.array(np.zeros(len(s), np.int8)),
                         "cshard": pa.array(sh, pa.int64())})

    def close(t: pa.Table) -> pa.Table:
        if per_node:
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64()),
                              "nshard": pa.array([], pa.int64())})
        else:
            empty = pa.table({"n_triangles": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[("a", "ascending"),
                                            ("b", "ascending"),
                                            ("tag", "ascending")])
        t = t.take(idx)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        tag = t["tag"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(a, b)
        run_id = np.repeat(np.arange(len(starts)), sizes)
        edge_present = tag[starts] == 0    # edges sort first in a run
        matched = (tag == 1) & edge_present[run_id]
        if not per_node:
            return pa.table({"n_triangles": pa.array(
                [int(cnt[matched].sum())], pa.int64())})
        if not matched.any():
            return empty
        apex = t["apex"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([apex[matched].astype(np.int64),
                                a[matched], b[matched]])
        g = pa.table({"node": pa.array(nodes, pa.int64())}) \
            .group_by("node").aggregate([([], "count_all")])
        return pa.table({
            "node": g["node"],
            "n": pc.cast(g["count_all"], pa.int64()),
            "nshard": pa.array(_key_shards(
                g["node"].to_numpy(zero_copy_only=False), nb, 47),
                pa.int64())})

    both = wedge_ds.map_batches(tag_wedges, batch_format="pyarrow") \
        .union(oriented.map_batches(tag_closing_edges,
                                    batch_format="pyarrow")) \
        .groupby("cshard").map_groups(close, batch_format="pyarrow")

    if not per_node:
        def total(t: pa.Table) -> pa.Table:
            s = int(pc.sum(t["n_triangles"]).as_py() or 0) \
                if t.num_rows else 0
            return pa.table({"n_triangles": pa.array([s], pa.int64())})

        zero = ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([0], pa.int64())}))
        return both.union(zero).repartition(1) \
            .map_batches(total, batch_format="pyarrow")

    # ---- per-node: sum triangle partials, merge with degrees
    def tri_tag(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "d": t["n"],
                         "tag": pa.array(np.ones(t.num_rows, np.int8)),
                         "nshard": t["nshard"]})

    def deg_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"], "d": t["d"],
            "tag": pa.array(np.zeros(t.num_rows, np.int8)),
            "nshard": pa.array(_key_shards(
                t["node"].to_numpy(zero_copy_only=False), nb, 47),
                pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "degree": pa.array([], pa.int64()),
                          "n_triangles": pa.array([], pa.int64()),
                          "clustering": pa.array([], pa.float64())})
        dt = t.filter(pc.equal(t["tag"], 0))
        if dt.num_rows == 0:
            return empty
        tt = t.filter(pc.equal(t["tag"], 1))
        nodes = dt["node"].to_numpy(zero_copy_only=False)
        deg = dt["d"].to_numpy(zero_copy_only=False)
        o = np.argsort(nodes)
        nodes, deg = nodes[o], deg[o]
        nt = np.zeros(len(nodes), np.int64)
        if tt.num_rows:
            tn = tt["node"].to_numpy(zero_copy_only=False)
            tv = tt["d"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nodes, tn)
            np.add.at(nt, pos, tv)     # partials per node sum here
        pairs = deg * (deg - 1)
        cc = np.zeros(len(nodes), np.float64)
        np.divide(2.0 * nt, pairs, out=cc, where=pairs >= 2)
        return pa.table({
            "node": pa.array(nodes, pa.int64()),
            "degree": pa.array(deg, pa.int64()),
            "n_triangles": pa.array(nt, pa.int64()),
            "clustering": pa.array(cc, pa.float64())})

    return both.map_batches(tri_tag, batch_format="pyarrow") \
        .union(D.map_batches(deg_tag, batch_format="pyarrow")) \
        .groupby("nshard").map_groups(finish, batch_format="pyarrow")


def triangle_count(edges, src_col: str = "src", dst_col: str = "dst",
                   num_shards: int | None = None,
                   broadcast_nodes_threshold: int = 4_000_000,
                   small_edges_threshold: int = 5_000_000):
    """Distributed exact triangle counting over an undirected edge
    Dataset (int64 node ids) — the clustering-coefficient /
    community-density primitive.  MapReduce node-iterator++ (Cohen's
    algorithm): orient every edge from its lower-(degree, id) endpoint
    to the higher one, generate each triangle's single wedge at its
    lowest-ranked apex, and close wedges against the oriented edge
    set.  Orientation bounds every adjacency list by O(sqrt(m)), so
    wedge volume is O(m^1.5) worst case and per-shard work stays
    bounded on power-law graphs (the hot-key guard).

    Five bounded hash exchanges, all on integer shard keys: canonical
    edge dedup, degree count, two degree-attach sentinel merges, wedge
    generation, and the wedge/edge closing match.  The driver holds
    one int64.  Self-loops, nulls, duplicate and reversed duplicate
    edges are ignored.

    -> Dataset with a single row (n_triangles int64).
    """
    return _triangle_pipeline(
        edges, src_col, dst_col, num_shards, per_node=False,
        broadcast_nodes_threshold=broadcast_nodes_threshold,
        small_edges_threshold=small_edges_threshold)


def local_clustering(edges, src_col: str = "src", dst_col: str = "dst",
                     num_shards: int | None = None,
                     broadcast_nodes_threshold: int = 4_000_000,
                     small_edges_threshold: int = 5_000_000):
    """Per-node triangle counts and local clustering coefficient
    ``2*T(v) / (deg(v) * (deg(v) - 1))`` over an undirected edge
    Dataset — same oriented-wedge plan as :func:`triangle_count`, but
    wedges carry their apex so each closed triangle credits its three
    vertices; one extra node-hash exchange merges triangle partials
    with degrees.  Every node appears (zero-triangle nodes included).

    -> Dataset(node, degree, n_triangles int64, clustering float64).
    """
    return _triangle_pipeline(
        edges, src_col, dst_col, num_shards, per_node=True,
        broadcast_nodes_threshold=broadcast_nodes_threshold,
        small_edges_threshold=small_edges_threshold)


def _tri_local(u: np.ndarray, v: np.ndarray, per_node: bool,
               chunk: int = 8_000_000):
    """Single-task triangle pass over CANONICAL deduped edges —
    identical orientation/tie rules as the distributed wedge plan
    (index space preserves id order because node ids are np.unique-
    sorted).  Wedges expand in bounded chunks, close against an exact
    ``s * n + d`` integer key set (n < 2^31 by the int64 node-id
    contract, so keys never collide)."""
    m = len(u)
    if m == 0:
        if per_node:
            return pa.table({"node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64()),
                             "n_triangles": pa.array([], pa.int64()),
                             "clustering": pa.array([], pa.float64())})
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    nodes, inv = np.unique(np.concatenate([u, v]),
                           return_inverse=True)
    n = len(nodes)
    iu, iv = inv[:m], inv[m:]
    deg = np.bincount(np.concatenate([iu, iv]),
                      minlength=n).astype(np.int64)
    u_first = (deg[iu] < deg[iv]) | ((deg[iu] == deg[iv]) & (iu < iv))
    s = np.where(u_first, iu, iv)
    d = np.where(u_first, iv, iu)
    dd = deg[d]
    order = np.lexsort((d, dd, s))
    s, d, dd = s[order], d[order], dd[order]
    from .dedup import _group_starts
    starts, sizes = _group_starts(s)
    ekeys = np.sort(s.astype(np.int64) * n + d)
    # closing probe: an n^2-bit set (<= ~400 MB under the gate) turns
    # the per-wedge log(m) binary search into one byte gather; beyond
    # the gate, sorted probes
    bits = None
    if n * n <= 3_200_000_000:
        bits = np.zeros(n * n // 8 + 1, np.uint8)
        np.bitwise_or.at(bits, ekeys >> 3,
                         (1 << (ekeys & 7)).astype(np.uint8))
    w_in = np.arange(m) - np.repeat(starts, sizes)
    reps = np.repeat(sizes, sizes) - 1 - w_in
    cum = np.concatenate([[0], np.cumsum(reps)])
    total = int(cum[-1])
    tri_count = 0
    tri_per = np.zeros(n, np.int64) if per_node else None
    e0 = 0
    while e0 < m:
        e1 = int(np.searchsorted(cum, cum[e0] + chunk, "left"))
        e1 = min(max(e1, e0 + 1), m)
        r = reps[e0:e1]
        ln = int(r.sum())
        if ln:
            li = np.repeat(np.arange(e0, e1), r)
            csum = np.concatenate([[0], np.cumsum(r)])
            off = np.arange(ln) - np.repeat(csum[:-1], r)
            ri = li + 1 + off
            a, b = d[li], d[ri]
            keys = a.astype(np.int64) * n + b
            if bits is not None:
                matched = ((bits[keys >> 3] >> (keys & 7)) & 1) \
                    .astype(bool)
            else:
                pos = np.clip(np.searchsorted(ekeys, keys), 0,
                              max(len(ekeys) - 1, 0))
                matched = ekeys[pos] == keys
            tri_count += int(matched.sum())
            if per_node:
                np.add.at(tri_per, s[li][matched], 1)
                np.add.at(tri_per, a[matched], 1)
                np.add.at(tri_per, b[matched], 1)
        e0 = e1
    if not per_node:
        return pa.table({"n_triangles": pa.array([tri_count],
                                                 pa.int64())})
    pairs = deg * (deg - 1)
    cc = np.zeros(n, np.float64)
    np.divide(2.0 * tri_per, pairs, out=cc, where=pairs >= 2)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "degree": pa.array(deg, pa.int64()),
                     "n_triangles": pa.array(tri_per, pa.int64()),
                     "clustering": pa.array(cc, pa.float64())})
