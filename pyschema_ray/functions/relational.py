"""Relational set and cross-table consistency operators, Ray-Data-first.

* :func:`anti_join` / :func:`semi_join` — existence joins without a
  full shuffle join: the probe side is reduced to DISTINCT keys per
  batch (a combiner — the exchange carries unique-keys-per-batch,
  never probe rows), both sides co-partition on a bounded key-hash
  shard, and one ``pc.is_in`` per shard resolves every kept row.
  NOT EXISTS semantics (null probe keys are ignored; null keep-side
  keys can never match, so anti keeps them and semi drops them) —
  matching the SQL oracle's NOT EXISTS, not NOT IN.
* :func:`rollup_counts` — one-pass multi-level GROUP BY ROLLUP
  counts: per-batch finest-level partials, one bounded groupby, then
  a driver-free expansion of the (small) aggregated table into every
  rollup level.  The exchange never carries rows, only distinct
  finest-level groups.
* :func:`order_consistency` — cross-table invariant check (the
  referential analog for VALUES): per-order line totals, computed as
  exact int64 cents so the distributed sum is order-independent, are
  co-partitioned with the order header on an orderkey-hash shard and
  compared under a tolerance; emits one global counts row.

Scale notes (100 TB): every exchange here is a bounded integer-shard
groupby (`default_exchange_shards`, cluster-proportional); no stage
materializes row data on the driver; the only driver-held state is
per-shard count partials (O(shards)) and the rollup's aggregated group
table (O(distinct groups)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_shards, _key_shards


def _existence_join(left, right, left_key: str, right_key: str | None,
                    keep_matched: bool, num_shards: int | None):
    right_key = right_key or left_key
    nb = num_shards or _default_shards()
    lschema = pa.schema(left.schema().base_schema)
    payload = list(lschema.names)

    def l_rows(t: pa.Table) -> pa.Table:
        t = t.select(payload)
        keys = t[left_key]
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        # null keys can't hash — park them on shard 0 (they resolve
        # by validity, never by value, so co-location is irrelevant).
        # Filter nulls BEFORE to_numpy: an int64 column with nulls
        # otherwise converts to float64 and hashes differently than
        # the (null-free) probe side.
        shard = np.zeros(len(valid), np.int64)
        if valid.any():
            vk = pc.drop_null(keys).to_numpy(zero_copy_only=False)
            shard[valid] = _key_shards(vk, nb, 53)
        t = t.append_column("kshard", pa.array(shard, pa.int64()))
        return t.append_column(
            "side", pa.array(np.zeros(len(t), np.int8), pa.int8()))

    def r_rows(t: pa.Table) -> pa.Table:
        col = t[right_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        distinct = pc.unique(col)
        distinct = distinct.filter(pc.is_valid(distinct))
        n = len(distinct)
        cols = {}
        for f in lschema:
            if f.name == left_key:
                cols[f.name] = pc.cast(distinct, f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        out = pa.table(cols)
        shard = _key_shards(distinct.to_numpy(zero_copy_only=False),
                            nb, 53)
        out = out.append_column("kshard", pa.array(shard, pa.int64()))
        return out.append_column(
            "side", pa.array(np.ones(n, np.int8), pa.int8()))

    def resolve(t: pa.Table) -> pa.Table:
        side = t["side"]
        lt = t.filter(pc.equal(side, 0))
        rt = t.filter(pc.equal(side, 1))
        rkeys = rt[left_key]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        rkeys = pc.unique(rkeys)
        isin = pc.is_in(lt[left_key], value_set=rkeys)
        # null left key: is_in yields null/false, never true — NOT
        # EXISTS keeps it on anti, drops it on semi
        matched = pc.fill_null(isin, False)
        mask = matched if keep_matched else pc.invert(matched)
        return lt.filter(mask).drop_columns(["kshard", "side"])

    ds = left.map_batches(l_rows, batch_format="pyarrow") \
        .union(right.map_batches(r_rows, batch_format="pyarrow"))
    return ds.groupby("kshard").map_groups(resolve,
                                           batch_format="pyarrow")


def anti_join(left, right, left_key: str, right_key: str | None = None,
              num_shards: int | None = None):
    """Rows of ``left`` with NO match in ``right`` (NOT EXISTS).

    ``right`` is reduced to distinct keys per batch before the
    exchange; select only needed ``left`` columns upstream — the whole
    left payload rides the shard exchange.
    """
    return _existence_join(left, right, left_key, right_key,
                           keep_matched=False, num_shards=num_shards)


def semi_join(left, right, left_key: str, right_key: str | None = None,
              num_shards: int | None = None):
    """Rows of ``left`` WITH at least one match in ``right`` (EXISTS)."""
    return _existence_join(left, right, left_key, right_key,
                           keep_matched=True, num_shards=num_shards)


def rollup_counts(ds, cols: list[str], sentinel: str = "[ALL]",
                  null_label: str = "[NULL]"):
    """GROUP BY ROLLUP(*cols) counts in ONE streaming pass.

    Stage 1 (per batch): finest-level ``group_by(cols).count`` partial
    — the combiner; the exchange carries distinct finest groups per
    batch, never rows.  Stage 2: one bounded groupby sums partials.
    Stage 3: the aggregated table (cardinality = distinct finest
    groups — small by definition of a rollup report) is expanded to
    every prefix level with ``sentinel`` filling rolled-up columns and
    re-aggregated in a final (tiny) groupby.

    Real nulls in grouping columns are mapped to ``null_label`` so a
    rollup ``sentinel`` row is never conflated with a null group (the
    SQL oracle uses GROUPING() the same way).  Returns
    Dataset(*cols, n_rows) with all levels including the grand total.
    """
    cols = list(cols)

    def partial(t: pa.Table) -> pa.Table:
        sel = {}
        for c in cols:
            sel[c] = pc.fill_null(pc.cast(t[c], pa.string()), null_label)
        g = pa.table(sel).group_by(cols).aggregate([([], "count_all")])
        return g.select(cols + ["count_all"]) \
            .rename_columns(cols + ["n_rows"])

    def expand(t: pa.Table) -> pa.Table:
        # t: globally aggregated finest-level rows (small)
        g = t.group_by(cols).aggregate([("n_rows", "sum")]) \
            .select(cols + ["n_rows_sum"]) \
            .rename_columns(cols + ["n_rows"])
        pieces = [g]
        for level in range(len(cols) - 1, -1, -1):
            keep = cols[:level]
            if keep:
                agg = g.group_by(keep).aggregate([("n_rows", "sum")]) \
                    .select(keep + ["n_rows_sum"]) \
                    .rename_columns(keep + ["n_rows"])
            else:
                agg = pa.table(
                    {"n_rows": pa.array(
                        [pc.sum(g["n_rows"]).as_py() or 0], pa.int64())})
            filled = {}
            for c in cols:
                if c in keep:
                    filled[c] = agg[c]
                else:
                    filled[c] = pa.array([sentinel] * len(agg), pa.string())
            filled["n_rows"] = pc.cast(agg["n_rows"], pa.int64())
            pieces.append(pa.table(filled))
        out = pa.concat_tables([p.select(cols + ["n_rows"]) for p in pieces])
        return out.set_column(out.schema.get_field_index("n_rows"),
                              "n_rows", pc.cast(out["n_rows"], pa.int64()))

    part = ds.map_batches(partial, batch_format="pyarrow")
    # ONE aggregation node: repartition(1) after the per-batch combiner
    # keeps the final expansion deterministic and single-tasked; the
    # data entering it is already group-cardinality-bounded
    return part.repartition(1).map_batches(expand,
                                           batch_format="pyarrow")


def grouping_sets_counts(ds, cols: list[str],
                         sets: list[tuple[str, ...]],
                         sentinel: str = "[ALL]",
                         null_label: str = "[NULL]"):
    """GROUP BY GROUPING SETS counts in ONE streaming pass — the
    general form behind ROLLUP and CUBE.

    Stage 1 (per batch): finest-level ``group_by(cols).count`` partial
    — the combiner; the exchange carries distinct finest groups per
    batch, never rows.  Stage 2: one bounded groupby sums partials.
    Stage 3: the aggregated table (cardinality = distinct finest
    groups — small by definition of a grouping report) is expanded to
    each requested set with ``sentinel`` filling the grouped-out
    columns.  Every set must be a subset of ``cols``; set order within
    a tuple is irrelevant.

    Real nulls in grouping columns map to ``null_label`` so a
    ``sentinel`` row is never conflated with a null group (the SQL
    oracle uses GROUPING() the same way).  Returns
    Dataset(*cols, n_rows)."""
    cols = list(cols)
    norm_sets = []
    for s in sets:
        s = tuple(s)
        unknown = set(s) - set(cols)
        if unknown:
            raise ValueError(f"grouping set {s} has columns {unknown} "
                             f"not in cols={cols}")
        norm_sets.append(tuple(c for c in cols if c in s))

    def partial(t: pa.Table) -> pa.Table:
        sel = {}
        for c in cols:
            sel[c] = pc.fill_null(pc.cast(t[c], pa.string()), null_label)
        g = pa.table(sel).group_by(cols).aggregate([([], "count_all")])
        return g.select(cols + ["count_all"]) \
            .rename_columns(cols + ["n_rows"])

    def expand(t: pa.Table) -> pa.Table:
        g = t.group_by(cols).aggregate([("n_rows", "sum")]) \
            .select(cols + ["n_rows_sum"]) \
            .rename_columns(cols + ["n_rows"])
        pieces = []
        for keep in norm_sets:
            keep = list(keep)
            if keep:
                agg = g.group_by(keep).aggregate([("n_rows", "sum")]) \
                    .select(keep + ["n_rows_sum"]) \
                    .rename_columns(keep + ["n_rows"])
            else:
                agg = pa.table(
                    {"n_rows": pa.array(
                        [pc.sum(g["n_rows"]).as_py() or 0], pa.int64())})
            filled = {}
            for c in cols:
                if c in keep:
                    filled[c] = agg[c]
                else:
                    filled[c] = pa.array([sentinel] * len(agg),
                                         pa.string())
            filled["n_rows"] = pc.cast(agg["n_rows"], pa.int64())
            pieces.append(pa.table(filled).select(cols + ["n_rows"]))
        return pa.concat_tables(pieces)

    part = ds.map_batches(partial, batch_format="pyarrow")
    # ONE aggregation node (same rationale as rollup_counts): the data
    # entering it is already group-cardinality-bounded by the combiner
    return part.repartition(1).map_batches(expand,
                                           batch_format="pyarrow")


def cube_counts(ds, cols: list[str], sentinel: str = "[ALL]",
                null_label: str = "[NULL]"):
    """GROUP BY CUBE(*cols) counts: every subset of ``cols`` (2^k
    grouping sets, k small by the nature of a cube report) via
    :func:`grouping_sets_counts` in one streaming pass."""
    from itertools import combinations

    cols = list(cols)
    sets = [comb for r in range(len(cols), -1, -1)
            for comb in combinations(cols, r)]
    return grouping_sets_counts(ds, cols, sets, sentinel=sentinel,
                                null_label=null_label)


def order_consistency(orders, lineitem,
                      order_key: str = "o_orderkey",
                      line_key: str = "l_orderkey",
                      price_col: str = "o_totalprice",
                      tol_cents: int = 50,
                      num_shards: int | None = None):
    """Cross-table VALUE consistency: does the order header total
    match the sum of its line extensions
    ``extendedprice * (1 - discount) * (1 + tax)``?

    Float discipline: each LINE value is rounded to int64 cents
    (half-away-from-zero — SQL ``round()``) BEFORE the distributed
    sum, so partial-sum order can never change the result; the header
    total is cents-rounded the same way and compared under
    ``tol_cents``.  The SQL oracle applies the identical per-line
    rounding, making the mismatch count bit-reproducible.

    Exchange: lineitem per-batch partials (okshard, key, cents) union
    the order headers (same schema, side-tagged) on ONE bounded
    orderkey-hash shard groupby; each shard emits count partials; a
    final single-row reduce sums them.  Returns one row:
    (n_orders, n_without_lines, n_mismatched).
    """
    nb = num_shards or _default_shards()

    def line_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[line_key]))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        # fixed association: ext*(1-disc) first, then *(1+tax) — the
        # oracle SQL writes the same parenthesization
        v = (ext * (1.0 - disc)) * (1.0 + tax) * 100.0
        cents = np.trunc(np.abs(v) + 0.5).astype(np.int64) \
            * np.where(v < 0, -1, 1).astype(np.int64)
        keys = t[line_key].to_numpy(zero_copy_only=False)
        # batch-level combiner: partial-sum per orderkey before the
        # exchange
        order = np.argsort(keys, kind="stable")
        sk, sc = keys[order], cents[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        sums = np.add.reduceat(sc, starts) if len(sc) else \
            np.zeros(0, np.int64)
        uk = sk[starts] if len(sk) else np.zeros(0, np.int64)
        return pa.table({
            "okshard": pa.array(_key_shards(uk, nb, 59), pa.int64()),
            "okey": pa.array(uk, pa.int64()),
            "cents": pa.array(sums, pa.int64()),
            "side": pa.array(np.zeros(len(uk), np.int8), pa.int8()),
        })

    def order_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[order_key]))
        keys = t[order_key].to_numpy(zero_copy_only=False)
        tot = t[price_col].to_numpy(zero_copy_only=False) * 100.0
        cents = np.trunc(np.abs(tot) + 0.5).astype(np.int64) \
            * np.where(tot < 0, -1, 1).astype(np.int64)
        return pa.table({
            "okshard": pa.array(_key_shards(keys, nb, 59), pa.int64()),
            "okey": pa.array(keys, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
        })

    def shard_counts(t: pa.Table) -> pa.Table:
        import pandas as pd
        side = t["side"].to_numpy(zero_copy_only=False)
        okey = t["okey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        lines = pd.DataFrame({"okey": okey[side == 0],
                              "cents": cents[side == 0]})
        line_sum = lines.groupby("okey", sort=False)["cents"].sum()
        heads = pd.DataFrame({"okey": okey[side == 1],
                              "total": cents[side == 1]})
        joined = heads.join(line_sum, on="okey")
        n_orders = len(heads)
        has = joined["cents"].notna()
        n_without = int((~has).sum())
        diff = (joined.loc[has, "cents"].astype(np.int64)
                - joined.loc[has, "total"]).abs()
        n_mis = int((diff > tol_cents).sum())
        return pa.table({"n_orders": pa.array([n_orders], pa.int64()),
                         "n_without_lines": pa.array([n_without],
                                                     pa.int64()),
                         "n_mismatched": pa.array([n_mis], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            c: pa.array([pc.sum(t[c]).as_py() or 0], pa.int64())
            for c in ("n_orders", "n_without_lines", "n_mismatched")})

    ex = lineitem.map_batches(line_partial, batch_format="pyarrow") \
        .union(orders.map_batches(order_rows, batch_format="pyarrow"))
    per_shard = ex.groupby("okshard").map_groups(shard_counts,
                                                 batch_format="pyarrow")
    return per_shard.repartition(1).map_batches(final,
                                                batch_format="pyarrow")


def left_count_distribution(keys_ds, fact_ds, key_col: str,
                            fact_key_col: str | None = None,
                            num_shards: int | None = None):
    """TPC-H Q13 shape: for every key in ``keys_ds`` count its rows in
    ``fact_ds`` (ZERO included — the left-outer-join semantics a plain
    groupby cannot express), then return the DISTRIBUTION
    Dataset(n_facts, n_keys).

    Shape: the fact side collapses to per-batch (key, count) partials
    (combiner — the exchange carries distinct keys per batch, never
    fact rows); the key side ships bare keys; both co-partition on a
    bounded key-hash shard where counts sum and missing keys zero-fill;
    each shard then emits its local (n_facts, n_keys) histogram and a
    final tiny bounded groupby sums shard histograms — two exchanges,
    both carrying aggregates only, no full join anywhere."""
    fact_key_col = fact_key_col or key_col
    num_shards = num_shards or _default_shards()

    def fact_partial(t: pa.Table) -> pa.Table:
        col = t.filter(pc.is_valid(t[fact_key_col]))[fact_key_col]
        vc = col.combine_chunks().value_counts()
        keys = vc.field("values")
        kn = keys.to_numpy(zero_copy_only=False)
        return pa.table({
            "kshard": pa.array(_key_shards(kn, num_shards, 97),
                               pa.int64()),
            "k": keys,
            "n": pc.cast(vc.field("counts"), pa.int64()),
            "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
        })

    def key_rows(t: pa.Table) -> pa.Table:
        col = t.filter(pc.is_valid(t[key_col]))[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        kn = col.to_numpy(zero_copy_only=False)
        return pa.table({
            "kshard": pa.array(_key_shards(kn, num_shards, 97),
                               pa.int64()),
            "k": col,
            "n": pa.array(np.zeros(len(col), np.int64), pa.int64()),
            "side": pa.array(np.ones(len(col), np.int8), pa.int8()),
        })

    union = fact_ds.map_batches(fact_partial, batch_format="pyarrow") \
        .union(keys_ds.map_batches(key_rows, batch_format="pyarrow"))

    def shard_hist(df):
        import pandas as pd

        keys = df.loc[df["side"] == 1, ["k"]].drop_duplicates()
        counts = df.loc[df["side"] == 0].groupby("k", sort=False)["n"] \
            .sum()
        per_key = keys.merge(counts.rename("n_facts"), left_on="k",
                             right_index=True, how="left")
        per_key["n_facts"] = per_key["n_facts"].fillna(0).astype("int64")
        hist = per_key.groupby("n_facts", sort=False).size() \
            .rename("n_keys").reset_index()
        return pa.table({
            "n_facts": pa.array(hist["n_facts"].to_numpy(), pa.int64()),
            "n_keys": pa.array(hist["n_keys"].to_numpy().astype(np.int64),
                               pa.int64())})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("n_facts").aggregate([("n_keys", "sum")])
        return g.select(["n_facts", "n_keys_sum"]) \
            .rename_columns(["n_facts", "n_keys"])

    return union.groupby("kshard") \
        .map_groups(shard_hist, batch_format="pandas") \
        .repartition(1).map_batches(total, batch_format="pyarrow")


def _composite_shards(t: pa.Table, cols: list[str], num_shards: int,
                      seed: int = 67) -> np.ndarray:
    """Shard id from a multi-column composite key: each column cast to
    string with a null sentinel, joined with an unprintable separator,
    hashed once — one vectorized pass, no per-row Python.  The fast
    path branches on column TYPE only (never per-batch null counts):
    a value must land on the same shard from every batch of either
    side, so single-int-column keys hash as ints with nulls parked on
    shard 0, and everything else hashes the string composite."""
    if len(cols) == 1 and pa.types.is_integer(t.schema.field(cols[0]).type):
        keys = t[cols[0]]
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        shard = np.zeros(t.num_rows, np.int64)
        if valid.any():
            vk = pc.drop_null(keys).to_numpy(zero_copy_only=False)
            shard[valid] = _key_shards(vk, num_shards, seed)
        return shard
    parts = [pc.fill_null(pc.cast(t[c], pa.string()), "\x00NULL")
             for c in cols]
    comp = parts[0] if len(parts) == 1 \
        else pc.binary_join_element_wise(*parts, "\x1f")
    if isinstance(comp, pa.ChunkedArray):
        comp = comp.combine_chunks()
    return _key_shards(comp.to_numpy(zero_copy_only=False), num_shards,
                       seed)


def set_op_distinct(left, right, cols: list[str], op: str = "intersect",
                    num_shards: int | None = None):
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) over the
    named columns.

    Shape: each side is reduced to DISTINCT tuples PER BATCH (a
    combiner — the exchange carries unique rows per batch, never the
    input), tagged with a side bit, and co-partitioned on ONE bounded
    composite-key-hash shard; per shard an Arrow ``group_by`` over the
    tuple with min/max side flags resolves membership:

    * ``intersect`` — tuples seen on BOTH sides (side_min=0, side_max=1)
    * ``except``    — left-only tuples (side_max=0)

    NULLs compare equal within a tuple position, matching SQL set-op
    distinct semantics (Arrow group_by groups nulls together).  At
    100 TB the exchange is bounded by distinct-tuples-per-batch x
    batches, and the output by the true distinct count — no full-row
    shuffle, nothing on the driver.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    nb = num_shards or _default_shards()
    lschema = None
    for side in (left, right):  # an all-empty side may have no schema
        s = side.schema()
        if s is not None:
            lschema = pa.schema(s.base_schema)
            break
    if lschema is None:
        raise ValueError("set_op_distinct: neither input has a schema")
    out_schema = pa.schema([lschema.field(c) for c in cols])

    def side_rows(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            t = t.group_by(cols, use_threads=False).aggregate([]) \
                .select(cols)
            t = t.cast(out_schema)
            shard = _composite_shards(t, cols, nb)
            t = t.append_column("kshard", pa.array(shard, pa.int64()))
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8),
                                 pa.int8()))
        return fn

    def resolve(t: pa.Table) -> pa.Table:
        g = t.group_by(cols, use_threads=False).aggregate(
            [("side", "min"), ("side", "max")])
        smin = g["side_min"]
        keep = pc.and_(pc.equal(smin, 0), pc.equal(g["side_max"], 1)) \
            if op == "intersect" else pc.equal(g["side_max"], 0)
        out = g.filter(keep).select(cols)
        return out.cast(out_schema)

    ds = left.map_batches(side_rows(0), batch_format="pyarrow") \
        .union(right.map_batches(side_rows(1), batch_format="pyarrow"))
    return ds.groupby("kshard").map_groups(resolve,
                                           batch_format="pyarrow")


def not_in_join(left, right, left_key: str, right_key: str | None = None,
                num_shards: int | None = None):
    """SQL ``NOT IN (subquery)`` — which is NOT the same as NOT
    EXISTS: if the probe set contains even one NULL, x NOT IN (...)
    is never TRUE (it is NULL), so the WHOLE result is empty; a NULL
    left key is likewise never kept.  :func:`anti_join` implements the
    NOT EXISTS semantics; this wrapper implements the three-valued
    NOT IN truth table on top of it.

    The null probe is ONE any-null column aggregate over the probe
    side (per-batch combiner, no exchange); the non-null path is the
    same bounded distinct-key anti-join exchange.
    """
    right_key = right_key or left_key

    def has_null(t: pa.Table) -> pa.Table:
        n = t[right_key].null_count
        return pa.table({"has_null": pa.array([n > 0], pa.bool_())})

    right = right.materialize()
    flags = right.map_batches(has_null, batch_format="pyarrow")
    any_null = any(
        v for b in flags.iter_batches(batch_format="pyarrow",
                                      batch_size=None)
        for v in b["has_null"].to_pylist())
    lschema = pa.schema(left.schema().base_schema)
    if any_null:
        import ray.data as rd

        return rd.from_arrow(lschema.empty_table())
    kept = anti_join(left, right, left_key, right_key,
                     num_shards=num_shards)

    def drop_null_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[left_key])).cast(lschema)

    return kept.map_batches(drop_null_keys, batch_format="pyarrow")


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value",
            value_type: pa.DataType = pa.int64(), value_fn=None):
    """UNPIVOT / melt: one output row per (input row, value column) —
    columns become rows.  Purely per-batch (an Arrow concat of one
    slice per measure; the constant measure-name column is built with
    a vectorized ``take``, no Python per row), embarrassingly parallel,
    NO exchange — the inverse of pivot_counts' combiner shape.

    ``value_fn(column) -> column`` optionally transforms each measure
    before the cast (e.g. x -> round(x*100) int cents so the oracle is
    drift-free)."""
    out_fields = pa.schema(
        [pa.field(c, pa.schema(ds.schema().base_schema).field(c).type)
         for c in id_cols]
        + [pa.field(var_name, pa.string()),
           pa.field(value_name, value_type)])

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        zeros = pa.array(np.zeros(n, np.int64))
        parts = []
        for c in value_cols:
            v = value_fn(t[c]) if value_fn is not None else t[c]
            parts.append(pa.table({
                **{i: t[i] for i in id_cols},
                var_name: pa.array([c], pa.string()).take(zeros),
                value_name: pc.cast(v, value_type),
            }))
        if not parts:
            return out_fields.empty_table()
        return pa.concat_tables(parts).cast(out_fields)

    return ds.map_batches(fn, batch_format="pyarrow")


def unnest_list(ds, list_col: str, id_cols: list[str],
                pos_col: str = "pos", value_col: str = "value",
                value_type: pa.DataType | None = None):
    """UNNEST WITH ORDINALITY: one output row per list ELEMENT,
    carrying its parent's id columns and a 1-based position.  NULL
    and empty lists emit no rows (SQL UNNEST semantics).  Purely
    per-batch — ``pc.list_parent_indices`` + ``pc.list_flatten`` plus
    one arange for the ordinals, no exchange, embarrassingly
    parallel; the id columns replicate by a vectorized ``take`` on
    the parent indices (zero-copy for the flat values)."""
    def fn(t: pa.Table) -> pa.Table:
        # schema derived from the BATCH (pinned — empty batches emit
        # typed empties; a zero-block dataset never calls fn at all,
        # which also covers ds.schema() being None on empty inputs)
        vt = value_type or t.schema.field(list_col).type.value_type
        out_fields = pa.schema(
            [pa.field(c, t.schema.field(c).type) for c in id_cols]
            + [pa.field(pos_col, pa.int64()),
               pa.field(value_col, vt)])
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        par = pc.list_parent_indices(col) \
            .to_numpy(zero_copy_only=False)
        if len(par) == 0:
            return out_fields.empty_table()
        flat = pc.list_flatten(col)
        # 1-based ordinal inside each parent run (par is sorted)
        new = np.ones(len(par), bool)
        new[1:] = par[1:] != par[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(par)))
        pos = (np.arange(len(par), dtype=np.int64)
               - np.repeat(starts, sizes) + 1)
        take = pa.array(par, pa.int64())
        return pa.table({
            **{c: t[c].take(take) for c in id_cols},
            pos_col: pa.array(pos, pa.int64()),
            value_col: pc.cast(flat, vt),
        }).cast(out_fields)

    return ds.map_batches(fn, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_col: str = "doc_id",
                  text_col: str = "text",
                  num_shards: int | None = None,
                  hash_batch=None):
    """Corpus snapshot diff: Dataset(key, status) with status in
    {'added', 'removed', 'changed'} — what an append/refresh audit
    between two corpus versions reports.  UNCHANGED keys (the
    overwhelming majority at 100 TB) are classified and dropped
    INSIDE their shard task and never reach the driver or the output.

    Shape: each side collapses to (key, content_hash, side) rows —
    text never leaves its reading task — then ONE bounded key-hash
    shard exchange co-locates both versions of every key; a C-level
    merge classifies per shard.  Duplicate keys within a side keep
    the lexicographically smallest hash (deterministic).

    ``hash_batch`` defaults to the md5 fingerprint so the oracle can
    recompute it in SQL; swap in ``fingerprint_batch`` (keyed
    SipHash) for hot production paths."""
    import pandas as pd

    from .text import fingerprint_md5_batch

    hash_batch = hash_batch or fingerprint_md5_batch
    num_shards = num_shards or _default_shards()

    def rows(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                                 pc.is_valid(t[text_col])))
            t = hash_batch(t, text_col=text_col, out_col="h")
            kn = t[key_col].to_numpy(zero_copy_only=False)
            return pa.table({
                "kshard": pa.array(_key_shards(kn, num_shards, 101),
                                   pa.int64()),
                key_col: t[key_col],
                "h": t["h"],
                "side": pa.array(np.full(t.num_rows, side, np.int8),
                                 pa.int8()),
            })
        return fn

    union = old_ds.select_columns([key_col, text_col]) \
        .map_batches(rows(0), batch_format="pyarrow").union(
            new_ds.select_columns([key_col, text_col])
            .map_batches(rows(1), batch_format="pyarrow"))

    def classify(df):
        import pandas as pd

        sides = []
        for s in (0, 1):
            part = df.loc[df["side"] == s, [key_col, "h"]] \
                .sort_values([key_col, "h"], kind="stable") \
                .drop_duplicates(key_col, keep="first")
            sides.append(part)
        m = sides[0].merge(sides[1], on=key_col, how="outer",
                           suffixes=("_old", "_new"))
        status = np.where(
            m["h_old"].isna(), "added",
            np.where(m["h_new"].isna(), "removed",
                     np.where(m["h_old"] != m["h_new"], "changed",
                              "")))
        m = m.assign(status=status)
        m = m.loc[m["status"] != "", [key_col, "status"]]
        from ..sketches import pa_key_type
        return pa.table({
            key_col: pa.array(m[key_col].to_numpy(),
                              type=pa_key_type(df[key_col]),
                              from_pandas=True),
            "status": pa.array(m["status"].to_numpy(), pa.string(),
                               from_pandas=True)})

    return union.groupby("kshard") \
        .map_groups(classify, batch_format="pandas")


def key_reconcile(left, right, left_key: str,
                  right_key: str | None = None,
                  num_shards: int | None = None):
    """Bidirectional referential reconciliation in ONE exchange:
    distinct-key counts present only in ``left``, only in ``right``,
    and in both — the FULL OUTER JOIN completeness report (orphan
    children + childless parents) that a two-anti-join plan pays two
    shuffles for.

    Both sides are reduced to distinct keys per batch (combiner), then
    sentinel-tagged rows co-locate on a key-hash shard where a sorted
    run scan classifies each distinct key by which sides it appeared
    on.  Partial class-counts per shard; the driver sees 3 ints.

    -> Dataset with one row: (n_only_left, n_only_right,
       n_both int64).
    """
    import ray.data
    from .dedup import _default_shards, _group_starts, _key_shards

    rk = right_key or left_key
    nb = num_shards or _default_shards()

    def side_rows(key_col: str, side: int, seed: int = 101):
        def rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col]))
            g = pa.table({"k": t[key_col]}).group_by("k").aggregate([])
            keys = g["k"].to_numpy(zero_copy_only=False)
            return pa.table({
                "k": g["k"],
                "side": pa.array(
                    np.full(g.num_rows, side, np.int8), pa.int8()),
                "kshard": pa.array(_key_shards(keys, nb, seed),
                                   pa.int64())})
        return rows

    def classify(t: pa.Table) -> pa.Table:
        zero = pa.table({"n_only_left": pa.array([0], pa.int64()),
                         "n_only_right": pa.array([0], pa.int64()),
                         "n_both": pa.array([0], pa.int64())})
        if t.num_rows == 0:
            return zero
        idx = pc.sort_indices(t, sort_keys=[("k", "ascending"),
                                            ("side", "ascending")])
        t = t.take(idx)
        keys = t["k"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(keys)
        ends = starts + sizes - 1
        has_l = side[starts] == 0          # sides sorted: left first
        has_r = side[ends] == 1
        both = has_l & has_r
        return pa.table({
            "n_only_left": pa.array([int((has_l & ~has_r).sum())],
                                    pa.int64()),
            "n_only_right": pa.array([int((has_r & ~has_l).sum())],
                                     pa.int64()),
            "n_both": pa.array([int(both.sum())], pa.int64())})

    lt = left.map_batches(side_rows(left_key, 0),
                          batch_format="pyarrow")
    rt = right.map_batches(side_rows(rk, 1), batch_format="pyarrow")
    parts = lt.union(rt).groupby("kshard") \
        .map_groups(classify, batch_format="pyarrow")

    def total(t: pa.Table) -> pa.Table:
        def s(c):
            return int(pc.sum(t[c]).as_py() or 0) if t.num_rows else 0
        return pa.table({
            "n_only_left": pa.array([s("n_only_left")], pa.int64()),
            "n_only_right": pa.array([s("n_only_right")], pa.int64()),
            "n_both": pa.array([s("n_both")], pa.int64())})

    zero = ray.data.from_arrow(pa.table({
        "n_only_left": pa.array([0], pa.int64()),
        "n_only_right": pa.array([0], pa.int64()),
        "n_both": pa.array([0], pa.int64())}))
    return parts.union(zero).repartition(1) \
        .map_batches(total, batch_format="pyarrow")


def join_cardinality_audit(left, right, left_key: str,
                           right_key: str | None = None,
                           num_shards: int | None = None):
    """Pre-shuffle join planning audit: EXACT join output cardinality
    and hot-key skew maxima, computed BEFORE paying for the join —
    the check a 100 TB pipeline runs to decide between a shuffle
    join, a broadcast, and key salting.

    Both sides collapse to per-batch (key, count) combiners, the ONE
    key-hash exchange co-locates each key's side counts, and every
    shard emits a 6-scalar partial: distinct keys per side / in
    common, ``sum(n_left * n_right)`` (the inner-join row count), and
    the per-side max key frequency (the skew signal).  Magnitude
    contract: per-key n_left * n_right < 2^63.

    -> Dataset with one row: (n_left_keys, n_right_keys,
       n_common_keys, predicted_join_rows, max_left_freq,
       max_right_freq — all int64).
    """
    import ray.data

    from .dedup import _group_starts

    rk = right_key or left_key
    nb = num_shards or _default_shards()

    def side_rows(key_col: str, side: int, seed: int = 131):
        def rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col]))
            g = pa.table({"k": t[key_col]}) \
                .group_by("k").aggregate([([], "count_all")])
            keys = g["k"].to_numpy(zero_copy_only=False)
            return pa.table({
                "k": g["k"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "side": pa.array(
                    np.full(g.num_rows, side, np.int8), pa.int8()),
                "kshard": pa.array(_key_shards(keys, nb, seed),
                                   pa.int64())})
        return rows

    def audit(t: pa.Table) -> pa.Table:
        zero = pa.table({
            "n_left_keys": pa.array([0], pa.int64()),
            "n_right_keys": pa.array([0], pa.int64()),
            "n_common_keys": pa.array([0], pa.int64()),
            "predicted_join_rows": pa.array([0], pa.int64()),
            "max_left_freq": pa.array([0], pa.int64()),
            "max_right_freq": pa.array([0], pa.int64())})
        if t.num_rows == 0:
            return zero
        idx = pc.sort_indices(t, sort_keys=[("k", "ascending")])
        t = t.take(idx)
        keys = t["k"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(keys)
        ends = np.append(starts[1:], len(keys))
        nl = np.add.reduceat(np.where(side == 0, n, 0), starts)
        nr = np.add.reduceat(np.where(side == 1, n, 0), starts)
        # reduceat quirk: a start index equal to len(array) is
        # impossible here because starts come from group boundaries
        del ends
        return pa.table({
            "n_left_keys": pa.array([int((nl > 0).sum())], pa.int64()),
            "n_right_keys": pa.array([int((nr > 0).sum())], pa.int64()),
            "n_common_keys": pa.array(
                [int(((nl > 0) & (nr > 0)).sum())], pa.int64()),
            "predicted_join_rows": pa.array(
                [int((nl * nr).sum())], pa.int64()),
            "max_left_freq": pa.array([int(nl.max())], pa.int64()),
            "max_right_freq": pa.array([int(nr.max())], pa.int64())})

    lt = left.map_batches(side_rows(left_key, 0),
                          batch_format="pyarrow")
    rt = right.map_batches(side_rows(rk, 1), batch_format="pyarrow")
    parts = lt.union(rt).groupby("kshard") \
        .map_groups(audit, batch_format="pyarrow")

    def total(t: pa.Table) -> pa.Table:
        def s(c, agg):
            return int(agg(t[c]).as_py() or 0) if t.num_rows else 0
        return pa.table({
            "n_left_keys": pa.array([s("n_left_keys", pc.sum)],
                                    pa.int64()),
            "n_right_keys": pa.array([s("n_right_keys", pc.sum)],
                                     pa.int64()),
            "n_common_keys": pa.array([s("n_common_keys", pc.sum)],
                                      pa.int64()),
            "predicted_join_rows": pa.array(
                [s("predicted_join_rows", pc.sum)], pa.int64()),
            "max_left_freq": pa.array([s("max_left_freq", pc.max)],
                                      pa.int64()),
            "max_right_freq": pa.array([s("max_right_freq", pc.max)],
                                       pa.int64())})

    zero = ray.data.from_arrow(pa.table({
        "n_left_keys": pa.array([0], pa.int64()),
        "n_right_keys": pa.array([0], pa.int64()),
        "n_common_keys": pa.array([0], pa.int64()),
        "predicted_join_rows": pa.array([0], pa.int64()),
        "max_left_freq": pa.array([0], pa.int64()),
        "max_right_freq": pa.array([0], pa.int64())}))
    return parts.union(zero).repartition(1) \
        .map_batches(total, batch_format="pyarrow")


def apply_agg_delta(base_agg, delta, key_col: str,
                    cols: tuple = ("cents", "n"),
                    num_shards: int | None = None):
    """Incremental materialized-view maintenance: fold a SIGNED delta
    aggregate (inserts positive, deletes negative, updates as their
    difference) into a materialized per-key aggregate WITHOUT
    rescanning the base fact table.  Both inputs are Datasets of
    (key, *cols) rows; the exchange is one key-hash groupby over
    base-keys + delta-keys — bounded by distinct keys, never facts.
    Keys whose row count column (``cols[-1]``) folds to zero drop out
    (fully-deleted groups).

    The CDC-apply primitive every warehouse's REFRESH MATERIALIZED
    VIEW ... INCREMENTAL runs; correctness = recompute equivalence,
    oracle-checked in `customer_totals_after_cdc`.
    """
    import ray.data.aggregate as A

    import pyarrow.compute as _pc

    aggs = [A.Sum(c) for c in cols]
    merged = base_agg.union(delta).groupby(key_col).aggregate(*aggs)

    def finish(t: pa.Table) -> pa.Table:
        out = {key_col: t[key_col]}
        for c in cols:
            out[c] = _pc.cast(t[f"sum({c})"], pa.int64())
        tbl = pa.table(out)
        return tbl.filter(_pc.not_equal(tbl[cols[-1]], 0))

    return merged.map_batches(finish, batch_format="pyarrow")
