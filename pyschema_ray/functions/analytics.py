"""Grouped analytics that avoid global sorts.

:func:`grouped_topk` — top-k rows per group WITHOUT sorting the whole
dataset: a per-batch partial top-k shrinks each block to <= k rows per
group seen in it, then groups co-locate on integer hash shards for the
final per-group head.  The shuffle carries at most k × groups × blocks
rows, never the corpus.  Ties break deterministically on the tiebreak
column so results are reproducible (and SQL-oracle-comparable against
a row_number() window)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_shards, _group_starts, _key_shards


def _arrow_group_head(t: pa.Table, group_col: str, order_col: str,
                      tiebreak_col: str, k: int,
                      descending: bool) -> pa.Table:
    """Per-group head-k of an Arrow table: one C++ sort_by, then a
    vectorized within-group rank over the contiguous group runs — no
    pandas round-trip in the hot path."""
    t = t.sort_by([
        (group_col, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (tiebreak_col, "ascending"),
    ])
    groups = t[group_col].to_numpy(zero_copy_only=False)
    starts, sizes = _group_starts(groups)
    rank = np.arange(len(groups)) - np.repeat(starts, sizes)
    return t.take(np.flatnonzero(rank < k))


def grouped_exact_quantiles(ds, group_col: str, value_col: str,
                            quantiles=(0.5,)):
    """EXACT per-group quantiles for bounded-domain integer values —
    the scalable complement to the t-digest (approximate, any domain):
    each batch contributes a (group, value, count) combiner table, the
    exchange carries distinct (group, value) pairs (bounded by groups ×
    domain, never row count), and per group the quantile is read off
    the merged cumulative counts.  Matches SQL ``quantile_cont`` /
    ``median`` semantics (linear interpolation between order
    statistics).  Groups co-locate whole on the exchange (group
    cardinality assumed moderate — sources, shards, languages; for
    near-unique groups use a hash-shard wrapper).

    -> Dataset(group_col, q_<q> float64 columns)."""
    qs = list(quantiles)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select([group_col, value_col])
        # SQL aggregate semantics: null groups/values ignored (also:
        # Ray's sort shuffle cannot order null keys)
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[value_col])))
        g = t.group_by([group_col, value_col]) \
             .aggregate([(value_col, "count")])
        return g.rename_columns([group_col, value_col, "cnt"])

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([(group_col, "ascending"),
                       (value_col, "ascending")])
        groups = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, sizes = _group_starts(groups)
        out: dict = {group_col: groups[starts]}
        per_q = {q: np.empty(len(starts), np.float64) for q in qs}
        for gi, (s, m) in enumerate(zip(starts, sizes)):
            v = vals[s:s + m]
            c = cnt[s:s + m]
            cum = np.cumsum(c)
            n = cum[-1]
            for q in qs:
                # type-7 (SQL quantile_cont) position on the expanded
                # sorted sequence, evaluated on the RLE counts
                pos = q * (n - 1)
                lo_i = int(np.searchsorted(cum, np.floor(pos) + 1,
                                           side="left"))
                hi_i = int(np.searchsorted(cum, np.ceil(pos) + 1,
                                           side="left"))
                frac = pos - np.floor(pos)
                per_q[q][gi] = vals[s + lo_i] * (1 - frac) \
                    + vals[s + hi_i] * frac
        for q in qs:
            out[f"q_{q}"] = per_q[q]
        return pa.table(out)

    pre = ds.map_batches(partial, batch_format="pyarrow")
    import ray.data.aggregate as A

    merged = pre.groupby([group_col, value_col]).aggregate(A.Sum("cnt"))
    merged = merged.map_batches(
        lambda t: t.rename_columns([group_col, value_col, "cnt"]),
        batch_format="pyarrow")
    # group cardinality is moderate by contract: one finalize pass
    return merged.repartition(1).map_batches(finalize,
                                             batch_format="pyarrow")


def grouped_ndv(ds, group_col: str, key_col: str,
                num_shards: int | None = None):
    """EXACT per-group distinct-key counts (count(DISTINCT key) GROUP
    BY group) at shuffle-safe scale: per batch an Arrow group_by
    dedups (group, key) pairs (the combiner), the exchange carries
    distinct pairs on a bounded KEY-hash shard (a key's duplicates
    always co-shard, so cross-shard double counting is impossible and
    the shard key stays integer/uniform even for 10^9 distinct keys),
    per shard a second dedup + per-group count yields partials, and a
    final small groupby sums them (group cardinality moderate by
    contract).  Null groups/keys are ignored (SQL semantics).

    -> Dataset(group_col, ndv int64)."""
    import pyarrow.compute as pc

    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, key_col])
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[key_col])))
        g = t.group_by([group_col, key_col]).aggregate([])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        return g.append_column(
            "kshard", pa.array(_key_shards(keys, num_shards, 61),
                               pa.int64()))

    def count_shard(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, key_col]).aggregate([])
        c = g.group_by(group_col).aggregate([(key_col, "count")])
        return c.select([group_col, f"{key_col}_count"]) \
                .rename_columns([group_col, "ndv"])

    import ray.data.aggregate as A

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard").map_groups(count_shard, batch_format="pyarrow")
    out = partials.groupby(group_col).aggregate(A.Sum("ndv"))
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "ndv"]),
        batch_format="pyarrow")


def grouped_ndv_hll(ds, group_col: str, key_col: str, p: int = 14):
    """APPROXIMATE per-group distinct counts — the sketch path for
    when :func:`grouped_ndv`'s distinct-pair exchange is itself too
    large (10^9+ distinct keys per group): each batch emits one
    serialized HLL per group present (p=14 -> 16 KB, ~0.8% error),
    partials merge by register-max.  No key ever leaves its batch;
    the exchange carries groups × blocks sketches.

    Returns a driver-side dict {group: estimated_ndv} (group
    cardinality is moderate by the same contract as grouped stats)."""
    import pyarrow.compute as pc

    from ..sketches import HyperLogLog, hash_strings, mix64

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, key_col])
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[key_col])))
        groups = t[group_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False))
        if keys.dtype.kind in "iu":
            h = mix64(keys.astype(np.int64).view(np.uint64))
        else:
            h = hash_strings(keys)
        out_g, out_b = [], []
        order = np.argsort(groups, kind="stable")
        g_sorted, h_sorted = groups[order], h[order]
        starts, sizes = _group_starts(g_sorted)
        for s, m in zip(starts, sizes):
            hll = HyperLogLog(p).add_hashes(h_sorted[s:s + m])
            out_g.append(g_sorted[s])
            out_b.append(hll.to_bytes())
        return pa.table({group_col: pa.array(out_g),
                         "blob": pa.array(out_b, pa.binary())})

    merged: dict = {}
    small = ds.map_batches(partial, batch_format="pyarrow")
    for b in small.iter_batches(batch_format="pyarrow", batch_size=None):
        from ..sketches import HyperLogLog as H
        for g, blob in zip(b[group_col].to_pylist(),
                           b["blob"].to_pylist()):
            s = H.from_bytes(blob)
            if g in merged:
                merged[g].merge(s)
            else:
                merged[g] = s
    return {g: s.estimate() for g, s in merged.items()}


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 tiebreak_col: str, descending: bool = True,
                 num_shards: int | None = None,
                 columns: list[str] | None = None):
    """-> Dataset of the top-``k`` rows per ``group_col`` value, ordered
    by ``order_col`` (desc by default), ties broken ascending on
    ``tiebreak_col``.  ``columns`` restricts the carried payload
    (default: group, order, tiebreak)."""
    num_shards = num_shards or _default_shards()
    keep = columns or [group_col, order_col, tiebreak_col]
    keep = list(dict.fromkeys([group_col, order_col, tiebreak_col] + keep))

    def partial(t: pa.Table) -> pa.Table:
        out = _arrow_group_head(t.select(keep), group_col, order_col,
                                tiebreak_col, k, descending)
        shard = _key_shards(out[group_col].to_numpy(zero_copy_only=False),
                            num_shards, 41)
        return out.append_column("gshard", pa.array(shard, pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        return _arrow_group_head(t, group_col, order_col, tiebreak_col,
                                 k, descending).drop_columns(["gshard"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(final, batch_format="pyarrow")


def corpus_quantile(ds, value_col: str, q: float = 0.5) -> float:
    """GLOBAL exact quantile of a bounded-domain integer column (the
    grouped kernel with a constant group) — the first phase of a
    quantile-threshold filter: compute once, broadcast the scalar,
    filter in a streaming scan.  Returns a float (SQL quantile_cont
    semantics)."""
    def const_group(t: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            value_col: t[value_col],
        })

    out = grouped_exact_quantiles(
        ds.map_batches(const_group, batch_format="pyarrow"),
        "__g", value_col, (q,))
    rows = [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows]
    if not rows:
        raise ValueError(f"no non-null values in {value_col!r}")
    return float(rows[0][f"q_{q}"][0].as_py())


def quantile_threshold_filter(ds, value_col: str, q: float = 0.5,
                              keep: str = "ge",
                              threshold: float | None = None):
    """Keep rows whose ``value_col`` is >= (``keep='ge'``) or <=
    ('le') the corpus's exact q-quantile — the standard
    percentile-based quality filter, as TWO streaming phases: an exact
    distributed quantile (count-vector exchange, never rows), then a
    broadcast-scalar filter scan.  Pass ``threshold`` to skip phase 1
    (e.g. a persisted production cut)."""
    import pyarrow.compute as pc

    if keep not in ("ge", "le"):
        raise ValueError(keep)
    thr = corpus_quantile(ds, value_col, q) if threshold is None \
        else float(threshold)
    op = pc.greater_equal if keep == "ge" else pc.less_equal

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(op(t[value_col], thr), False))

    return ds.map_batches(filt, batch_format="pyarrow")


def _exact_rank_values(ds, value_col: str, ranks_from_n,
                       n_buckets: int = 4096):
    """Distributed selection of arbitrary 0-based order statistics of
    an UNBOUNDED numeric column — doubles included — never a global
    sort.  ``ranks_from_n(n)`` maps the non-null count to the set of
    sorted-position ranks wanted (computed AFTER scan 1, since ranks
    depend on n).  Returns ``(n, {rank: value})``; every value is an
    actual element of the column.

    Three streaming scans over the (materialize()d — distributed, not
    driver-held) input:

    1. global (min, max, count) — one row per block to the driver;
    2. fixed-grid histogram: per-batch ``bincount`` partials with
       per-bucket min/max, merged by a BOUNDED groupby on the bucket
       id (cardinality ``n_buckets``); the driver then locates each
       target rank's bucket from cumulative counts.  A bucket whose
       min == max resolves immediately (heavy-tie fast path);
    3. only the unresolved buckets' raw values are collected and
       locally sorted — expected n/n_buckets values each (documented
       skew bound: a single-bucket pileup with distinct values
       degrades this scan to that bucket's size).

    Nulls and NaNs are excluded (state the same in any oracle).
    """
    import pyarrow.compute as pc

    ds = ds.materialize()

    def minmax(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([v.min()], pa.float64()),
                         "hi": pa.array([v.max()], pa.float64()),
                         "n": pa.array([len(v)], pa.int64())})

    parts = [b for b in ds.map_batches(minmax, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not parts:
        raise ValueError(f"no non-null values in {value_col!r}")
    mm = pa.concat_tables(parts)
    lo = pc.min(mm["lo"]).as_py()
    hi = pc.max(mm["hi"]).as_py()
    n = pc.sum(mm["n"]).as_py()
    width = (hi - lo) / n_buckets if hi > lo else 1.0

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "bmin": pa.array([], pa.float64()),
                             "bmax": pa.array([], pa.float64())})
        b = np.clip(((v - lo) / width).astype(np.int64), 0,
                    n_buckets - 1)
        order = np.argsort(b, kind="stable")
        sb, sv = b[order], v[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        sizes = np.diff(np.r_[starts, len(sb)])
        return pa.table({
            "bucket": pa.array(sb[starts], pa.int64()),
            "cnt": pa.array(sizes.astype(np.int64), pa.int64()),
            "bmin": pa.array(np.minimum.reduceat(sv, starts),
                             pa.float64()),
            "bmax": pa.array(np.maximum.reduceat(sv, starts),
                             pa.float64())})

    def hist_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["bucket"]).aggregate(
            [("cnt", "sum"), ("bmin", "min"), ("bmax", "max")])
        return g.select(["bucket", "cnt_sum", "bmin_min", "bmax_max"]) \
            .rename_columns(["bucket", "cnt", "bmin", "bmax"])

    hist = pa.concat_tables(
        [b for b in ds.map_batches(hist_partial, batch_format="pyarrow")
         .groupby("bucket").map_groups(hist_merge,
                                       batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows])
    hist = hist.sort_by("bucket")
    buckets = hist["bucket"].to_numpy()
    cnts = hist["cnt"].to_numpy()
    bmins = hist["bmin"].to_numpy()
    bmaxs = hist["bmax"].to_numpy()
    cum = np.cumsum(cnts)

    resolved: dict[int, float] = {}
    need: dict[int, list[tuple[int, int]]] = {}
    for k in sorted(set(ranks_from_n(n))):
        k = int(k)
        j = int(np.searchsorted(cum, k, side="right"))
        offset = int(k - (cum[j - 1] if j else 0))
        if bmins[j] == bmaxs[j]:
            resolved[k] = float(bmins[j])
        else:
            need.setdefault(int(buckets[j]), []).append((k, offset))

    if need:
        wanted = set(need)

        def collect(t: pa.Table) -> pa.Table:
            v = t[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            v = v[~np.isnan(v)]
            b = np.clip(((v - lo) / width).astype(np.int64), 0,
                        n_buckets - 1)
            mask = np.isin(b, list(wanted))
            return pa.table({"bucket": pa.array(b[mask], pa.int64()),
                             "value": pa.array(v[mask], pa.float64())})

        got = pa.concat_tables(
            [b for b in ds.map_batches(collect, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows])
        gb = got["bucket"].to_numpy()
        gv = got["value"].to_numpy()
        for bucket, targets in need.items():
            vals = np.sort(gv[gb == bucket])
            for k, offset in targets:
                resolved[k] = float(vals[offset])

    return n, resolved


def exact_value_deciles(ds, value_col: str,
                        tenths: tuple[int, ...] = (1, 2, 3, 4, 5,
                                                   6, 7, 8, 9),
                        n_buckets: int = 4096):
    """EXACT discrete quantiles (SQL ``quantile_disc`` /
    ``percentile_disc``) via :func:`_exact_rank_values` (3-scan
    distributed selection, never a global sort).

    For decile i the selected element is the one at 0-based rank
    ``ceil(i*n/10) - 1`` of the sorted column, computed with exact
    integer arithmetic (``(i*n + 9)//10 - 1``) — verified to match
    DuckDB's quantile_disc for every n in 1..59 and every tenth.

    Returns pa.table(tenth int64, value float64) — each value is an
    actual element of the column, so parity with the SQL oracle is
    bit-exact.
    """
    def ranks(n: int):
        return [max(0, (i * n + 9) // 10 - 1) for i in tenths]

    n, got = _exact_rank_values(ds, value_col, ranks, n_buckets)
    ts = sorted(tenths)
    return pa.table({
        "tenth": pa.array(ts, pa.int64()),
        "value": pa.array([got[max(0, (i * n + 9) // 10 - 1)]
                           for i in ts], pa.float64())})


def exact_value_quantiles_cont(ds, value_col: str,
                               quantiles: tuple[float, ...] =
                               (0.25, 0.5, 0.75),
                               n_buckets: int = 4096):
    """EXACT continuous quantiles (SQL ``quantile_cont`` /
    ``percentile_cont``: linear interpolation between adjacent order
    statistics) via the same 3-scan distributed selection — never a
    global sort and never more than ~2x len(quantiles) bucket
    collects.

    For quantile q over n non-null values the target position is
    ``r = q*(n-1)`` (0-based, DuckDB/Postgres semantics); the result
    interpolates ``v[floor(r)] + (r - floor(r)) * (v[ceil(r)] -
    v[floor(r)])`` in float64 — the same formula DuckDB evaluates, so
    the driver's 9-decimal rounded hash matches.

    Returns pa.table(q float64, value float64).
    """
    import math

    def ranks(n: int):
        out = []
        for q in quantiles:
            r = q * (n - 1)
            out.append(int(math.floor(r)))
            out.append(int(math.ceil(r)))
        return out

    n, got = _exact_rank_values(ds, value_col, ranks, n_buckets)
    vals = []
    for q in quantiles:
        r = q * (n - 1)
        k0, k1 = int(math.floor(r)), int(math.ceil(r))
        v0, v1 = got[k0], got[k1]
        vals.append(v0 + (r - k0) * (v1 - v0))
    return pa.table({"q": pa.array(list(quantiles), pa.float64()),
                     "value": pa.array(vals, pa.float64())})


def grouped_mode(ds, group_col: str, value_col: str,
                 num_shards: int | None = None,
                 null_label: str = "[NULL]"):
    """Most-frequent value per group -> Dataset(group, mode_val,
    n_occurrences), deterministic: ties break to the LEXICALLY
    SMALLEST value (state the same in the SQL oracle's row_number
    ORDER BY count DESC, value ASC).

    Shape: per-batch (group, value) count partials — the combiner, so
    the exchange carries distinct pairs per batch, never rows — ONE
    bounded group-hash shard groupby, then a per-shard argmax over
    sorted runs.  Scales with distinct (group, value) pairs, not rows.
    """
    import pyarrow.compute as pc

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "g": pc.fill_null(pc.cast(t[group_col], pa.string()),
                              null_label),
            "v": pc.fill_null(pc.cast(t[value_col], pa.string()),
                              null_label)})
        agg = g.group_by(["g", "v"]).aggregate([([], "count_all")])
        agg = agg.select(["g", "v", "count_all"]) \
            .rename_columns(["g", "v", "n"])
        shard = _key_shards(agg["g"].to_numpy(zero_copy_only=False),
                            nb, 79)
        return agg.append_column("gshard", pa.array(shard, pa.int64()))

    def pick(t: pa.Table) -> pa.Table:
        agg = t.group_by(["g", "v"]).aggregate([("n", "sum")])
        agg = agg.select(["g", "v", "n_sum"]) \
            .rename_columns(["g", "v", "n"])
        # sort: group asc, count desc, value asc -> first row per run
        # is the deterministic mode
        agg = agg.sort_by([("g", "ascending"), ("n", "descending"),
                           ("v", "ascending")])
        groups = agg["g"].to_numpy(zero_copy_only=False)
        starts, _ = _group_starts(groups)
        head = agg.take(starts)
        return pa.table({
            group_col: head["g"],
            "mode_val": head["v"],
            "n_occurrences": pc.cast(head["n"], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(pick, batch_format="pyarrow")


def funnel_counts(ds, steps: list[str], key_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  num_shards: int | None = None):
    """Ordered funnel completion -> one row with, per prefix length
    k, the number of keys whose FIRST occurrence times of the steps
    are strictly increasing: first(step1) < ... < first(stepk).

    Columns: ``completed_1 .. completed_N`` (int64).  The SQL oracle
    is the classic conditional-min formulation (min(CASE WHEN type =
    step THEN ts END) per user, then strict < chain).

    Shape: per-batch combiner keeps ONE min-ts per (key, step) — the
    exchange carries at most keys x steps rows per batch — then one
    bounded key-hash shard groupby computes per-shard completion
    partials (every key's rows co-locate) and a single-row reduce
    sums them.  Driver never holds per-key state.
    """
    import pyarrow.compute as pc

    nb = num_shards or _default_shards()
    n_steps = len(steps)
    cols = [f"completed_{k}" for k in range(1, n_steps + 1)]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col])),
            pc.is_in(t[type_col], value_set=pa.array(steps))))
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        g = pa.table({"key": t[key_col], "step": t[type_col], "us": us})
        agg = g.group_by(["key", "step"]).aggregate([("us", "min")])
        agg = agg.select(["key", "step", "us_min"]) \
            .rename_columns(["key", "step", "us"])
        shard = _key_shards(agg["key"].to_numpy(zero_copy_only=False),
                            nb, 83)
        return agg.append_column("kshard", pa.array(shard, pa.int64()))

    def shard_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        agg = t.group_by(["key", "step"]).aggregate([("us", "min")])
        keys = agg["key"].to_numpy(zero_copy_only=False)
        sidx = _pc.index_in(agg["step"],
                            value_set=pa.array(steps)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        us = agg.column("us_min").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys, sidx, us = keys[order], sidx[order], us[order]
        starts, sizes = _group_starts(keys)
        nk = len(starts)
        # first-ts matrix (keys x steps), NaN where the step is absent
        mat = np.full((nk, n_steps), np.nan)
        row = np.repeat(np.arange(nk), sizes)
        mat[row, sidx] = us.astype(np.float64)
        ok = ~np.isnan(mat[:, 0])
        counts = np.zeros(n_steps, np.int64)
        counts[0] = int(ok.sum())
        for k in range(1, n_steps):
            ok = ok & ~np.isnan(mat[:, k]) & (mat[:, k - 1] < mat[:, k])
            counts[k] = int(ok.sum())
        return pa.table({c: pa.array([int(counts[i])], pa.int64())
                         for i, c in enumerate(cols)})

    def total(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({c: pa.array([_pc.sum(t[c]).as_py() or 0],
                                     pa.int64()) for c in cols})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard").map_groups(shard_counts,
                                      batch_format="pyarrow") \
        .repartition(1).map_batches(total, batch_format="pyarrow")


def pivot_counts(ds, row_col: str, pivot_col: str,
                 categories: list[str], other_label: str = "other"):
    """Conditional-aggregation PIVOT -> Dataset(row_col, <one int64
    count column per category>, other): the wide-format contingency
    table (SQL ``SUM(CASE WHEN pivot = c THEN 1 END)``).

    ``categories`` must be the FIXED, known column set — a pivot over
    unbounded categories is a schema explosion, so unknown values
    fold into ``other`` (the documented scale guard).  Per-batch
    (row, pivot) count partials make the exchange carry distinct
    pairs; a single bounded groupby then pivots the (small) pair
    table vectorized via index_in + (rows x cats) add.at.
    """
    import pyarrow.compute as pc

    cats = list(categories)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "r": pc.fill_null(pc.cast(t[row_col], pa.string()),
                              "[NULL]"),
            "p": pc.fill_null(pc.cast(t[pivot_col], pa.string()),
                              "[NULL]")})
        agg = g.group_by(["r", "p"]).aggregate([([], "count_all")])
        return agg.select(["r", "p", "count_all"]) \
            .rename_columns(["r", "p", "n"])

    def pivot(t: pa.Table) -> pa.Table:
        agg = t.group_by(["r", "p"]).aggregate([("n", "sum")])
        rows_arr = agg["r"]
        if isinstance(rows_arr, pa.ChunkedArray):
            rows_arr = rows_arr.combine_chunks()
        uniq = pc.unique(rows_arr)
        uniq = uniq.take(pc.sort_indices(uniq))
        ridx = pc.index_in(agg["r"], value_set=uniq) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cidx = pc.index_in(agg["p"], value_set=pa.array(cats)) \
            .to_numpy(zero_copy_only=False)
        cidx = np.where(np.isnan(cidx.astype(np.float64)), len(cats),
                        cidx).astype(np.int64)
        n = pc.cast(agg["n_sum"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mat = np.zeros((len(uniq), len(cats) + 1), np.int64)
        np.add.at(mat, (ridx, cidx), n)
        out = {row_col: uniq}
        for j, c in enumerate(cats):
            out[c] = pa.array(mat[:, j], pa.int64())
        out[other_label] = pa.array(mat[:, len(cats)], pa.int64())
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(pivot, batch_format="pyarrow")


def top_keys(ds, key_col: str, k: int = 10,
             num_shards: int | None = None):
    """EXACT top-k hottest keys by row count — the skew diagnostic
    run before choosing a partitioning key (a key this returns is a
    salting candidate).  Same exact-heavy-hitter shape as
    ``text.top_words``: per-batch value_counts combiner (the exchange
    carries distinct keys per batch, never rows), bounded key-hash
    shard sum (each key's GLOBAL count lives wholly in one shard, so
    per-shard head-k then final head-k is exact), deterministic
    ascending-key tie-break.  -> Dataset(key_col, n), min(k, ndv)
    rows."""

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        col = t.filter(pc.is_valid(t[key_col]))[key_col]
        vc = col.combine_chunks().value_counts()
        keys = vc.field("values")
        kn = keys.to_numpy(zero_copy_only=False)
        return pa.table({
            "kshard": pa.array(_key_shards(kn, nb, 149), pa.int64()),
            key_col: keys,
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    def shard_head(t: pa.Table) -> pa.Table:
        g = t.group_by(key_col).aggregate([("n", "sum")])
        g = g.select([key_col, "n_sum"]).rename_columns([key_col, "n"])
        g = g.sort_by([("n", "descending"), (key_col, "ascending")])
        return g.slice(0, k)

    def final_head(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n", "descending"), (key_col, "ascending")])
        return t.slice(0, k)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard") \
        .map_groups(lambda t: shard_head(t.drop_columns(["kshard"])),
                    batch_format="pyarrow") \
        .repartition(1).map_batches(final_head, batch_format="pyarrow")


def grouped_rank_topk(ds, group_col: str, item_col: str, k: int = 3,
                      num_shards: int | None = None):
    """Tie-aware RANK() per group: items ranked by row count within
    their group under ``ORDER BY n DESC`` ONLY — ties share a rank and
    the next rank skips (SQL ``rank()``, vs the row_number semantics
    of ``top_per_group``) — returning every row with ``rank <= k``
    (ties included, so a group can return more than k items).

    Scale shape: per-batch (group, item) value-counts combiner, ONE
    bounded group-hash shard exchange (a group's counts co-locate
    wholly), then a single vectorized pass ranks ALL groups of a
    shard at once: sort by (group, n desc, item), rank = first index
    of the row's (group, n) tie-run minus its group's first index + 1.
    Output is deterministic regardless of tie order because ties by
    construction share (group, n, rank).

    -> Dataset(group_col, item_col, n int64, rnk int64).
    """
    from .dedup import _default_shards, _group_starts, _key_shards

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, item_col]) \
            .group_by([group_col, item_col]) \
            .aggregate([([], "count_all")]) \
            .rename_columns([group_col, item_col, "n"])
        keys = g[group_col].to_numpy(zero_copy_only=False)
        return g.append_column(
            "kshard", pa.array(_key_shards(keys, nb), pa.int64()))

    def shard_rank(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, item_col]).aggregate([("n", "sum")])
        g = g.rename_columns([group_col, item_col, "n"])
        idx = pc.sort_indices(g, sort_keys=[
            (group_col, "ascending"), ("n", "descending"),
            (item_col, "ascending")])
        g = g.take(idx)
        grp = g[group_col].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        sg, zg = _group_starts(grp)
        st, zt = _group_starts(grp, n)
        first_of_tie = np.repeat(st, zt)
        group_first = np.repeat(sg, zg)
        rnk = (first_of_tie - group_first + 1).astype(np.int64)
        keep = rnk <= k
        out = g.filter(pa.array(keep))
        return pa.table({
            group_col: out[group_col], item_col: out[item_col],
            "n": pc.cast(out["n"], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard").map_groups(
            lambda t: shard_rank(t.drop_columns(["kshard"])),
            batch_format="pyarrow")


def grouped_string_agg(ds, group_col: str, value_col: str,
                       sep: str = ",", num_shards: int | None = None):
    """SQL ``string_agg(DISTINCT value, sep ORDER BY value)`` per
    group — the report-shaped "list the group's members" aggregate.

    Shape: per-batch DISTINCT (group, value) pairs — the combiner, so
    the exchange carries distinct pairs per batch, never rows — ONE
    bounded group-hash shard groupby, then per shard one Arrow sort +
    run-boundary offsets + ``binary_join`` (the inverted-index
    posting idiom: no per-group Python lambda).  Null groups and null
    values are dropped (SQL aggregate semantics — state the same in
    the oracle).  Output length per group is member-bounded; callers
    aggregating unbounded-cardinality values should cap upstream.

    -> Dataset(group_col, values string)."""
    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "g": pc.cast(t[group_col], pa.string()),
            "v": pc.cast(t[value_col], pa.string())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "gshard": pa.array([], pa.int64())})
        g = g.group_by(["g", "v"]).aggregate([])
        shard = _key_shards(g["g"].to_numpy(zero_copy_only=False),
                            num_shards, 61)
        return g.append_column("gshard", pa.array(shard, pa.int64()))

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g" not in t.column_names:
            return pa.table({group_col: pa.array([], pa.string()),
                             "values": pa.array([], pa.string())})
        t = t.group_by(["g", "v"]).aggregate([])  # cross-batch distinct
        t = t.sort_by([("g", "ascending"), ("v", "ascending")])
        groups = t["g"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(groups)
        offsets = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(sizes, out=offsets[1:])
        vals = pc.cast(t["v"], pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), vals)
        joined = pc.cast(pc.binary_join(lst, sep), pa.string())
        return pa.table({group_col: pa.array(groups[starts],
                                             pa.string()),
                         "values": joined})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard") \
        .map_groups(lambda t: agg(t.drop_columns(["gshard"])),
                    batch_format="pyarrow")


def _grouped_int_moments(ds, group_col: str, x_col: str, y_col: str,
                         x_scale: float = 1.0, y_scale: float = 1.0):
    """Per-group EXACT integer moment accumulation for two numeric
    columns — the shared engine behind grouped_corr / grouped_linreg,
    reproducible against SQL because both engines derive the SAME
    final float expressions from IDENTICAL integers.

    Each value is rounded to an integer after multiplying by
    ``*_scale`` (half away from zero — SQL ``round()``); per batch a
    vectorized combiner emits per-group int64 partial moments (n, Sx,
    Sy, Sxx, Syy, Sxy).  Partials are one tiny row per (group, batch)
    — they merge on the driver with PYTHON-INT sums (arbitrary
    precision: Sxx over 10^12 rows overflows int64, and float
    accumulation would break exactness).  The final
    ``corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy -
    Sy^2))`` runs in float64 from those exact integers — the oracle
    states the identical expression over HUGEINT sums.  Groups where
    either variance term is zero return null (SQL corr semantics).

    Scale shape: the exchange is per-block moment rows (6 ints x
    groups), the classic shuffle-free statistical aggregate.  Returns
    {group: [n, Sx, Sy, Sxx, Syy, Sxy]} with python-int values."""
    def _round_half_away(a: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(a) + 0.5), a)

    def partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(t[x_col]),
                             pc.is_valid(t[y_col])))
        t = pa.table({"g": g, "x": t[x_col], "y": t[y_col]}).filter(ok)
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.string() if c == "g"
                                         else pa.int64())
                             for c in ("g", "n", "sx", "sy",
                                       "sxx", "syy", "sxy")})
        x = _round_half_away(t["x"].to_numpy(zero_copy_only=False)
                             .astype(np.float64) * x_scale) \
            .astype(np.int64)
        y = _round_half_away(t["y"].to_numpy(zero_copy_only=False)
                             .astype(np.float64) * y_scale) \
            .astype(np.int64)
        gv = t["g"].to_numpy(zero_copy_only=False)
        order = np.argsort(gv, kind="stable")
        gs, xs, ys = gv[order], x[order], y[order]
        starts, sizes = _group_starts(gs)
        def seg(v):
            return np.add.reduceat(v, starts).astype(np.int64)
        return pa.table({
            "g": pa.array(gs[starts], pa.string()),
            "n": pa.array(sizes.astype(np.int64), pa.int64()),
            "sx": pa.array(seg(xs), pa.int64()),
            "sy": pa.array(seg(ys), pa.int64()),
            "sxx": pa.array(seg(xs * xs), pa.int64()),
            "syy": pa.array(seg(ys * ys), pa.int64()),
            "sxy": pa.array(seg(xs * ys), pa.int64())})

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    acc: dict[str, list[int]] = {}
    for b in parts:
        gs = b["g"].to_pylist()
        cols = [b[c].to_pylist()
                for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        for i, gname in enumerate(gs):
            a = acc.setdefault(gname, [0, 0, 0, 0, 0, 0])
            for j in range(6):
                a[j] += cols[j][i]     # python ints: no overflow
    return acc


def grouped_corr(ds, group_col: str, x_col: str, y_col: str,
                 x_scale: float = 1.0, y_scale: float = 1.0):
    """EXACT per-group Pearson correlation over
    :func:`_grouped_int_moments` (see that docstring for the integer
    discipline): ``corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) *
    sqrt(n*Syy - Sy^2))`` in float64 from exact integers — the oracle
    states the identical expression over HUGEINT sums, so the result
    is bit-equal.  Groups with zero variance in either column return
    null (SQL corr semantics).

    Returns pa.table(group_col string, corr float64) sorted by
    group."""
    import math

    acc = _grouped_int_moments(ds, group_col, x_col, y_col,
                               x_scale, y_scale)
    groups = sorted(acc)
    out = []
    for gname in groups:
        n, sx, sy, sxx, syy, sxy = acc[gname]
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            out.append(None)
        else:
            out.append((n * sxy - sx * sy)
                       / (math.sqrt(float(vx)) * math.sqrt(float(vy))))
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "corr": pa.array(out, pa.float64())})


def grouped_linreg(ds, group_col: str, x_col: str, y_col: str,
                   x_scale: float = 1.0, y_scale: float = 1.0):
    """EXACT per-group ordinary-least-squares line (SQL
    regr_slope/regr_intercept) from the same integer moments as
    :func:`grouped_corr`: ``slope = (n*Sxy - Sx*Sy) / (n*Sxx -
    Sx^2)``; ``intercept = (Sy - slope*Sx) / n`` — each evaluated in
    float64 from exact integers with the conversion points stated in
    the oracle SQL, so results are bit-equal.  Zero x-variance
    groups return null slope/intercept.

    Returns pa.table(group_col string, slope float64, intercept
    float64) sorted by group."""
    acc = _grouped_int_moments(ds, group_col, x_col, y_col,
                               x_scale, y_scale)
    groups = sorted(acc)
    slopes, inters = [], []
    for gname in groups:
        n, sx, sy, sxx, _syy, sxy = acc[gname]
        vx = n * sxx - sx * sx
        if vx <= 0:
            slopes.append(None)
            inters.append(None)
        else:
            slope = (n * sxy - sx * sy) / float(vx)
            slopes.append(slope)
            inters.append((float(sy) - slope * float(sx)) / float(n))
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "slope": pa.array(slopes, pa.float64()),
                     "intercept": pa.array(inters, pa.float64())})


def grouped_entropy(ds, group_col: str, value_col: str,
                    num_shards: int | None = None):
    """EXACT Shannon entropy of each group's value distribution — the
    corpus-diversity audit (a source whose documents are all one
    language scores 0; a uniform mix scores ln(k)).

    Integer micro-nat discipline (the repo-wide float rule): each
    (group, value) term is quantized INDEPENDENTLY as
    ``round((c/n) * ln(n/c) * 1e6)`` — the same left-associative
    double expression the SQL oracle writes, so terms agree
    bit-for-bit away from half-ulp boundaries — and the per-group sum
    is then EXACT int64 arithmetic, immune to accumulation order.

    Scale shape: per-batch (group, value) count partials (the
    combiner — the exchange carries distinct pairs per batch, never
    rows), ONE bounded group-hash shard groupby co-locating each
    group whole, per-shard vectorized term evaluation.  Null groups
    and values are dropped (SQL aggregate semantics).

    -> Dataset(group_col string, ndv int64, entropy_micronat int64).
    """
    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "g": pc.cast(t[group_col], pa.string()),
            "v": pc.cast(t[value_col], pa.string())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "gshard": pa.array([], pa.int64())})
        agg = g.group_by(["g", "v"]).aggregate([([], "count_all")])
        agg = agg.select(["g", "v", "count_all"]) \
            .rename_columns(["g", "v", "c"])
        shard = _key_shards(agg["g"].to_numpy(zero_copy_only=False),
                            num_shards, 67)
        return agg.append_column("gshard", pa.array(shard, pa.int64()))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g" not in t.column_names:
            return pa.table({group_col: pa.array([], pa.string()),
                             "ndv": pa.array([], pa.int64()),
                             "entropy_micronat": pa.array([],
                                                          pa.int64())})
        m = t.group_by(["g", "v"]).aggregate([("c", "sum")])
        m = m.sort_by([("g", "ascending"), ("v", "ascending")])
        groups = m["g"].to_numpy(zero_copy_only=False)
        c = m["c_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        starts, sizes = _group_starts(groups)
        n = np.repeat(np.add.reduceat(c, starts), sizes)
        # the oracle's exact expression, term-quantized then int-summed
        term = c / n * np.log(n / c) * 1000000.0
        q = np.copysign(np.floor(np.abs(term) + 0.5),
                        term).astype(np.int64)
        ent = np.add.reduceat(q, starts).astype(np.int64)
        return pa.table({
            group_col: pa.array(groups[starts], pa.string()),
            "ndv": pa.array(sizes.astype(np.int64), pa.int64()),
            "entropy_micronat": pa.array(ent, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard") \
        .map_groups(lambda t: finish(t.drop_columns(["gshard"])),
                    batch_format="pyarrow")


def grouped_weighted_avg(ds, group_col: str, w_col: str, x_col: str,
                         w_scale: float = 1.0, x_scale: float = 1.0):
    """EXACT per-group weighted average ``sum(w*x) / sum(w)`` over
    :func:`_grouped_int_moments` (w as the x-moment, x as the
    y-moment): one float64 division of exact arbitrary-precision
    integers — bit-equal to the HUGEINT SQL expression.  Groups with
    zero total weight return null.

    Returns pa.table(group_col string, wavg float64) sorted by
    group."""
    acc = _grouped_int_moments(ds, group_col, w_col, x_col,
                               w_scale, x_scale)
    groups = sorted(acc)
    out = []
    for gname in groups:
        _n, sw, _sx, _sww, _sxx, swx = acc[gname]
        out.append(None if sw == 0 else float(swx) / float(sw))
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "wavg": pa.array(out, pa.float64())})


def grouped_stddev(ds, group_col: str, x_col: str,
                   x_scale: float = 1.0):
    """EXACT per-group standard deviation (sample and population)
    from the shared integer moments: ``var_samp = (n*Sxx - Sx^2) /
    (n*(n-1))``, ``var_pop = (n*Sxx - Sx^2) / n^2`` — each one
    division of exact arbitrary-precision integers then one sqrt,
    bit-equal to the HUGEINT SQL expression (never the engine's
    streaming-float stddev, whose accumulation order is
    unreproducible).  n < 2 yields null stddev_samp; n < 1 cannot
    occur (empty groups don't exist).

    Returns pa.table(group_col string, stddev_samp float64,
    stddev_pop float64) sorted by group."""
    import math

    acc = _grouped_int_moments(ds, group_col, x_col, x_col,
                               x_scale, x_scale)
    groups = sorted(acc)
    samp, pop = [], []
    for gname in groups:
        n, sx, _sy, sxx, _syy, _sxy = acc[gname]
        vnum = n * sxx - sx * sx
        pop.append(math.sqrt(float(vnum) / float(n * n)))
        samp.append(None if n < 2
                    else math.sqrt(float(vnum) / float(n * (n - 1))))
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "stddev_samp": pa.array(samp, pa.float64()),
                     "stddev_pop": pa.array(pop, pa.float64())})


def grouped_skew_kurt(ds, group_col: str, x_col: str,
                      x_scale: float = 1.0):
    """EXACT per-group skewness and excess kurtosis from integer
    POWER sums (n, S1..S4): the central-moment numerators

        A2 = n*S2 - S1^2
        A3 = n^2*S3 - 3*n*S1*S2 + 2*S1^3
        A4 = n^3*S4 - 4*n^2*S1*S3 + 6*n*S1^2*S2 - 3*S1^4

    are exact arbitrary-precision integers (python-int merge, HUGEINT
    in the oracle), and the population statistics reduce to pure
    integer ratios — ``g1 = A3 / A2^1.5`` and ``g2 = A4 / A2^2 - 3``
    (the n powers cancel) — so both engines evaluate the identical
    float64 expression from identical integers.  Zero-variance groups
    return null (SQL semantics).

    Per-batch combiner magnitude contract: ``batch_rows * max|x*scale|^4
    < 2^63`` (e.g. quantities <= 50 are safe past 10^12-row batches);
    wider domains must quantize coarser.  The exchange is one 6-int
    row per (group, batch) — shuffle-free, like every moments
    aggregate here.

    Returns pa.table(group_col string, skewness float64,
    kurtosis_excess float64) sorted by group."""
    import math

    def _round_half_away(a: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(a) + 0.5), a)

    cols = ("g", "n", "s1", "s2", "s3", "s4")

    def partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        ok = pc.and_(pc.is_valid(g), pc.is_valid(t[x_col]))
        t = pa.table({"g": g, "x": t[x_col]}).filter(ok)
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.string() if c == "g"
                                         else pa.int64())
                             for c in cols})
        x = _round_half_away(t["x"].to_numpy(zero_copy_only=False)
                             .astype(np.float64) * x_scale) \
            .astype(np.int64)
        gv = t["g"].to_numpy(zero_copy_only=False)
        order = np.argsort(gv, kind="stable")
        gs, xs = gv[order], x[order]
        starts, sizes = _group_starts(gs)

        def seg(v):
            return np.add.reduceat(v, starts).astype(np.int64)

        x2 = xs * xs
        return pa.table({
            "g": pa.array(gs[starts], pa.string()),
            "n": pa.array(sizes.astype(np.int64), pa.int64()),
            "s1": pa.array(seg(xs), pa.int64()),
            "s2": pa.array(seg(x2), pa.int64()),
            "s3": pa.array(seg(x2 * xs), pa.int64()),
            "s4": pa.array(seg(x2 * x2), pa.int64())})

    acc: dict[str, list[int]] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        gs = b["g"].to_pylist()
        vals = [b[c].to_pylist() for c in cols[1:]]
        for i, gname in enumerate(gs):
            a = acc.setdefault(gname, [0, 0, 0, 0, 0])
            for j in range(5):
                a[j] += vals[j][i]     # python ints: no overflow
    groups = sorted(acc)
    skews, kurts = [], []
    for gname in groups:
        n, s1, s2, s3, s4 = acc[gname]
        a2 = n * s2 - s1 * s1
        if a2 <= 0:
            skews.append(None)
            kurts.append(None)
            continue
        a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        a4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        skews.append(float(a3)
                     / (float(a2) * math.sqrt(float(a2))))
        kurts.append(float(a4) / (float(a2) * float(a2)) - 3.0)
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "skewness": pa.array(skews, pa.float64()),
                     "kurtosis_excess": pa.array(kurts, pa.float64())})


def spearman_corr(ds, x_col: str, y_col: str) -> pa.Table:
    """EXACT global Spearman rank correlation of two BOUNDED-
    cardinality numeric columns (the rank transform + Pearson
    composition): per batch a vectorized combiner emits distinct
    (x, y) pair counts — the exchange carries the joint histogram,
    never rows — and the driver folds the histograms with python-int
    sums, derives each distinct value's DOUBLED average rank
    ``r2 = 2*(count of smaller) + (count of equal) + 1`` (an integer:
    no tie-rank floats), and evaluates Pearson over ranks from exact
    integer moments with the same float64 expression the HUGEINT SQL
    oracle states — ``2*rank() OVER (ORDER BY v) + count(*) OVER
    (PARTITION BY v) - 1`` is the identical doubled rank.

    Bounded-cardinality contract: the driver holds O(distinct pairs)
    counts; quantize unbounded columns first (like every bounded-
    domain exact operator here).  Nulls in either column are dropped
    (SQL corr semantics); degenerate (constant) columns return null.

    Returns pa.table(spearman float64), one row."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        t = pa.table({"x": pc.cast(t[x_col], pa.float64()),
                      "y": pc.cast(t[y_col], pa.float64())}).filter(ok)
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        g = t.group_by(["x", "y"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"x": g["x"], "y": g["y"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    joint: dict[tuple[float, float], int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for x, y, c in zip(b["x"].to_pylist(), b["y"].to_pylist(),
                           b["c"].to_pylist()):
            joint[(x, y)] = joint.get((x, y), 0) + c
    if not joint:
        return pa.table({"spearman": pa.array([None], pa.float64())})

    def _ranks2(axis: int) -> dict[float, int]:
        marg: dict[float, int] = {}
        for k, c in joint.items():
            marg[k[axis]] = marg.get(k[axis], 0) + c
        r2, below = {}, 0
        for v in sorted(marg):
            r2[v] = 2 * below + marg[v] + 1
            below += marg[v]
        return r2

    r2x, r2y = _ranks2(0), _ranks2(1)
    n = sx = sy = sxx = syy = sxy = 0
    for (x, y), c in joint.items():
        rx, ry = r2x[x], r2y[y]
        n += c
        sx += c * rx
        sy += c * ry
        sxx += c * rx * rx
        syy += c * ry * ry
        sxy += c * rx * ry
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return pa.table({"spearman": pa.array([None], pa.float64())})
    val = (n * sxy - sx * sy) \
        / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    return pa.table({"spearman": pa.array([val], pa.float64())})


def grouped_value_quantiles_cont(ds, group_col: str, value_col: str,
                                 quantiles: tuple[float, ...] = (0.5,),
                                 n_buckets: int = 1024):
    """EXACT per-group interpolated quantiles (SQL ``quantile_cont``
    ... GROUP BY) of an UNBOUNDED numeric column — the grouped
    complement of :func:`exact_value_quantiles_cont` and the
    any-domain complement of :func:`grouped_exact_quantiles` (which
    needs bounded integer domains).  Never a global sort.

    Three streaming scans over the materialize()d input (group
    cardinality moderate by the grouped-stats contract — the driver
    holds O(groups x n_buckets) counts, never rows):

    1. per-group (min, max, count) via per-batch combiners;
    2. per-group fixed-grid histograms: per batch one lexsort over
       ``group_index * n_buckets + bucket`` composite keys ->
       (cnt, bmin, bmax) partials, merged by a BOUNDED groupby on the
       composite key; the driver locates each group's target ranks in
       its own cumulative counts, resolving single-valued buckets
       immediately (heavy-tie fast path);
    3. only unresolved (group, bucket) cells' raw values are
       collected and locally sorted (expected n_g/n_buckets values
       each; the single-bucket-pileup skew bound of the global
       selection applies per group).

    Interpolation at ``r = q*(n_g - 1)`` with DuckDB's own formula —
    bit-equal away from half-ulp boundaries.  Null groups/values are
    dropped (SQL aggregate semantics).

    Returns pa.table(group_col string, q_<q> float64 columns) sorted
    by group."""
    import math

    qs = list(quantiles)
    ds = ds.materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"g": pc.cast(t[group_col], pa.string()),
                      "v": pc.cast(t[value_col], pa.float64())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        g = g.filter(pc.invert(pc.is_nan(g["v"])))
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        agg = g.group_by("g").aggregate(
            [("v", "min"), ("v", "max"), ("v", "count")])
        return agg.select(["g", "v_min", "v_max", "v_count"]) \
            .rename_columns(["g", "lo", "hi", "n"])

    parts = [b for b in ds.map_batches(stats_partial,
                                       batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return pa.table({group_col: pa.array([], pa.string()),
                         **{f"q_{q}": pa.array([], pa.float64())
                            for q in qs}})
    mm = pa.concat_tables(parts)
    agg = mm.group_by("g").aggregate(
        [("lo", "min"), ("hi", "max"), ("n", "sum")]).sort_by("g")
    gnames = agg["g"].to_pylist()
    glo = agg["lo_min"].to_numpy(zero_copy_only=False)
    ghi = agg["hi_max"].to_numpy(zero_copy_only=False)
    gn = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    gwidth = np.where(ghi > glo, (ghi - glo) / n_buckets, 1.0)
    names_arr = np.array(gnames, object)

    def _cells(t: pa.Table):
        """(gi, values) -> composite cell keys per row, or None."""
        g = pa.table({"g": pc.cast(t[group_col], pa.string()),
                      "v": pc.cast(t[value_col], pa.float64())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        g = g.filter(pc.invert(pc.is_nan(g["v"])))
        if g.num_rows == 0:
            return None
        gv = g["g"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        gi = np.searchsorted(names_arr, gv)
        b = np.clip(((v - glo[gi]) / gwidth[gi]).astype(np.int64),
                    0, n_buckets - 1)
        return gi * n_buckets + b, v

    def hist_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "bmin": pa.array([], pa.float64()),
                          "bmax": pa.array([], pa.float64())})
        cells = _cells(t)
        if cells is None:
            return empty
        k, v = cells
        order = np.argsort(k, kind="stable")
        sk, sv = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        sizes = np.diff(np.r_[starts, len(sk)])
        return pa.table({
            "cell": pa.array(sk[starts], pa.int64()),
            "cnt": pa.array(sizes.astype(np.int64), pa.int64()),
            "bmin": pa.array(np.minimum.reduceat(sv, starts),
                             pa.float64()),
            "bmax": pa.array(np.maximum.reduceat(sv, starts),
                             pa.float64())})

    def hist_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["cell"]).aggregate(
            [("cnt", "sum"), ("bmin", "min"), ("bmax", "max")])
        return g.select(["cell", "cnt_sum", "bmin_min", "bmax_max"]) \
            .rename_columns(["cell", "cnt", "bmin", "bmax"])

    hist = pa.concat_tables(
        [b for b in ds.map_batches(hist_partial, batch_format="pyarrow")
         .groupby("cell").map_groups(hist_merge,
                                     batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows]).sort_by("cell")
    cells = hist["cell"].to_numpy()
    cnts = hist["cnt"].to_numpy()
    bmins = hist["bmin"].to_numpy()
    bmaxs = hist["bmax"].to_numpy()

    # per group: locate each wanted 0-based rank in its own cells
    resolved: dict[tuple[int, int], float] = {}
    need: dict[int, list[tuple[int, int, int]]] = {}
    ranks_per_group: dict[int, list[int]] = {}
    for gi in range(len(gnames)):
        n = int(gn[gi])
        wanted = set()
        for q in qs:
            r = q * (n - 1)
            wanted.add(int(math.floor(r)))
            wanted.add(int(math.ceil(r)))
        ranks_per_group[gi] = sorted(wanted)
        sel = (cells // n_buckets) == gi
        gc = cells[sel]
        gcnt = cnts[sel]
        gmin = bmins[sel]
        gmax = bmaxs[sel]
        cum = np.cumsum(gcnt)
        for k in ranks_per_group[gi]:
            j = int(np.searchsorted(cum, k, side="right"))
            offset = int(k - (cum[j - 1] if j else 0))
            if gmin[j] == gmax[j]:
                resolved[(gi, k)] = float(gmin[j])
            else:
                need.setdefault(int(gc[j]), []).append((gi, k, offset))

    if need:
        wanted_cells = np.array(sorted(need), np.int64)

        def collect(t: pa.Table) -> pa.Table:
            cells2 = _cells(t)
            if cells2 is None:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "value": pa.array([], pa.float64())})
            k, v = cells2
            pos = np.searchsorted(wanted_cells, k)
            pos = np.clip(pos, 0, len(wanted_cells) - 1)
            mask = wanted_cells[pos] == k
            return pa.table({"cell": pa.array(k[mask], pa.int64()),
                             "value": pa.array(v[mask], pa.float64())})

        got = pa.concat_tables(
            [b for b in ds.map_batches(collect, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows])
        gb = got["cell"].to_numpy()
        gvv = got["value"].to_numpy()
        for cell, targets in need.items():
            vals = np.sort(gvv[gb == cell])
            for gi, k, offset in targets:
                resolved[(gi, k)] = float(vals[offset])

    out: dict = {group_col: pa.array(gnames, pa.string())}
    for q in qs:
        col = []
        for gi in range(len(gnames)):
            n = int(gn[gi])
            r = q * (n - 1)
            k0, k1 = int(math.floor(r)), int(math.ceil(r))
            v0, v1 = resolved[(gi, k0)], resolved[(gi, k1)]
            col.append(v0 + (r - k0) * (v1 - v0))
        out[f"q_{q}"] = pa.array(col, pa.float64())
    return pa.table(out)


def grouped_covar(ds, group_col: str, x_col: str, y_col: str,
                  x_scale: float = 1.0, y_scale: float = 1.0):
    """EXACT per-group covariance (sample and population) from the
    shared integer moments: ``covar_samp = (n*Sxy - Sx*Sy) /
    (n*(n-1))``, ``covar_pop = (n*Sxy - Sx*Sy) / n^2`` — one division
    of exact arbitrary-precision integers each, bit-equal to the
    HUGEINT SQL expression.  n < 2 yields null covar_samp.

    Returns pa.table(group_col string, covar_samp float64, covar_pop
    float64) sorted by group."""
    acc = _grouped_int_moments(ds, group_col, x_col, y_col,
                               x_scale, y_scale)
    groups = sorted(acc)
    samp, pop = [], []
    for gname in groups:
        n, sx, sy, _sxx, _syy, sxy = acc[gname]
        num = n * sxy - sx * sy
        pop.append(float(num) / float(n * n))
        samp.append(None if n < 2 else float(num) / float(n * (n - 1)))
    return pa.table({group_col: pa.array(groups, pa.string()),
                     "covar_samp": pa.array(samp, pa.float64()),
                     "covar_pop": pa.array(pop, pa.float64())})


def filter_above_group_avg(ds, group_col: str, cents_col: str,
                           num: int = 3, den: int = 2,
                           num_shards: int | None = None):
    """Correlated-subquery filter: rows whose ``cents_col`` exceeds
    ``num/den`` x their group's average — SQL's
    ``x > factor * (SELECT avg(x) ... WHERE key = outer.key)`` shape —
    WITHOUT a join: one bounded key-hash shard exchange co-locates
    each group, the per-group (sum, count) is computed inside the
    shard task, and the comparison is integer cross-multiplied
    (``den * x * n > num * sum``), so the result is exact and
    bit-equal to the SQL window oracle (no float average, no drift;
    int64 columns are widened through Python ints only inside the
    numpy object path when they could overflow — here den*x*n and
    num*sum stay < 2^63 for cents x row counts < 2^40).

    Unlike the broadcast aggregate of the Q17 shape (small dim side),
    the per-group aggregate here is GROUP-CARDINALITY-sized (one per
    distinct key), so broadcasting it cannot scale; the shard
    exchange is the 100 TB plan.  Null keys form their own SQL
    window partition and are kept under the same rule; null values
    never qualify.  Returns the input rows (all columns) that pass.
    """
    nb = num_shards or _default_shards()
    dschema = ds.schema()
    if dschema is None:  # schema-less all-empty input: nothing passes
        return ds
    schema = pa.schema(dschema.base_schema)

    def shard(t: pa.Table) -> pa.Table:
        keys = t[group_col]
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        sh = np.zeros(t.num_rows, np.int64)
        if valid.any():
            vk = pc.drop_null(keys).to_numpy(zero_copy_only=False)
            sh[valid] = _key_shards(vk, nb, 61)
        return t.append_column("kshard", pa.array(sh, pa.int64()))

    def resolve(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["kshard"])
        vals = pc.cast(t[cents_col], pa.int64())
        # sum/count skip nulls (Arrow default) — SQL AVG semantics
        g = pa.table({"k": t[group_col], "v": vals}) \
            .group_by(["k"], use_threads=False) \
            .aggregate([("v", "sum"), ("v", "count")])
        # group keys may include null (its own SQL window partition):
        # align rows to groups positionally via one dictionary encode
        # over the concatenated key arrays (cast to string + null
        # sentinel — dictionary_encode gives nulls a NULL index, so
        # raw nulls could never align), not searchsorted
        def _enc(col):
            out = pc.fill_null(pc.cast(col, pa.string()), "\x00NULL")
            return out.combine_chunks() \
                if isinstance(out, pa.ChunkedArray) else out
        comb = pa.chunked_array([_enc(t[group_col]), _enc(g["k"])]) \
            .dictionary_encode().combine_chunks()
        codes = comb.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_codes, g_codes = codes[:t.num_rows], codes[t.num_rows:]
        sums = np.zeros(len(g_codes) and int(g_codes.max()) + 1 or 1,
                        np.int64)
        cnts = np.zeros_like(sums)
        sums[g_codes] = pc.fill_null(g["v_sum"], 0) \
            .to_numpy(zero_copy_only=False)
        cnts[g_codes] = g["v_count"].to_numpy(zero_copy_only=False)
        ok = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        x = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        keep = (den * x * cnts[row_codes] > num * sums[row_codes]) & ok
        return t.filter(pa.array(keep)).cast(schema)

    return ds.map_batches(shard, batch_format="pyarrow") \
        .groupby("kshard").map_groups(resolve, batch_format="pyarrow")


def cohort_retention(ds, key_col: str = "user_id", ts_col: str = "ts",
                     unit: str = "month",
                     num_shards: int | None = None):
    """Cohort retention matrix (the classic product-analytics shape):
    each key's COHORT is the calendar period (``unit``: "month",
    "week", or "day" — Arrow ``floor_temporal``, Monday-start weeks,
    matching SQL ``date_trunc``) of its first event; for every
    (cohort_month, activity_month) pair the output is the EXACT
    distinct-key count of cohort members active in that period.

    Dataflow — the :func:`grouped_ndv` shape specialised to a derived
    group: per batch an Arrow group_by dedups (key, month) pairs (the
    combiner — the exchange never carries more than one row per key
    per month), ONE bounded key-hash exchange co-shards every month of
    a key, per shard a second dedup + run-boundary scan stamps each
    key's min month onto its pairs (no join back — the cohort is
    derived in place), and in-shard (cohort, month) partial counts
    reduce through a final tiny multi-key groupby (months² rows
    total).  A key's rows live in exactly one shard, so cross-shard
    double counting is impossible.  Null keys/timestamps are dropped
    (SQL semantics).

    -> Dataset(cohort_month timestamp[us], activity_month
    timestamp[us], n_users int64), n_users >= 1 rows only.
    """
    import ray.data.aggregate as A

    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([key_col, ts_col])
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        month = pc.floor_temporal(pc.cast(t[ts_col], pa.timestamp("us")),
                                  unit=unit)
        g = pa.table({key_col: t[key_col], "month": month}) \
            .group_by([key_col, "month"]).aggregate([])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        return g.append_column(
            "kshard", pa.array(_key_shards(keys, num_shards, 71),
                               pa.int64()))

    def shard(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort_month": pa.array([], pa.timestamp("us")),
            "activity_month": pa.array([], pa.timestamp("us")),
            "n_users": pa.array([], pa.int64())})
        g = t.select([key_col, "month"]) \
            .group_by([key_col, "month"]).aggregate([]) \
            .sort_by([(key_col, "ascending"), ("month", "ascending")])
        if g.num_rows == 0:
            return empty
        keys = g[key_col].to_numpy(zero_copy_only=False)
        m_us = pc.cast(g["month"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(keys)
        cohort = np.repeat(m_us[starts], sizes)
        pairs = pa.table({"c": pa.array(cohort, pa.int64()),
                          "m": pa.array(m_us, pa.int64())})
        cnt = pairs.group_by(["c", "m"]).aggregate([("c", "count")])
        return pa.table({
            "cohort_month": pc.cast(cnt["c"], pa.timestamp("us")),
            "activity_month": pc.cast(cnt["m"], pa.timestamp("us")),
            "n_users": pc.cast(cnt["c_count"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard").map_groups(shard, batch_format="pyarrow")
    out = partials.groupby(["cohort_month", "activity_month"]) \
        .aggregate(A.Sum("n_users"))
    return out.map_batches(
        lambda t: t.rename_columns(["cohort_month", "activity_month",
                                    "n_users"]),
        batch_format="pyarrow")


def period_totals_delta(ds, ts_col: str, cents_col: str,
                        unit: str = "month"):
    """Period-over-period totals: truncate ``ts_col`` to ``unit``
    (month/week/day/...), sum an exact integer measure per period, and
    attach the LAG delta vs the previous EXISTING period (NULL on the
    first row) — the revenue-trend / MoM-change dashboard query.

    Physical shape: per-batch (period -> cents) combiner so the
    exchange carries at most periods x blocks rows, a tiny
    ``groupby(period).Sum``, then the few-row window delta in one
    final task (`repartition(1)` on the aggregate only — periods
    number in the dozens even at 100 TB).

    -> Dataset(period timestamp, total_cents int64,
               delta_cents int64 nullable).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[ts_col]))
        period = pc.floor_temporal(
            pc.cast(t[ts_col], pa.timestamp("us")), unit=unit)
        g = pa.table({"period": period, "c": t[cents_col]}) \
            .group_by("period").aggregate([("c", "sum")])
        return pa.table({"period": g["period"],
                         "c": pc.cast(g["c_sum"], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("period").aggregate(Sum("c"))

    def window(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "period": pa.array([], pa.timestamp("us")),
                "total_cents": pa.array([], pa.int64()),
                "delta_cents": pa.array([], pa.int64())})
        t = t.sort_by([("period", "ascending")])
        tot = pc.cast(t["sum(c)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        delta = np.zeros(len(tot), np.int64)
        delta[1:] = tot[1:] - tot[:-1]
        mask = np.zeros(len(tot), bool)
        mask[0] = True
        return pa.table({
            "period": pc.cast(t["period"], pa.timestamp("us")),
            "total_cents": pa.array(tot, pa.int64()),
            "delta_cents": pa.array(
                np.ma.masked_array(delta, mask), pa.int64(),
                from_pandas=True)})

    return agg.repartition(1).map_batches(window, batch_format="pyarrow")


def grouped_iqr_outlier_counts(ds, group_col: str, value_col: str,
                               k: float = 1.5):
    """Tukey-fence outlier counts per group: values outside
    ``[q1 - k*(q3-q1), q3 + k*(q3-q1)]`` where q1/q3 are the EXACT
    per-group interpolated quartiles (quantile_cont) — the standard
    boxplot / data-quality outlier rule.

    Two streaming passes: the grouped 3-scan quantile selection
    (:func:`grouped_value_quantiles_cont`, driver holds only
    O(groups) fences), then one counting scan with per-batch
    combiners.  Fences are computed with the same float expression
    the SQL oracle uses (``q1 - k*(q3-q1)``), so comparisons are
    bit-identical.

    Returns pa.table(group_col string, n int64, n_outliers int64)
    sorted by group."""
    from ray.data.aggregate import Sum

    qt = grouped_value_quantiles_cont(ds, group_col, value_col,
                                      quantiles=(0.25, 0.75))
    names = np.asarray(qt[group_col].to_pylist(), dtype=object)
    q1 = qt["q_0.25"].to_numpy(zero_copy_only=False)
    q3 = qt["q_0.75"].to_numpy(zero_copy_only=False)
    lo = q1 - k * (q3 - q1)
    hi = q3 + k * (q3 - q1)
    order = np.argsort(names)
    names_sorted = names[order]
    lo_sorted, hi_sorted = lo[order], hi[order]

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"g": pc.cast(t[group_col], pa.string()),
                      "v": pc.cast(t[value_col], pa.float64())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        g = g.filter(pc.invert(pc.is_nan(g["v"])))
        empty = pa.table({"g": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "n_outliers": pa.array([], pa.int64())})
        if g.num_rows == 0 or len(names_sorted) == 0:
            return empty
        gv = np.asarray(g["g"].to_pylist(), dtype=object)
        v = g["v"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(names_sorted, gv)
        idx = np.clip(idx, 0, len(names_sorted) - 1)
        found = names_sorted[idx] == gv
        if not found.any():
            return empty
        gv, v, idx = gv[found], v[found], idx[found]
        out = (v < lo_sorted[idx]) | (v > hi_sorted[idx])
        c = pa.table({"g": pa.array(gv, pa.string()),
                      "one": pa.array(np.ones(len(v), np.int64)),
                      "o": pa.array(out.astype(np.int64), pa.int64())}) \
            .group_by("g").aggregate([("one", "sum"), ("o", "sum")])
        return pa.table({"g": c["g"],
                         "n": pc.cast(c["one_sum"], pa.int64()),
                         "n_outliers": pc.cast(c["o_sum"], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("n"), Sum("n_outliers"))
    rows = [b for b in agg.iter_batches(batch_format="pyarrow",
                                        batch_size=None) if b.num_rows]
    if not rows:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "n_outliers": pa.array([], pa.int64())})
    t = pa.concat_tables(rows).sort_by([("g", "ascending")])
    return pa.table({group_col: t["g"],
                     "n": pc.cast(t["sum(n)"], pa.int64()),
                     "n_outliers": pc.cast(t["sum(n_outliers)"],
                                           pa.int64())})


def audience_overlap(ds, key_col: str = "user_id",
                     cat_col: str = "event_type",
                     num_shards: int | None = None):
    """Pairwise audience overlap between categories: for every
    unordered category pair (a, b), how many distinct keys appear in
    BOTH, in EITHER, and the Jaccard |A∩B| / |A∪B| — the
    segment-overlap matrix behind campaign planning and taxonomy
    dedup.

    Contract: the category domain is SMALL (tens, e.g. event types);
    keys are unbounded.  Physical shape: per-batch (key, cat) dedup
    combiner, ONE key-hash exchange, a per-shard scan that collapses
    each key to its sorted category-combination string, and a tiny
    combo groupby (<= 2^k rows total).  The driver expands combo
    counts into pairwise intersections — never sees keys.

    Returns pa.table(cat_a, cat_b, n_a, n_b, n_both, n_union int64,
    jaccard float64) sorted by (cat_a, cat_b), one row per unordered
    pair of categories that share at least one key... including pairs
    with zero overlap (both categories non-empty).
    """
    from ray.data.aggregate import Sum

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[cat_col])))
        slim = pa.table({"k": t[key_col],
                         "c": pc.cast(t[cat_col], pa.string())})
        slim = slim.group_by(["k", "c"]).aggregate([])
        keys = slim["k"].to_numpy(zero_copy_only=False)
        return slim.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 97), pa.int64()))

    def combos(t: pa.Table) -> pa.Table:
        empty = pa.table({"combo": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[("k", "ascending"),
                                            ("c", "ascending")])
        t = t.take(idx)
        keys = t["k"].to_numpy(zero_copy_only=False)
        cats = np.asarray(t["c"].to_pylist(), dtype=object)
        n = len(keys)
        keep = np.ones(n, bool)      # cross-batch (key, cat) dedup
        keep[1:] = (keys[1:] != keys[:-1]) | (cats[1:] != cats[:-1])
        keys, cats = keys[keep], cats[keep]
        starts, _sizes = _group_starts(keys)
        combo = np.add.reduceat(cats + "\x1f", starts)
        u, cnt = np.unique(combo.astype("U"), return_counts=True)
        return pa.table({"combo": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(combos, batch_format="pyarrow") \
        .groupby("combo").aggregate(Sum("n"))

    rows = [b for b in agg.iter_batches(batch_format="pyarrow",
                                        batch_size=None) if b.num_rows]
    out_schema = pa.schema([
        ("cat_a", pa.string()), ("cat_b", pa.string()),
        ("n_a", pa.int64()), ("n_b", pa.int64()),
        ("n_both", pa.int64()), ("n_union", pa.int64()),
        ("jaccard", pa.float64())])
    if not rows:
        return out_schema.empty_table()
    t = pa.concat_tables(rows)
    singles: dict = {}
    both: dict = {}
    for combo, cnt in zip(t["combo"].to_pylist(),
                          t["sum(n)"].to_pylist()):
        cs = [c for c in combo.split("\x1f") if c]
        for c in cs:
            singles[c] = singles.get(c, 0) + cnt
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                p = (cs[i], cs[j])
                both[p] = both.get(p, 0) + cnt
    cats = sorted(singles)
    ca, cb, na, nbb, nboth, nun, jac = [], [], [], [], [], [], []
    for i in range(len(cats)):
        for j in range(i + 1, len(cats)):
            a, b = cats[i], cats[j]
            nb_ = both.get((a, b), 0)
            un = singles[a] + singles[b] - nb_
            ca.append(a)
            cb.append(b)
            na.append(singles[a])
            nbb.append(singles[b])
            nboth.append(nb_)
            nun.append(un)
            jac.append(nb_ / un if un else 0.0)
    return pa.table({"cat_a": pa.array(ca, pa.string()),
                     "cat_b": pa.array(cb, pa.string()),
                     "n_a": pa.array(na, pa.int64()),
                     "n_b": pa.array(nbb, pa.int64()),
                     "n_both": pa.array(nboth, pa.int64()),
                     "n_union": pa.array(nun, pa.int64()),
                     "jaccard": pa.array(jac, pa.float64())})


def grouped_quantiles_tdigest(ds, group_col: str, value_col: str,
                              qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                              compression: int = 200):
    """Per-group APPROXIMATE quantiles in ONE streaming scan — the
    sketch-path complement of :func:`grouped_value_quantiles_cont`
    (exact, but 3 scans over a materialized input).  Each batch folds
    its rows into one t-digest per group present in the batch (a
    short loop over the batch's distinct groups, not rows); the
    exchange carries (group, ~2*compression-centroid blob) rows —
    O(groups x blocks), never values — and one bounded groupby merges
    digests and reads the quantiles.

    Rank error is the t-digest k1 bound (tight at the tails); no SQL
    oracle — parity is the pytest rank-error bound against numpy.

    -> Dataset(group_col string, q_<q> float64 ...).
    """
    from ..sketches import TDigest

    qlist = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"g": pc.cast(t[group_col], pa.string()),
                      "v": pc.cast(t[value_col], pa.float64())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]), pc.is_valid(g["v"])))
        g = g.filter(pc.invert(pc.is_nan(g["v"])))
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "blob": pa.array([], pa.binary())})
        idx = pc.sort_indices(g, sort_keys=[("g", "ascending")])
        g = g.take(idx)
        gv = np.asarray(g["g"].to_pylist(), dtype=object)
        v = g["v"].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(gv)
        names, blobs = [], []
        for s0, sz in zip(starts, sizes):
            names.append(gv[s0])
            blobs.append(TDigest(compression)
                         .add(v[s0:s0 + sz]).to_bytes())
        return pa.table({"g": pa.array(names, pa.string()),
                         "blob": pa.array(blobs, pa.binary())})

    def finalize(t: pa.Table) -> pa.Table:
        cols = {group_col: pa.array([], pa.string())}
        for q in qlist:
            cols[f"q_{q}"] = pa.array([], pa.float64())
        if t.num_rows == 0:
            return pa.table(cols)
        merged = None
        for blob in t["blob"].to_pylist():
            td = TDigest.from_bytes(blob)
            merged = td if merged is None else merged.merge(td)
        out = {group_col: pa.array([t["g"][0].as_py()], pa.string())}
        for q in qlist:
            out[f"q_{q}"] = pa.array([merged.quantile(q)],
                                     pa.float64())
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").map_groups(finalize, batch_format="pyarrow")


def benford_digit_counts(ds, cents_col: str):
    """Leading-digit distribution of a positive integer measure — the
    Benford's-law fraud/data-entry screen.  Per-batch bincount
    combiner (9 ints per batch), one tiny digit groupby, and the
    share division in a final single task.  The leading digit is
    extracted by exact integer division (no float log10), so the SQL
    oracle's ``substr(CAST(n AS VARCHAR), 1, 1)`` matches bit-for-bit.

    -> Dataset(digit int64 1..9 (present digits only), n int64,
       share float64 = n / total).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c = np.abs(pc.drop_null(t[cents_col])
                   .to_numpy(zero_copy_only=False))
        c = c[c > 0]
        d = c.copy()
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n"))

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({"digit": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "share": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("digit", "ascending")])
        n = pc.cast(t["sum(n)"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = n > 0
        if not keep.any():
            return empty
        total = int(n.sum())
        d = t["digit"].to_numpy(zero_copy_only=False)[keep]
        n = n[keep]
        return pa.table({
            "digit": pa.array(d, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "share": pa.array(n / total, pa.float64())})

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def corr_matrix(ds, cols: list[str], scales: list[float] | None = None):
    """Pairwise Pearson correlation matrix over k numeric columns in
    ONE streaming pass — the feature-screening profile.  Each column
    is scaled then rounded to an exact integer (``round(x * scale)``,
    SQL half-away semantics); every batch emits a single row of
    integer moment partials (n, k sums, k*(k+1)/2 cross sums) and the
    driver finishes with arbitrary-precision Python ints, so there is
    NO overflow contract and the float epilogue (one cast, two sqrt,
    one division per pair) is bit-identical to the HUGEINT SQL
    oracle.  Rows with a null in ANY column are dropped (listwise).

    -> pa.table(col_a, col_b, corr float64|null) for all i < j pairs,
       sorted by (col_a, col_b).
    """
    import math

    k = len(cols)
    scales = scales or [1.0] * k
    names = []
    for i in range(k):
        names.append(f"s{i}")
    for i in range(k):
        for j in range(i, k):
            names.append(f"p{i}_{j}")

    def _round_half_away(a: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(a) + 0.5), a)

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            v = pc.is_valid(t[c])
            mask = v if mask is None else pc.and_(mask, v)
        t = t.filter(mask)
        xs = []
        for c, s in zip(cols, scales):
            v = t[c].to_numpy(zero_copy_only=False)
            xs.append(_round_half_away(v * s).astype(np.int64))
        row = {"n": pa.array([t.num_rows], pa.int64())}
        for i in range(k):
            row[f"s{i}"] = pa.array([int(xs[i].sum())], pa.int64())
        for i in range(k):
            for j in range(i, k):
                row[f"p{i}_{j}"] = pa.array(
                    [int((xs[i] * xs[j]).sum())], pa.int64())
        return pa.table(row)

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    tot: dict = {c: 0 for c in ["n"] + names}
    for b in parts:
        for c in tot:
            tot[c] += sum(b[c].to_pylist())     # python ints: exact
    n = tot["n"]
    ca, cb, cr = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            sx, sy = tot[f"s{i}"], tot[f"s{j}"]
            sxx, syy = tot[f"p{i}_{i}"], tot[f"p{j}_{j}"]
            sxy = tot[f"p{i}_{j}"]
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                val = None
            else:
                val = float(n * sxy - sx * sy) \
                    / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
            ca.append(cols[i])
            cb.append(cols[j])
            cr.append(val)
    out = pa.table({"col_a": pa.array(ca, pa.string()),
                    "col_b": pa.array(cb, pa.string()),
                    "corr": pa.array(cr, pa.float64())})
    return out.sort_by([("col_a", "ascending"), ("col_b", "ascending")])


def grouped_geomean(ds, group_col: str, cents_col: str):
    """Per-group geometric mean of a POSITIVE integer measure with the
    module's exact-integer discipline: per-value log quantized to
    int64 milli-nats (``round(1000 * ln(c))``, half away from zero)
    BEFORE summing, so the distributed sum is order-independent and
    the SQL oracle reproduces it term by term; the float epilogue is
    one division and one exp.  ``gm ~ exp(sum_milli / (1000 * n))``.
    Zero/negative/null values are dropped (documented).

    -> Dataset(group_col, n int64, sum_mlog int64, gm float64).
    ``sum_mlog`` is the exact cross-engine-comparable artifact; ``gm``
    is a convenience epilogue (numpy's and DuckDB's ``exp`` can differ
    in the last ulp, so oracle comparisons must use ``sum_mlog``).
    """
    from ray.data.aggregate import Sum

    def _round_half_away(a: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(a) + 0.5), a)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"g": pc.cast(t[group_col], pa.string()),
                      "c": pc.cast(t[cents_col], pa.int64())})
        g = g.filter(pc.and_(pc.is_valid(g["g"]),
                             pc.and_(pc.is_valid(g["c"]),
                                     pc.greater(g["c"], 0))))
        empty = pa.table({"g": pa.array([], pa.string()),
                          "m": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        c = g["c"].to_numpy(zero_copy_only=False)
        m = _round_half_away(np.log(c) * 1000.0).astype(np.int64)
        agg = pa.table({"g": g["g"], "m": pa.array(m, pa.int64()),
                        "one": pa.array(np.ones(len(c), np.int64))}) \
            .group_by("g").aggregate([("m", "sum"), ("one", "sum")])
        return pa.table({"g": agg["g"],
                         "m": pc.cast(agg["m_sum"], pa.int64()),
                         "n": pc.cast(agg["one_sum"], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("m"), Sum("n"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sum_mlog": pa.array([], pa.int64()),
                             "gm": pa.array([], pa.float64())})
        s = pc.cast(t["sum(m)"], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n = pc.cast(t["sum(n)"], pa.int64()).to_numpy(
            zero_copy_only=False)
        gm = np.exp(s / (1000.0 * n))
        return pa.table({group_col: t["g"],
                         "n": pa.array(n, pa.int64()),
                         "sum_mlog": pc.cast(t["sum(m)"], pa.int64()),
                         "gm": pa.array(gm, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _skyline_2d(m: np.ndarray, mx: np.ndarray):
    """Skyline of 2-D points (minimize ``m``, maximize ``mx``):
    distinct points where no other point has m <= AND mx >= with one
    strict.  Vectorized: m-asc/mx-desc lexsort, per-m max, then keep
    where mx strictly exceeds the running max of strictly-cheaper
    points.  Returns (m_sky, mx_sky), BOTH strictly ascending — each
    surviving point must strictly out-``mx`` every cheaper survivor,
    or the cheaper one would dominate it."""
    order = np.lexsort((-mx, m))
    m_s, mx_s = m[order], mx[order]
    first = np.ones(len(m_s), bool)
    first[1:] = m_s[1:] != m_s[:-1]
    m_u, mx_u = m_s[first], mx_s[first]
    if len(m_u) == 0:
        return m_u, mx_u
    runmax = np.maximum.accumulate(mx_u)
    keep = np.ones(len(m_u), bool)
    keep[1:] = mx_u[1:] > runmax[:-1]
    return m_u[keep], mx_u[keep]


def pareto_frontier(ds, min_col: str, max_col: str):
    """Rows on the 2-D Pareto frontier (``min_col`` minimized,
    ``max_col`` maximized; both int64 — caller quantizes floats):
    a row survives iff NO other row is <= / >= on both axes with at
    least one strict inequality.  Ties on BOTH axes all survive
    (neither dominates the other).

    Scale shape: skyline is union-compatible — sky(A ∪ B) ⊆
    sky(A) ∪ sky(B) — so each block reduces to its local skyline
    (one lexsort + two vectorized passes), the driver merges the
    per-block candidates (bounded by Σ local skyline sizes; for
    random data the expected skyline is O(log n) points — only a
    fully anti-correlated corpus, whose frontier IS the data, defeats
    the reduction, as it does any engine), and the global frontier
    broadcasts for one membership filter scan.  Membership is
    searchsorted on the frontier's strictly-ascending ``m`` plus an
    ``mx`` equality check — no packed-key magnitude contract.

    -> Dataset: the input rows (all columns) on the frontier.
    """
    import ray

    def block_skyline(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[min_col]),
                             pc.is_valid(t[max_col])))
        m = t[min_col].to_numpy(zero_copy_only=False)
        mx = t[max_col].to_numpy(zero_copy_only=False)
        mu, mxu = _skyline_2d(np.asarray(m, np.int64),
                              np.asarray(mx, np.int64))
        return pa.table({min_col: pa.array(mu, pa.int64()),
                         max_col: pa.array(mxu, pa.int64())})

    parts = [b for b in ds.map_batches(block_skyline,
                                       batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:  # all rows null on an axis (or empty corpus)
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow")
    cand = pa.concat_tables(parts)
    sky_m, sky_mx = _skyline_2d(
        cand[min_col].to_numpy(zero_copy_only=False),
        cand[max_col].to_numpy(zero_copy_only=False))
    sky_ref = ray.put((sky_m, sky_mx))

    def member_filter(t: pa.Table) -> pa.Table:
        km, kx = ray.get(sky_ref)
        valid = pc.and_(pc.is_valid(t[min_col]),
                        pc.is_valid(t[max_col])) \
            .to_numpy(zero_copy_only=False)
        m = np.asarray(pc.fill_null(t[min_col], 0)
                       .to_numpy(zero_copy_only=False), np.int64)
        mx = np.asarray(pc.fill_null(t[max_col], 0)
                        .to_numpy(zero_copy_only=False), np.int64)
        pos = np.searchsorted(km, m)
        inb = pos < len(km)
        ok = valid & inb
        ok[ok] = (km[pos[ok]] == m[ok]) & (kx[pos[ok]] == mx[ok])
        return t.filter(pa.array(ok))

    return ds.map_batches(member_filter, batch_format="pyarrow")


def fd_audit(ds, det_col: str, dep_col: str) -> pa.Table:
    """Functional-dependency audit: does ``det_col -> dep_col`` hold?
    Composes :func:`grouped_ndv` (distinct-(det, dep) combiner on a
    DEP-hash shard exchange — hot determinant values cannot pile one
    shard) and folds its per-determinant distinct counts to three
    scalars.  The profiling primitive behind key inference, join
    planning and denormalization checks.

    -> one-row pa.Table(dependency, n_det, n_violations, max_ndv):
       violations = determinant values mapping to >1 distinct
       dependent value; the FD holds iff n_violations == 0.
    """
    ndv = grouped_ndv(ds, det_col, dep_col)
    n_det = 0
    n_viol = 0
    max_ndv = 0
    for b in ndv.iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        c = b["ndv"].to_numpy(zero_copy_only=False)
        n_det += len(c)
        n_viol += int((c > 1).sum())
        max_ndv = max(max_ndv, int(c.max()))
    return pa.table({
        "dependency": pa.array([f"{det_col}->{dep_col}"], pa.string()),
        "n_det": pa.array([n_det], pa.int64()),
        "n_violations": pa.array([n_viol], pa.int64()),
        "max_ndv": pa.array([max_ndv], pa.int64()),
    })


def equidepth_selectivity_audit(ds, value_col: str, lo: int, hi: int):
    """Optimizer-statistics audit: per equi-depth decile of the int64
    ``value_col``, the exact ingredients of a histogram selectivity
    estimate for the band predicate ``lo <= v <= hi`` — bucket row
    count, bucket bounds, the band's overlap width with the bucket,
    and the TRUE in-band row count.  The uniformity estimate is
    ``n_rows * overlap / (bucket_hi - bucket_lo)`` — exact integers
    exposed, the division deliberately left to the reader (the
    float-free-epilogue contract).

    Shape: exact decile thresholds via the 3-scan distributed
    selection (never a global sort), one min/max aggregate, then ONE
    bucketing scan with 10-row per-batch partials — the fact table
    never shuffles.  Bucket membership is threshold-count based
    (1 + #thresholds strictly below), the Lorenz convention, so ties
    are deterministic in both engines.

    -> pa.Table(decile, n_rows, bucket_lo, bucket_hi, overlap,
       in_band_rows) for non-empty deciles.
    """
    import ray.data.aggregate as A

    dec = exact_value_deciles(ds, value_col)
    thr = dec["value"].to_numpy(zero_copy_only=False).astype(np.int64)
    mm = ds.aggregate(A.Min(value_col), A.Max(value_col))
    vmin = int(mm[f"min({value_col})"])
    vmax = int(mm[f"max({value_col})"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[value_col].to_numpy(zero_copy_only=False),
                       np.int64)
        d = np.searchsorted(thr, x, side="left")  # #thresholds < x
        n = np.bincount(d, minlength=10)
        band = (x >= lo) & (x <= hi)
        nb = np.bincount(d[band], minlength=10)
        return pa.table({
            "decile": pa.array(np.arange(1, 11, dtype=np.int64)),
            "n": pa.array(n, pa.int64()),
            "nband": pa.array(nb, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("decile").aggregate(A.Sum("n"), A.Sum("nband"))
    rows = [b for b in agg.iter_batches(batch_format="pyarrow",
                                        batch_size=None) if b.num_rows]
    t = pa.concat_tables(rows).sort_by("decile")
    dcl = t["decile"].to_numpy(zero_copy_only=False)
    n = pc.cast(t["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
    nb = pc.cast(t["sum(nband)"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    blo = np.where(dcl == 1, vmin, thr[np.maximum(dcl - 2, 0)])
    bhi = np.where(dcl == 10, vmax, thr[np.minimum(dcl - 1, 8)])
    overlap = np.maximum(
        0, np.minimum(np.int64(hi), bhi) - np.maximum(np.int64(lo), blo))
    keep = n > 0
    return pa.table({
        "decile": pa.array(dcl[keep], pa.int64()),
        "n_rows": pa.array(n[keep], pa.int64()),
        "bucket_lo": pa.array(blo[keep], pa.int64()),
        "bucket_hi": pa.array(bhi[keep], pa.int64()),
        "overlap": pa.array(overlap[keep], pa.int64()),
        "in_band_rows": pa.array(nb[keep], pa.int64()),
    })


def fd_audit_multi(ds, pairs: list) -> pa.Table:
    """Audit several functional dependencies in ONE scan + ONE
    exchange: per batch, each (det, dep) pair contributes its
    distinct pairs tagged with a dependency id; the union shards by
    hash(dep-value) per dependency (hot determinants spread), each
    shard counts per-determinant distinct dependents, and a final
    tiny fold yields one row per dependency — 3x fewer scans than
    calling :func:`fd_audit` per pair.

    ``pairs`` is a list of (det_col, dep_col); all named columns must
    exist in ``ds``.  -> pa.Table(dependency, n_det, n_violations,
    max_ndv) sorted by dependency."""
    from .dedup import _default_shards, _key_shards

    num_shards = _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for pid, (det, dep) in enumerate(pairs):
            s = t.select([det, dep])
            s = s.filter(pc.and_(pc.is_valid(s[det]),
                                 pc.is_valid(s[dep])))
            g = s.group_by([det, dep]).aggregate([])
            # string-normalize both sides so heterogeneous pairs can
            # ride one union (hash over the string form still
            # co-shards equal values)
            dv = pc.cast(g[det], pa.string())
            pv = pc.cast(g[dep], pa.string())
            keys = pv.to_numpy(zero_copy_only=False)
            outs.append(pa.table({
                "pid": pa.array(np.full(g.num_rows, pid, np.int64)),
                "det": dv, "dep": pv,
                "kshard": pa.array(
                    _key_shards(keys, num_shards, 61 + pid),
                    pa.int64())}))
        return pa.concat_tables(outs) if outs else pa.table({
            "pid": pa.array([], pa.int64()),
            "det": pa.array([], pa.string()),
            "dep": pa.array([], pa.string()),
            "kshard": pa.array([], pa.int64())})

    def count_shard(t: pa.Table) -> pa.Table:
        g = t.group_by(["pid", "det", "dep"]).aggregate([])
        c = g.group_by(["pid", "det"]).aggregate([("dep", "count")])
        return c.select(["pid", "det", "dep_count"]) \
                .rename_columns(["pid", "det", "ndv"])

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("kshard").map_groups(count_shard,
                                      batch_format="pyarrow")
    # per-determinant partial ndv counts sum across shards, then fold
    import ray.data.aggregate as A
    agg = partials.groupby(["pid", "det"]).aggregate(A.Sum("ndv"))
    acc = {i: [0, 0, 0] for i in range(len(pairs))}
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        pid = b["pid"].to_numpy(zero_copy_only=False)
        c = pc.cast(b["sum(ndv)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        for i in range(len(pairs)):
            sel = pid == i
            if sel.any():
                cc = c[sel]
                acc[i][0] += len(cc)
                acc[i][1] += int((cc > 1).sum())
                acc[i][2] = max(acc[i][2], int(cc.max()))
    return pa.table({
        "dependency": pa.array(
            [f"{d}->{p}" for d, p in pairs], pa.string()),
        "n_det": pa.array([acc[i][0] for i in range(len(pairs))],
                          pa.int64()),
        "n_violations": pa.array([acc[i][1] for i in range(len(pairs))],
                                 pa.int64()),
        "max_ndv": pa.array([acc[i][2] for i in range(len(pairs))],
                            pa.int64()),
    }).sort_by("dependency")
