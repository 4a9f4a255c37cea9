"""Per-key time-ordered scan operators (the window-function family).

SQL window functions with ``PARTITION BY key ORDER BY ts`` — LAG
deltas, gap maxima, within-window duplicate flags — need every row of
one key, time-sorted, in one place.  The Ray-Data shape here is the
sessionize rule from functions/joins.py: ONE bounded integer exchange
on hash(entity key) (never a groupby on the raw near-unique key), then
a single vectorized numpy pass per shard that processes ALL keys at
once via sorted key-run boundary arrays.

* :func:`grouped_max_gap` — per-key event count + max inter-event gap
  (µs, int64 — exactly reproducible by the SQL oracle's
  ``date_diff('microsecond', lag(ts), ts)``).
* :func:`windowed_duplicate_counts` — events whose previous same-
  (key, type) event lies within a window: the streaming-dedup /
  double-fire detector.  Output is aggregated per type (partial
  counts per shard, tiny final groupby), so the exchange result never
  leaves the cluster row-by-row.

Partitioning contract (same as sessionize/asof): one key-hash shard's
rows must fit a task; shard count is cluster-proportional
(`default_exchange_shards`).  For pathological hot keys the
time-split + stitch machinery in functions/timesplit.py applies — a
max-gap merge across a cut only needs the boundary rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_shards, _group_starts, _key_shards


def _sorted_shard(t: pa.Table, key_col: str, ts_col: str,
                  order_col: str, extra: list[str] | None = None):
    """Sort one shard by (key, ts, order_col) and return numpy views:
    keys, epoch-µs int64, tiebreak order col, and requested extras."""
    sort_cols = [key_col, ts_col, order_col]
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in sort_cols])
    t = t.take(idx)
    keys = t[key_col].to_numpy(zero_copy_only=False)
    us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    extras = [t[c].to_numpy(zero_copy_only=False) for c in (extra or [])]
    return t, keys, us, extras


def grouped_max_gap(ds, key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    num_shards: int | None = None):
    """-> Dataset(key_col, n_events, max_gap_us) for keys with >= 2
    events.  Gap = µs between consecutive events of one key ordered by
    (ts, order_col); ties at equal ts contribute gap 0 regardless of
    tiebreak order, so the result is deterministic.
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, order_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 61), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        n = len(keys)
        if n == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "n_events": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64())})
        starts, sizes = _group_starts(keys)
        gaps = np.empty(n, np.int64)
        gaps[0] = 0
        gaps[1:] = us[1:] - us[:-1]
        gaps[starts] = 0          # first row of each key: no gap
        # per-key max over each run (runs with size 1 yield 0 but are
        # filtered below)
        maxg = np.maximum.reduceat(gaps, starts)
        keep = sizes >= 2
        return pa.table({
            key_col: pa.array(keys[starts[keep]],
                              t.schema.field(key_col).type),
            "n_events": pa.array(sizes[keep].astype(np.int64),
                                 pa.int64()),
            "max_gap_us": pa.array(maxg[keep], pa.int64())})

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_lag_delta(ds, key_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id",
                      num_shards: int | None = None):
    """Row-level LAG delta: for EVERY event, µs since the same key's
    previous event ordered by (ts, order_col) — SQL's
    ``date_diff('microsecond', lag(ts) OVER (PARTITION BY key ORDER BY
    ts, order), ts)``; NULL for a key's first event.  Same bounded
    key-hash exchange + single sorted numpy pass as
    :func:`grouped_max_gap`, but emitting one row per input row
    (key_col, order_col, delta_us).  Rows with null key or ts are
    dropped (SQL's window over a NOT NULL filter)."""
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, order_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 61), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        n = len(keys)
        ktype = t.schema.field(key_col).type
        otype = t.schema.field(order_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             order_col: pa.array([], otype),
                             "delta_us": pa.array([], pa.int64())})
        starts, _sizes = _group_starts(keys)
        delta = np.empty(n, np.int64)
        delta[0] = 0
        delta[1:] = us[1:] - us[:-1]
        first = np.zeros(n, bool)
        first[starts] = True
        return pa.table({
            key_col: t[key_col],
            order_col: t[order_col],
            "delta_us": pa.array(
                np.ma.masked_array(delta, mask=first), pa.int64(),
                from_pandas=True),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_first_last(ds, key_col: str, ts_col: str, order_col: str,
                       num_shards: int | None = None):
    """FIRST_VALUE / LAST_VALUE per key over (ts, order_col) ordering:
    Dataset(key_col, first, last, n_rows) where first/last are the
    ``order_col`` values of the key's earliest/latest row.  One bounded
    key-hash exchange, then run-boundary picks (starts / starts+sizes-1)
    on the per-shard sorted arrays — no per-group Python, no driver
    state.  Null key/ts rows are dropped."""
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, order_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 61), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, _us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        ktype = t.schema.field(key_col).type
        otype = t.schema.field(order_col).type
        if len(keys) == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "first": pa.array([], otype),
                             "last": pa.array([], otype),
                             "n_rows": pa.array([], pa.int64())})
        starts, sizes = _group_starts(keys)
        ends = starts + sizes - 1
        order = t[order_col]
        return pa.table({
            key_col: t[key_col].take(pa.array(starts)),
            "first": order.take(pa.array(starts)),
            "last": order.take(pa.array(ends)),
            "n_rows": pa.array(sizes.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_moving_sum(ds, key_col: str, ts_col: str, order_col: str,
                       val_col: str, preceding: int = 2,
                       num_shards: int | None = None):
    """ROWS-frame window aggregate: per key ordered by (ts, order),
    the sum + row count of ``val_col`` over ``ROWS BETWEEN <preceding>
    PRECEDING AND CURRENT ROW`` — one bounded key-hash exchange, then
    a vectorized cumsum-with-run-boundaries pass per shard (frame sum
    = cs[i] - cs[max(run_start, i-preceding) - 1], no per-row Python).
    Values ride as exact int64 so the output is bit-equal to the SQL
    window oracle.  Null key/ts rows are dropped; null values count 0
    toward the sum and are excluded from n_win (SQL sum/count null
    semantics)."""
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, order_col, val_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 61), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, _us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        n = len(keys)
        ktype = t.schema.field(key_col).type
        otype = t.schema.field(order_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             order_col: pa.array([], otype),
                             "moving_sum": pa.array([], pa.int64()),
                             "n_win": pa.array([], pa.int64())})
        vals = pc.cast(t[val_col], pa.int64())
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(keys)
        run_start = np.repeat(starts, sizes)
        i = np.arange(n)
        j = np.maximum(run_start, i - preceding)
        cs = np.cumsum(v)
        csv = np.cumsum(valid.astype(np.int64))
        left = np.where(j > 0, cs[np.maximum(j - 1, 0)], 0)
        leftn = np.where(j > 0, csv[np.maximum(j - 1, 0)], 0)
        msum = cs - left
        nwin = csv - leftn
        # SQL: a frame of only-NULL values sums to NULL, not 0
        return pa.table({
            key_col: t[key_col],
            order_col: t[order_col],
            "moving_sum": pa.array(
                np.ma.masked_array(msum, mask=nwin == 0), pa.int64(),
                from_pandas=True),
            "n_win": pa.array(nwin, pa.int64()),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_range_moving_sum(ds, key_col: str, ts_col: str,
                             id_col: str, val_col: str,
                             preceding_us: int,
                             num_shards: int | None = None):
    """RANGE-frame window aggregate: per key ordered by ``ts_col``,
    the sum + non-null count of ``val_col`` over ``RANGE BETWEEN
    <preceding_us> µs PRECEDING AND CURRENT ROW``.

    SQL RANGE semantics (unlike the ROWS frame of
    :func:`grouped_moving_sum`): the frame is defined by TIME, not row
    position — it spans every row of the key whose ts lies in
    ``[ts_i - preceding_us, ts_i]``, INCLUDING peer rows after row i
    with the identical ts (ties share one frame).  Values ride as
    exact int64 so the output is bit-equal to the SQL
    ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW`` oracle.

    Same physical shape as every operator in this module: one bounded
    key-hash exchange, then a single vectorized pass per shard.  Frame
    bounds come from ONE ``np.searchsorted`` over a composite
    (run, ts) key: each key-run's epoch-µs are offset by
    ``run_idx * (shard_ts_span + preceding_us + 2)`` so the offset
    array is globally sorted and a window query can never cross into a
    neighbouring key's run.  Runs are processed in chunks sized so the
    offset arithmetic stays far from int64 overflow (one chunk for any
    realistic shard; the chunk loop is over MILLIONS of runs per
    iteration, not per run).

    Null key/ts rows are dropped (the oracle filters them); null
    values count 0 toward the sum and are excluded from ``n_win``, and
    an all-null frame sums to NULL (SQL sum/count semantics).
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, id_col, val_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 67), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, us, _ = _sorted_shard(t, key_col, ts_col, id_col)
        n = len(keys)
        ktype = t.schema.field(key_col).type
        itype = t.schema.field(id_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             id_col: pa.array([], itype),
                             "range_sum": pa.array([], pa.int64()),
                             "n_win": pa.array([], pa.int64())})
        vals = pc.cast(t[val_col], pa.int64())
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(keys)
        run_of_row = np.repeat(np.arange(len(starts), dtype=np.int64),
                               sizes)
        base = us - us.min()  # shard-local, nonnegative
        span = int(base.max()) + int(preceding_us) + 2
        # runs per chunk such that chunk_size * span < 2^62
        chunk_runs = max(1, (1 << 62) // span)
        cs = np.cumsum(v)
        csv = np.cumsum(valid.astype(np.int64))
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        for r0 in range(0, len(starts), chunk_runs):
            r1 = min(r0 + chunk_runs, len(starts))
            s = starts[r0]
            e = starts[r1] if r1 < len(starts) else n
            tz = base[s:e] + (run_of_row[s:e] - r0) * span
            lo[s:e] = s + np.searchsorted(tz, tz - preceding_us, "left")
            hi[s:e] = s + np.searchsorted(tz, tz, "right")
        msum = cs[hi - 1] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        nwin = csv[hi - 1] - np.where(lo > 0, csv[np.maximum(lo - 1, 0)], 0)
        return pa.table({
            key_col: t[key_col],
            id_col: t[id_col],
            "range_sum": pa.array(
                np.ma.masked_array(msum, mask=nwin == 0), pa.int64(),
                from_pandas=True),
            "n_win": pa.array(nwin, pa.int64()),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_running(ds, key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    value_col: str = "value",
                    num_shards: int | None = None):
    """Per-key cumulative window functions in ONE pass ->
    Dataset(order_col, key_col, row_number, running_millis):

    * ``row_number`` — 1-based rank within the key ordered by
      (ts, order_col), i.e. SQL ``row_number() OVER (PARTITION BY key
      ORDER BY ts, order)``;
    * ``running_millis`` — cumulative sum of ``round(value * 1000)``
      as int64 (milli-units), i.e. ``SUM(...) OVER (... ROWS UNBOUNDED
      PRECEDING)``.  Integer accumulation makes the distributed result
      bit-identical to the SQL oracle — a float running sum would
      diverge in the last ulp between engines.

    Null values contribute 0 (state COALESCE in the oracle); null
    key/ts rows are dropped.  Same exchange contract as
    :func:`grouped_max_gap`: one bounded key-hash shard, one sorted
    numpy pass over all keys per shard, cumsum reset at key run
    boundaries by subtracting the run-start offset.
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col, order_col, value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 73), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, us, (vals,) = _sorted_shard(
            t, key_col, ts_col, order_col, extra=[value_col])
        n = len(keys)
        ktype = t.schema.field(key_col).type
        otype = t.schema.field(order_col).type
        if n == 0:
            return pa.table({order_col: pa.array([], otype),
                             key_col: pa.array([], ktype),
                             "row_number": pa.array([], pa.int64()),
                             "running_millis": pa.array([], pa.int64())})
        v = np.asarray(vals, np.float64)
        v = np.where(np.isnan(v), 0.0, v) * 1000.0
        millis = np.trunc(np.abs(v) + 0.5).astype(np.int64) \
            * np.where(v < 0, -1, 1).astype(np.int64)
        starts, sizes = _group_starts(keys)
        cum = np.cumsum(millis)
        # per-run reset: subtract the cumulative total BEFORE each
        # run's first row (0 for the first run, which starts at 0)
        shift = np.zeros(len(starts), np.int64)
        shift[1:] = cum[starts[1:] - 1]
        running = cum - np.repeat(shift, sizes)
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes) + 1
        return pa.table({order_col: t[order_col],
                         key_col: t[key_col],
                         "row_number": pa.array(rn, pa.int64()),
                         "running_millis": pa.array(running, pa.int64())})

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def windowed_duplicate_counts(ds, key_col: str = "user_id",
                              type_col: str = "event_type",
                              ts_col: str = "ts",
                              order_col: str = "event_id",
                              window_s: float = 60.0,
                              num_shards: int | None = None):
    """-> Dataset(type_col, n_dups): count of events whose PREVIOUS
    event with the same (key, type) happened <= ``window_s`` seconds
    earlier — the repeated-fire / at-least-once-delivery duplicate
    detector, aggregated per event type.

    Shards by hash(key) only (all of a key's types co-locate), sorts
    each shard once by (key, type, ts, order), and flags rows where
    the predecessor shares (key, type) and the µs delta is within the
    window.  Per-shard partial counts then sum in a final tiny
    groupby — output cardinality is the number of event types.
    """
    nb = num_shards or _default_shards()
    win_us = int(round(window_s * 1_000_000))

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[type_col])),
            pc.is_valid(t[ts_col])))
        t = t.select([key_col, type_col, ts_col, order_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 67), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        sort_cols = [key_col, type_col, ts_col, order_col]
        idx = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in sort_cols])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        types = t[type_col].to_numpy(zero_copy_only=False)
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table({type_col: pa.array([], pa.string()),
                             "n_dups": pa.array([], pa.int64())})
        dup = np.zeros(n, bool)
        same = (keys[1:] == keys[:-1]) & (types[1:] == types[:-1])
        dup[1:] = same & ((us[1:] - us[:-1]) <= win_us)
        # per-type partial counts for this shard
        dt = pa.table({type_col: pa.array(types[dup])})
        if len(dt) == 0:
            return pa.table({type_col: pa.array([], pa.string()),
                             "n_dups": pa.array([], pa.int64())})
        g = dt.group_by([type_col]).aggregate([([], "count_all")])
        g = g.select([type_col, "count_all"]) \
            .rename_columns([type_col, "n_dups"])
        return g.set_column(1, "n_dups", pc.cast(g["n_dups"], pa.int64()))

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by([type_col]).aggregate([("n_dups", "sum")])
        g = g.select([type_col, "n_dups_sum"]) \
            .rename_columns([type_col, "n_dups"])
        return g.set_column(1, "n_dups", pc.cast(g["n_dups"], pa.int64()))

    per_shard = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")
    return per_shard.repartition(1).map_batches(total,
                                                batch_format="pyarrow")


def global_ntile(ds, value_col: str, key_col: str, n_buckets: int,
                 num_shards: int | None = None):
    """GLOBAL ntile: every row's bucket (1..n_buckets) under the total
    order ``ORDER BY value_col, key_col`` — the one window shape that
    cannot be decomposed per key (SQL: ``ntile(k) OVER (ORDER BY v,
    key)``).

    NO global sort operator.  Pass 1 exchanges per-VALUE counts (a
    bounded-cardinality histogram — counts, never rows); the driver
    packs contiguous distinct values into ``num_shards`` range shards
    of near-even row weight (O(distinct values) driver work) and
    computes each shard's cumulative base offset.  Pass 2 tags rows
    with their range shard (searchsorted over broadcast boundaries),
    groups by shard, sorts WITHIN the shard only and emits
    ``bucket = ntile(shard_base + local_rank)``.

    Partitioning contract: rows of ONE distinct value co-locate (their
    relative rank is decided by key order inside the value run), so a
    single pathologically hot value is a hot shard — inherent to exact
    rank; the histogram pass is where a planner would detect it and
    split on (value, key-range) with base offsets per key range.
    """
    import ray
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()

    counts = ds.select_columns([value_col]) \
        .map_batches(lambda t: t.group_by([value_col]).aggregate(
            [([], "count_all")]).rename_columns([value_col, "n"]),
            batch_format="pyarrow") \
        .groupby(value_col).aggregate(A.Sum("n", alias_name="n"))
    parts = [b for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64())}))
    hist = pa.concat_tables(parts).sort_by(value_col)
    vals = hist[value_col].to_numpy(zero_copy_only=False)
    ns = hist["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(ns.sum())
    # greedy pack: split the cumulative row weight at nb even targets
    cum = np.cumsum(ns)
    targets = (np.arange(1, nb) * total) // nb
    splits = np.unique(np.searchsorted(cum, targets, side="left"))
    splits = splits[splits < len(vals) - 1]
    shard_start_idx = np.r_[np.int64(0), splits + 1]
    bases = np.r_[np.int64(0), cum[:-1]][shard_start_idx]
    # boundary value of each shard (first distinct value it owns)
    bound_vals = vals[shard_start_idx]
    bref = ray.put((bound_vals, bases))
    q, rem = divmod(total, n_buckets)
    cutoff = rem * (q + 1)

    def tag(t: pa.Table) -> pa.Table:
        bounds, _ = ray.get(bref)
        v = t[value_col].to_numpy(zero_copy_only=False)
        sid = np.searchsorted(bounds, v, side="right") - 1
        return t.append_column(
            "rshard", pa.array(sid.astype(np.int64), pa.int64()))

    def rank_shard(t: pa.Table) -> pa.Table:
        _, base_arr = ray.get(bref)
        sid = int(t["rshard"][0].as_py())
        t = t.sort_by([(value_col, "ascending"),
                       (key_col, "ascending")])
        r = base_arr[sid] + np.arange(t.num_rows, dtype=np.int64)
        if q == 0:
            bucket = r + 1
        else:
            bucket = np.where(r < cutoff, r // (q + 1),
                              rem + (r - cutoff) // q) + 1
        return pa.table({key_col: t[key_col], value_col: t[value_col],
                         "bucket": pa.array(bucket.astype(np.int64),
                                            pa.int64())})

    return ds.select_columns([value_col, key_col]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("rshard").map_groups(rank_shard,
                                      batch_format="pyarrow")


def global_rank_stats(ds, value_col: str, key_col: str,
                      num_shards: int | None = None):
    """GLOBAL percent_rank() and cume_dist() OVER (ORDER BY value) for
    every row — rank statistics that, unlike ntile, need NO row
    exchange at all: a row's min-rank and <=-count are fully
    determined by the corpus value histogram.

    Pass 1 exchanges per-VALUE counts (the bounded-cardinality
    histogram contract shared with :func:`global_ntile` — counts,
    never rows; the driver holds O(distinct values)).  The sorted
    values + cumulative-below / cumulative-at-or-below arrays
    broadcast once via ``ray.put``; pass 2 probes them per batch with
    searchsorted and emits per-row doubles — embarrassingly parallel,
    zero shuffles.

    Float contract: ``percent_rank = (rank_min - 1) / (n - 1)``
    (0.0 when n == 1 — the SQL edge) and ``cume_dist = n_le / n``,
    each one division of exact integers — bit-equal to the SQL window
    functions.  Null values are dropped (rows, not zero-filled:
    SQL window functions over a filtered frame — state the filter in
    the oracle).

    -> Dataset(key_col, value_col, percent_rank float64, cume_dist
    float64)."""
    import ray
    import ray.data.aggregate as A

    counts = ds.select_columns([value_col]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t[value_col]))
                     .group_by([value_col]).aggregate(
                         [([], "count_all")])
                     .rename_columns([value_col, "n"]),
                     batch_format="pyarrow") \
        .groupby(value_col).aggregate(A.Sum("n", alias_name="n"))
    parts = [b for b in counts.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
             if b.num_rows]
    key_type = None
    val_type = None
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name == key_col:
            key_type = typ
        if name == value_col:
            val_type = typ
    empty = pa.table({key_col: pa.array([], key_type),
                      value_col: pa.array([], val_type),
                      "percent_rank": pa.array([], pa.float64()),
                      "cume_dist": pa.array([], pa.float64())})
    if not parts:
        return ray.data.from_arrow(empty)
    hist = pa.concat_tables(parts).sort_by(value_col)
    vals = hist[value_col].to_numpy(zero_copy_only=False)
    ns = hist["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum_le = np.cumsum(ns)
    cum_lt = cum_le - ns
    total = int(cum_le[-1])
    ref = ray.put((vals, cum_lt, cum_le, total))

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        if t.num_rows == 0:
            return empty
        v, lt, le, n = ray.get(ref)
        x = t[value_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, x)        # exact match by contract
        pr = (lt[pos].astype(np.float64)
              / float(n - 1) if n > 1
              else np.zeros(t.num_rows, np.float64))
        cd = le[pos].astype(np.float64) / float(n)
        return pa.table({key_col: t[key_col],
                         value_col: t[value_col],
                         "percent_rank": pa.array(pr, pa.float64()),
                         "cume_dist": pa.array(cd, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def transition_counts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id",
                      state_col: str = "event_type",
                      num_shards: int | None = None):
    """First-order (Markov) state-transition counts: for every key's
    event stream ordered by (ts, order_col), count each consecutive
    (prev_state, next_state) pair across the whole corpus — the
    transition matrix behind next-event prediction, funnel-ordering
    audits, and session-flow dashboards.

    SQL equivalent: ``lag(state) OVER (PARTITION BY key ORDER BY ts,
    order)`` + a two-column group count, skipping each key's first
    event (no predecessor) — exactly how the oracle reproduces it.

    Same physical shape as the rest of this module: ONE bounded
    key-hash exchange, a single sorted numpy pass per shard that
    pairs each row with its predecessor via array shifts (run starts
    masked out), an in-shard (prev, next) pre-count, and a tiny final
    two-key groupby over the state-vocabulary-squared partials.  Null
    key/ts rows are dropped; a NULL state participates like any other
    value would in the engine's transition stream EXCEPT that SQL
    group-by-NULL rows are dropped to keep the oracle contract exact
    (documented: transitions with a null prev or next state are
    excluded).

    -> Dataset(prev_state, next_state, n_transitions int64).
    """
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[state_col])))
        t = t.select([key_col, ts_col, order_col, state_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 73), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, _us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        n = len(keys)
        stype = t.schema.field(state_col).type
        empty = pa.table({"prev_state": pa.array([], stype),
                          "next_state": pa.array([], stype),
                          "n_transitions": pa.array([], pa.int64())})
        if n < 2:
            return empty
        starts, _sizes = _group_starts(keys)
        keep = np.ones(n, bool)
        keep[starts] = False  # first event of each key: no predecessor
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        states = t[state_col].combine_chunks()
        pairs = pa.table({
            "prev_state": states.take(pa.array(idx - 1, pa.int64())),
            "next_state": states.take(pa.array(idx, pa.int64())),
        })
        c = pairs.group_by(["prev_state", "next_state"]) \
            .aggregate([("prev_state", "count")])
        return pa.table({
            "prev_state": c["prev_state"],
            "next_state": c["next_state"],
            "n_transitions": pc.cast(c["prev_state_count"], pa.int64())})

    partials = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")
    out = partials.groupby(["prev_state", "next_state"]) \
        .aggregate(A.Sum("n_transitions"))
    return out.map_batches(
        lambda t: t.rename_columns(["prev_state", "next_state",
                                    "n_transitions"]),
        batch_format="pyarrow")


def longest_streaks(ds, key_col: str = "user_id", ts_col: str = "ts",
                    num_shards: int | None = None):
    """Gaps-and-islands: per key, the number of distinct active days
    and the longest run of CONSECUTIVE calendar days with at least
    one event — the retention/engagement streak metric (the classic
    ``day - row_number()`` island trick in SQL).

    Physical shape: per-batch (key, day) dedup combiner (shrinks the
    exchange to at most keys x days rows), ONE bounded key-hash
    exchange, then a single sorted numpy pass per shard that segments
    each key's distinct-day sequence wherever the day delta != 1 and
    takes the max segment length per key.  Days are epoch-day int32
    (floor division of epoch-µs), exactly ``CAST(date_trunc('day',
    ts) AS DATE) - DATE '1970-01-01'`` in the oracle.

    -> Dataset(key_col, n_active_days int64, longest_streak int64).
    """
    nb = num_shards or _default_shards()
    us_per_day = 86_400_000_000

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = pa.array(us.to_numpy(zero_copy_only=False)
                       // us_per_day, pa.int64())
        slim = pa.table({key_col: t[key_col], "day": day})
        slim = slim.group_by([key_col, "day"]).aggregate([])
        keys = slim[key_col].to_numpy(zero_copy_only=False)
        return slim.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 89), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        empty = pa.table({key_col: pa.array([], ktype),
                          "n_active_days": pa.array([], pa.int64()),
                          "longest_streak": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending"),
                                            ("day", "ascending")])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        days = t["day"].to_numpy(zero_copy_only=False)
        n = len(keys)
        # cross-batch dedup of (key, day)
        keep = np.ones(n, bool)
        keep[1:] = (keys[1:] != keys[:-1]) | (days[1:] != days[:-1])
        keys, days = keys[keep], days[keep]
        n = len(keys)
        starts, sizes = _group_starts(keys)
        # segment wherever the key changes or the day gap != 1
        newseg = np.ones(n, bool)
        newseg[1:] = (keys[1:] != keys[:-1]) | (days[1:] - days[:-1] != 1)
        segstarts = np.flatnonzero(newseg)
        seglen = np.diff(np.append(segstarts, n))
        segkeys = keys[segstarts]
        kstarts, _ = _group_starts(segkeys)
        longest = np.maximum.reduceat(seglen, kstarts)
        return pa.table({
            key_col: pa.array(keys[starts], ktype),
            "n_active_days": pa.array(sizes.astype(np.int64), pa.int64()),
            "longest_streak": pa.array(longest.astype(np.int64),
                                       pa.int64())})

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def conversion_within(ds, from_state: str, to_state: str,
                      window_us: int, key_col: str = "user_id",
                      ts_col: str = "ts", state_col: str = "event_type",
                      num_shards: int | None = None):
    """Windowed conversion: of all ``from_state`` events, how many are
    followed by a STRICTLY LATER ``to_state`` event of the same key
    within ``window_us`` microseconds — event- and user-level counts,
    the funnel-with-deadline metric (view->purchase within 1 h).

    One key-hash exchange over only the two states' rows (projected to
    key/ts), then a single sorted pass per shard: rows sort by
    (key, ts, to-before-from at ties) so a reverse running minimum of
    to-event positions yields every from-event's next strictly-later
    to-event — no per-key loop, no self-join.  Per-shard partial sums;
    the driver sees 4 ints.

    -> Dataset with one row: (n_from, n_converted, n_users_from,
       n_users_converted — all int64).
    """
    import ray.data

    nb = num_shards or _default_shards()

    OUT = ("n_from", "n_converted", "n_users_from", "n_users_converted")

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_in(t[state_col],
                                      value_set=pa.array(
                                          [from_state, to_state]))))
        is_to = pc.equal(t[state_col], to_state)
        slim = pa.table({
            "k": t[key_col],
            "us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                          pa.int64()),
            "is_to": pc.cast(is_to, pa.int8())})
        keys = slim["k"].to_numpy(zero_copy_only=False)
        return slim.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 103), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        zero = pa.table({c: pa.array([0], pa.int64()) for c in OUT})
        if t.num_rows == 0:
            return zero
        # to-events sort BEFORE from-events at equal ts, so any
        # to-event after a from-event in sort order is strictly later
        idx = pc.sort_indices(t, sort_keys=[
            ("k", "ascending"), ("us", "ascending"),
            ("is_to", "descending")])
        t = t.take(idx)
        k = t["k"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        is_to = t["is_to"].to_numpy(zero_copy_only=False).astype(bool)
        n = len(k)
        pos = np.where(is_to, np.arange(n), n)
        nxt = np.minimum.accumulate(pos[::-1])[::-1]  # next to-event >= i
        am = ~is_to
        a_idx = np.flatnonzero(am)
        if len(a_idx) == 0:
            return zero
        j = nxt[a_idx]
        valid = j < n
        jc = np.clip(j, 0, n - 1)
        conv = valid & (k[jc] == k[a_idx]) \
            & (us[jc] <= us[a_idx] + window_us)
        ak = k[a_idx]
        starts, _ = _group_starts(ak)
        users_from = len(starts)
        # per-user any(conv): max over each key run
        users_conv = int((np.maximum.reduceat(
            conv.astype(np.int64), starts) > 0).sum())
        return pa.table({
            "n_from": pa.array([len(a_idx)], pa.int64()),
            "n_converted": pa.array([int(conv.sum())], pa.int64()),
            "n_users_from": pa.array([users_from], pa.int64()),
            "n_users_converted": pa.array([users_conv], pa.int64())})

    parts = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")

    def total(t: pa.Table) -> pa.Table:
        def s(c):
            return int(pc.sum(t[c]).as_py() or 0) if t.num_rows else 0
        return pa.table({c: pa.array([s(c)], pa.int64()) for c in OUT})

    zero = ray.data.from_arrow(
        pa.table({c: pa.array([0], pa.int64()) for c in OUT}))
    return parts.union(zero).repartition(1) \
        .map_batches(total, batch_format="pyarrow")


def top_session_paths(ds, k: int = 20, gap_us: int = 1_800_000_000,
                      key_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id",
                      state_col: str = "event_type",
                      num_shards: int | None = None):
    """Most common session paths: sessionize each key's stream (gap
    rule), join every session's states in (ts, order) sequence into a
    ``a>b>c`` path string, and count sessions per path — the clickflow
    / funnel-shape report.  Top-k by (count desc, path asc), so ties
    are deterministic.

    One key-hash exchange; per shard a single sorted pass segments
    sessions (key change or gap > gap_us), builds path strings with a
    reduceat join, and pre-counts paths; a bounded path groupby sums,
    and only per-shard top-k head rows reach the final cut (the
    grouped-topk shuffle bound: k x shards rows, never sessions).

    -> Dataset(path string, n_sessions int64), k rows max.
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[state_col])))
        t = t.select([key_col, ts_col, order_col, state_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 107), pa.int64()))

    PATHS = pa.schema([("path", pa.string()), ("n", pa.int64())])

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PATHS.empty_table()
        t, keys, us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        states = np.asarray(t[state_col].to_pylist(), dtype=object)
        n = len(keys)
        brk = np.ones(n, bool)
        brk[1:] = (keys[1:] != keys[:-1]) | (us[1:] - us[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        # path per session: '>'-joined states over each segment
        paths = np.add.reduceat(states + ">", starts)
        paths = np.array([p[:-1] for p in paths], dtype=object)
        u, cnt = np.unique(paths.astype("U"), return_counts=True)
        return pa.table({"path": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    import ray.data.aggregate as A

    agg = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow") \
        .groupby("path").aggregate(A.Sum("n"))

    def shard_head(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64())})
        t = pa.table({"path": t["path"],
                      "n_sessions": pc.cast(t["sum(n)"], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("n_sessions", "descending"),
                                            ("path", "ascending")])
        return t.take(idx[:k])

    def final_head(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("n_sessions", "descending"),
                                            ("path", "ascending")])
        return t.take(idx[:k])

    return agg.map_batches(shard_head, batch_format="pyarrow") \
        .repartition(1).map_batches(final_head, batch_format="pyarrow")


def latest_state(ds, key_col: str = "user_id", ts_col: str = "ts",
                 order_col: str = "event_id",
                 state_col: str = "event_type",
                 value_col: str = "value",
                 delete_state: str | None = None,
                 num_shards: int | None = None):
    """CDC / SCD-type-1 compaction: collapse a change stream to each
    key's LATEST row by (ts, order) — and if that last change is
    ``delete_state``, the key is gone (tombstone semantics).  The
    MERGE-INTO / upsert-log materialization.

    One key-hash exchange (rows projected to the 5 needed columns),
    then run-boundary last-row picks on the per-shard sorted arrays —
    Arrow ``take`` keeps null values intact.  Null key/ts/state rows
    are dropped before ordering (the SQL oracle filters the same).

    -> Dataset(key_col, last_<state_col>, last_<value_col>).
    """
    nb = num_shards or _default_shards()
    out_state = f"last_{state_col}"
    out_value = f"last_{value_col}"

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[state_col])))
        t = t.select([key_col, ts_col, order_col, state_col,
                      value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 109), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        stype = t.schema.field(state_col).type
        vtype = t.schema.field(value_col).type
        empty = pa.table({key_col: pa.array([], ktype),
                          out_state: pa.array([], stype),
                          out_value: pa.array([], vtype)})
        if t.num_rows == 0:
            return empty
        t, keys, _us, _ = _sorted_shard(t, key_col, ts_col, order_col)
        starts, sizes = _group_starts(keys)
        last = t.take(pa.array(starts + sizes - 1, pa.int64()))
        if delete_state is not None:
            last = last.filter(pc.not_equal(last[state_col],
                                            delete_state))
        return pa.table({key_col: last[key_col],
                         out_state: last[state_col],
                         out_value: last[value_col]})

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def gap_stddev_by_state(ds, key_col: str = "user_id",
                        ts_col: str = "ts",
                        order_col: str = "event_id",
                        state_col: str = "event_type",
                        num_shards: int | None = None):
    """Firing-regularity per state: exact standard deviation of the
    inter-event gaps within each (key, state) stream, aggregated per
    state — the heartbeat/SLA-jitter monitor.  Gaps are FLOOR-SECOND
    boundary diffs (``epoch_sec(t2) - epoch_sec(t1)``), matching SQL
    ``date_diff('second', lag(ts) OVER (PARTITION BY key, state
    ORDER BY ts, order), ts)`` exactly; the stddev epilogue uses the
    module's arbitrary-precision integer moments (one division + one
    sqrt per group, bit-equal to the HUGEINT oracle).

    One key-hash exchange to form gaps, then shuffle-free per-batch
    moment partials.  Magnitude contract: batch_rows x gap_sec^2 <
    2^63 (a month-long gap is ~7e12; ~10^5 such gaps per batch fit).

    -> pa.table(state_col string, n_gaps int64, stddev_samp
       float64|null, stddev_pop float64) sorted by state.
    """
    import math

    from .analytics import _grouped_int_moments

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[state_col])))
        t = t.select([key_col, ts_col, order_col, state_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 113), pa.int64()))

    def gaps(t: pa.Table) -> pa.Table:
        stype = t.schema.field(state_col).type
        empty = pa.table({"state": pa.array([], stype),
                          "gap_s": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (state_col, "ascending"),
            (ts_col, "ascending"), (order_col, "ascending")])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        states = np.asarray(t[state_col].to_pylist(), dtype=object)
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        sec = us // 1_000_000            # floor-second boundaries
        n = len(keys)
        if n < 2:
            return empty
        run_start = np.ones(n, bool)
        run_start[1:] = (keys[1:] != keys[:-1]) \
            | (states[1:] != states[:-1])
        keep = ~run_start
        idx2 = np.flatnonzero(keep)
        if len(idx2) == 0:
            return empty
        return pa.table({
            "state": pa.array(states[idx2].tolist(), stype),
            "gap_s": pa.array(sec[idx2] - sec[idx2 - 1], pa.int64())})

    gap_ds = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(gaps, batch_format="pyarrow")

    acc = _grouped_int_moments(gap_ds, "state", "gap_s", "gap_s")
    groups = sorted(acc)
    ns, samp, pop = [], [], []
    for gname in groups:
        n, sx, _sy, sxx, _syy, _sxy = acc[gname]
        vnum = n * sxx - sx * sx
        ns.append(n)
        pop.append(math.sqrt(float(vnum) / float(n * n)))
        samp.append(None if n < 2
                    else math.sqrt(float(vnum) / float(n * (n - 1))))
    return pa.table({state_col: pa.array(groups, pa.string()),
                     "n_gaps": pa.array(ns, pa.int64()),
                     "stddev_samp": pa.array(samp, pa.float64()),
                     "stddev_pop": pa.array(pop, pa.float64())})


def events_before_anchor(ds, anchor_state: str,
                         key_col: str = "user_id", ts_col: str = "ts",
                         state_col: str = "event_type",
                         num_shards: int | None = None):
    """Causality/integrity audit: per state, how many events occur
    STRICTLY BEFORE their key's first ``anchor_state`` event (possible
    instrumentation bugs), and how many belong to keys with no anchor
    at all — the events-before-signup check.

    One key-hash exchange; per shard a sorted pass computes each key's
    min anchor timestamp with a masked segmented minimum, flags rows
    vectorized, and pre-counts per state; a tiny state groupby sums.

    -> Dataset(state_col, n_before int64, n_no_anchor int64,
       n_events int64) — one row per state.
    """
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[state_col])))
        t = t.select([key_col, ts_col, state_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 127), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        stype = t.schema.field(state_col).type
        empty = pa.table({"state": pa.array([], stype),
                          "n_before": pa.array([], pa.int64()),
                          "n_no_anchor": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending"),
                                            (ts_col, "ascending")])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        states = np.asarray(t[state_col].to_pylist(), dtype=object)
        n = len(keys)
        starts, sizes = _group_starts(keys)
        run_id = np.repeat(np.arange(len(starts)), sizes)
        is_anchor = states == anchor_state
        BIG = np.iinfo(np.int64).max
        anchored_us = np.where(is_anchor, us, BIG)
        min_anchor = np.minimum.reduceat(anchored_us, starts)
        has_anchor = min_anchor != BIG
        before = has_anchor[run_id] & (us < min_anchor[run_id])
        no_anchor = ~has_anchor[run_id]
        g = pa.table({
            "state": pa.array(states.tolist(), stype),
            "b": pa.array(before.astype(np.int64), pa.int64()),
            "na": pa.array(no_anchor.astype(np.int64), pa.int64()),
            "one": pa.array(np.ones(n, np.int64))}) \
            .group_by("state").aggregate([("b", "sum"), ("na", "sum"),
                                          ("one", "sum")])
        return pa.table({
            "state": g["state"],
            "n_before": pc.cast(g["b_sum"], pa.int64()),
            "n_no_anchor": pc.cast(g["na_sum"], pa.int64()),
            "n_events": pc.cast(g["one_sum"], pa.int64())})

    agg = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow") \
        .groupby("state").aggregate(A.Sum("n_before"),
                                    A.Sum("n_no_anchor"),
                                    A.Sum("n_events"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            state_col: t["state"],
            "n_before": pc.cast(t["sum(n_before)"], pa.int64()),
            "n_no_anchor": pc.cast(t["sum(n_no_anchor)"], pa.int64()),
            "n_events": pc.cast(t["sum(n_events)"], pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")


def rolling_retention(ds, key_col: str = "user_id",
                      ts_col: str = "ts",
                      num_shards: int | None = None):
    """Week-over-week rolling retention: for every ISO (Monday) week,
    distinct active keys and how many of them are also active the
    NEXT calendar week — the complement of the first-touch cohort
    matrix in analytics.cohort_retention.

    Same physical shape as longest_streaks with weeks for days:
    per-batch (key, week) dedup combiner, ONE key-hash exchange, a
    sorted pass that flags consecutive week indices (Monday-aligned
    ``(epoch_day + 3) // 7`` — verified identical to DuckDB
    ``date_trunc('week')``), then a tiny per-week groupby.

    -> Dataset(week timestamp, n_users int64, n_retained int64).
    """
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()
    us_per_day = 86_400_000_000

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = us.to_numpy(zero_copy_only=False) // us_per_day
        week = pa.array((day + 3) // 7, pa.int64())
        slim = pa.table({key_col: t[key_col], "week": week})
        slim = slim.group_by([key_col, "week"]).aggregate([])
        keys = slim[key_col].to_numpy(zero_copy_only=False)
        return slim.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 137), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        empty = pa.table({"week": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64()),
                          "n_retained": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending"),
                                            ("week", "ascending")])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        weeks = t["week"].to_numpy(zero_copy_only=False)
        n = len(keys)
        keep = np.ones(n, bool)          # cross-batch dedup
        keep[1:] = (keys[1:] != keys[:-1]) | (weeks[1:] != weeks[:-1])
        keys, weeks = keys[keep], weeks[keep]
        n = len(keys)
        retained = np.zeros(n, np.int64)
        if n > 1:
            nxt = (keys[:-1] == keys[1:]) & (weeks[1:] - weeks[:-1] == 1)
            retained[:-1] = nxt.astype(np.int64)
        g = pa.table({"week": pa.array(weeks, pa.int64()),
                      "one": pa.array(np.ones(n, np.int64)),
                      "r": pa.array(retained, pa.int64())}) \
            .group_by("week").aggregate([("one", "sum"), ("r", "sum")])
        return pa.table({"week": g["week"],
                         "n_users": pc.cast(g["one_sum"], pa.int64()),
                         "n_retained": pc.cast(g["r_sum"], pa.int64())})

    agg = ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow") \
        .groupby("week").aggregate(A.Sum("n_users"),
                                   A.Sum("n_retained"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "week": pa.array([], pa.timestamp("us")),
                "n_users": pa.array([], pa.int64()),
                "n_retained": pa.array([], pa.int64())})
        w = t["week"].to_numpy(zero_copy_only=False)
        ts = (w * 7 - 3) * us_per_day
        return pa.table({
            "week": pc.cast(pa.array(ts, pa.int64()),
                            pa.timestamp("us")),
            "n_users": pc.cast(t["sum(n_users)"], pa.int64()),
            "n_retained": pc.cast(t["sum(n_retained)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def time_weighted_mean(ds, key_col: str = "user_id",
                       ts_col: str = "ts", order_col: str = "event_id",
                       value_col: str = "value",
                       num_shards: int | None = None):
    """Time-weighted average ingredients per key (TWAP): each value
    holds from its event until the NEXT event, so the weighted sum is
    ``sum_i v_i * (sec(t_{i+1}) - sec(t_i))`` over consecutive events
    within the key — the feature-store aggregate for irregular
    series.  Values are exact round(v*1000) milli-units and gaps are
    floor-second boundary diffs, matching SQL
    ``date_diff('second', ts, lead(ts) OVER (PARTITION BY key
    ORDER BY ts, order))`` bit-for-bit; rows with a null key, ts or
    value are dropped BEFORE pairing (lead() sees the same stream the
    oracle's filtered CTE does).  Magnitude contract: per-key
    sum(|v_milli| * gap_s) < 2^63.

    One key-hash exchange, one per-shard sorted run scan; keys with a
    single surviving event contribute no interval and are omitted
    (SQL's WHERE gap IS NOT NULL).

    -> Dataset(key, n_intervals int64, span_s int64,
       vtime_milli_s int64), the mean being vtime_milli_s /
       (1000 * span_s) — one division away, deliberately not
       materialized as a float.
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[value_col])))
        t = t.select([key_col, ts_col, order_col, value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 137), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        empty = pa.table({key_col: pa.array([], ktype),
                          "n_intervals": pa.array([], pa.int64()),
                          "span_s": pa.array([], pa.int64()),
                          "vtime_milli_s": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (order_col, "ascending")])
        t = t.take(idx)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        sec = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                      pa.int64()).to_numpy(zero_copy_only=False) \
            // 1_000_000
        v = t[value_col].to_numpy(zero_copy_only=False)
        vmilli = np.copysign(np.floor(np.abs(v * 1000.0) + 0.5), v) \
            .astype(np.int64)
        n = len(keys)
        if n < 2:
            return empty
        starts, sizes = _group_starts(keys)
        intra = np.ones(n - 1, bool)      # pair (i, i+1) same key?
        ends = starts + sizes - 1
        intra[ends[:-1]] = False          # last row of each run
        pi = np.flatnonzero(intra)        # interval start indices
        if len(pi) == 0:
            return empty
        gaps = sec[pi + 1] - sec[pi]
        terms = vmilli[pi] * gaps
        keep = sizes > 1
        # per-key reductions over the contiguous interval runs:
        # key k's intervals occupy pi[off[k]:off[k+1]]
        csum_g = np.concatenate([[0], np.cumsum(gaps)])
        csum_t = np.concatenate([[0], np.cumsum(terms)])
        off = np.cumsum(np.append(0, (sizes - 1)))
        kidx = np.flatnonzero(keep)
        lo = off[kidx]
        hi = off[kidx + 1]
        return pa.table({
            key_col: t[key_col].take(pa.array(starts[keep])),
            "n_intervals": pa.array(hi - lo, pa.int64()),
            "span_s": pa.array(csum_g[hi] - csum_g[lo], pa.int64()),
            "vtime_milli_s": pa.array(csum_t[hi] - csum_t[lo],
                                      pa.int64())})

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_rank_stats(ds, group_col: str, value_col: str,
                       key_col: str):
    """percent_rank() / cume_dist() OVER (PARTITION BY group ORDER BY
    value) for every row — the grouped extension of
    :func:`global_rank_stats`, still with ZERO row exchanges: pass 1
    exchanges per-(group, value) counts (bounded by groups x value
    domain, never row count; the driver holds O(distinct pairs)), the
    per-group sorted value + cumulative arrays broadcast once via
    ``ray.put``, and pass 2 probes them per batch with one
    searchsorted per distinct group in the batch.

    Float contract matches the SQL window functions bit-for-bit:
    ``percent_rank = (rank_min - 1) / (n_group - 1)`` (0.0 for a
    single-row partition) and ``cume_dist = n_le / n_group`` — each
    one division of exact integers.  Rows with a null group, value or
    key are dropped (state the filter in the oracle).

    -> Dataset(key_col, group_col, value_col, percent_rank float64,
    cume_dist float64)."""
    import ray
    import ray.data
    import ray.data.aggregate as A

    def cnt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[value_col])))
        g = t.group_by([group_col, value_col]) \
             .aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "n"])

    counts = ds.select_columns([group_col, value_col]) \
        .map_batches(cnt, batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(A.Sum("n", alias_name="n"))
    parts = [b for b in counts.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
             if b.num_rows]
    schema = pa.schema(ds.schema().base_schema)
    empty = pa.table({
        key_col: pa.array([], schema.field(key_col).type),
        group_col: pa.array([], schema.field(group_col).type),
        value_col: pa.array([], schema.field(value_col).type),
        "percent_rank": pa.array([], pa.float64()),
        "cume_dist": pa.array([], pa.float64())})
    if not parts:
        return ray.data.from_arrow(empty)
    hist = pa.concat_tables(parts) \
        .sort_by([(group_col, "ascending"), (value_col, "ascending")])
    groups = np.asarray(hist[group_col].to_pylist(), dtype=object)
    vals = hist[value_col].to_numpy(zero_copy_only=False)
    ns = hist["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts, sizes = _group_starts(groups)
    lookup = {}
    for s, m in zip(starts, sizes):
        v = vals[s:s + m]
        cum_le = np.cumsum(ns[s:s + m])
        lookup[groups[s]] = (v, cum_le - ns[s:s + m], cum_le,
                             int(cum_le[-1]))
    ref = ray.put(lookup)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[group_col]),
                                     pc.is_valid(t[value_col])),
                             pc.is_valid(t[key_col])))
        if t.num_rows == 0:
            return empty
        lut = ray.get(ref)
        g = np.asarray(t[group_col].to_pylist(), dtype=object)
        x = t[value_col].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(g), np.float64)
        cd = np.zeros(len(g), np.float64)
        for gname in set(g.tolist()):
            sel = np.flatnonzero(g == gname)
            v, lt, le, n = lut[gname]
            pos = np.searchsorted(v, x[sel])   # exact match contract
            if n > 1:
                pr[sel] = lt[pos].astype(np.float64) / float(n - 1)
            cd[sel] = le[pos].astype(np.float64) / float(n)
        return pa.table({key_col: t[key_col],
                         group_col: t[group_col],
                         value_col: t[value_col],
                         "percent_rank": pa.array(pr, pa.float64()),
                         "cume_dist": pa.array(cd, pa.float64())})

    return ds.select_columns([key_col, group_col, value_col]) \
        .map_batches(score, batch_format="pyarrow")


def grouped_ewma_pow2(ds, key_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id",
                      value_col: str = "value", window: int = 16,
                      num_shards: int | None = None):
    """Per-key exponentially-weighted moving value (α = 1/2) at each
    key's LAST event, as an EXACT integer: with v_milli the
    round(v*1000) milli-units of the most recent ``window`` events of
    the key (ordered by ts, order_col),

        ewma_scaled = sum_{k=0..window-1} v_milli[last-k] * 2^(window-1-k)

    i.e. the dyadic EWMA numerator scaled by 2^(window-1) — halving
    weights per step back, truncated at ``window`` lags.  The dyadic
    α makes every term an exact integer, so the result is
    bit-reproducible by a SQL oracle built from ``window`` LAG terms
    (the float-free-epilogue contract used across this repo; the
    float EWMA is ewma_scaled / (1000 * 2^(window-1))).  Rows with a
    null key, ts or value are dropped BEFORE lagging (the LAGs see
    the same filtered stream the oracle's CTE does).

    Magnitude contract: window * max|v_milli| * 2^(window-1) < 2^63
    (defaults: |v| < ~2.8e12).

    One key-hash exchange, one per-shard sorted run scan with a
    ``window``-iteration vectorized shifted-add (no per-row Python).

    -> Dataset(key_col, n_events int64, ewma_scaled int64).
    """
    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[value_col])))
        t = t.select([key_col, ts_col, order_col, value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 149), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, _us, (vals,) = _sorted_shard(t, key_col, ts_col,
                                              order_col,
                                              extra=[value_col])
        n = len(keys)
        ktype = t.schema.field(key_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "n_events": pa.array([], pa.int64()),
                             "ewma_scaled": pa.array([], pa.int64())})
        v = np.trunc(np.abs(np.asarray(vals, np.float64)) * 1000.0
                     + 0.5).astype(np.int64) \
            * np.where(np.asarray(vals, np.float64) < 0, -1, 1)
        starts, sizes = _group_starts(keys)
        last = starts + sizes - 1
        acc = np.zeros(len(last), np.int64)
        for k in range(window):
            src = last - k
            ok = src >= starts
            acc[ok] += v[src[ok]] * np.int64(1 << (window - 1 - k))
        return pa.table({
            key_col: t[key_col].take(pa.array(last, pa.int64())),
            "n_events": pa.array(sizes, pa.int64()),
            "ewma_scaled": pa.array(acc, pa.int64()),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def interval_union_per_key(ds, key_col: str = "user_id",
                           ts_col: str = "ts",
                           order_col: str = "event_id",
                           value_col: str = "value",
                           num_shards: int | None = None):
    """Per-key union length of VARIABLE-length intervals — the
    gaps-and-islands shape sessionize cannot express (a fixed gap is
    a constant-length special case): each event opens the interval
    ``[ts, ts + round(value*1000) ms)``; overlapping-or-touching
    intervals merge into islands and each island contributes
    ``max(end) - min(start)`` µs.  Rows with null key/ts/value or a
    non-positive value are dropped (no interval to contribute) —
    matching the SQL oracle's WHERE.

    One key-hash exchange, then per shard: one sort, a C-level
    per-key running-max of interval ends (the island detector — a new
    interval starts an island iff its start exceeds every previous
    end of its key), and reduceat aggregates per island.  Exact
    int64 µs end-to-end.

    -> Dataset(key_col, n_islands int64, union_us int64).
    """
    import pandas as pd

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[value_col])))
        t = t.filter(pc.greater(t[value_col], 0.0))
        t = t.select([key_col, ts_col, order_col, value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 173), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, us, (vals,) = _sorted_shard(t, key_col, ts_col,
                                             order_col,
                                             extra=[value_col])
        n = len(keys)
        ktype = t.schema.field(key_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "n_islands": pa.array([], pa.int64()),
                             "union_us": pa.array([], pa.int64())})
        vmilli = np.trunc(np.abs(np.asarray(vals, np.float64)) * 1000.0
                          + 0.5).astype(np.int64)
        en = us + vmilli * 1000  # µs end; value > 0 guaranteed
        starts, sizes = _group_starts(keys)
        run_start = np.zeros(n, bool)
        run_start[starts] = True
        # per-key inclusive running max of ends (C-level), shift by 1
        cm = pd.Series(en).groupby(
            pd.Series(np.repeat(np.arange(len(starts)), sizes))) \
            .cummax().to_numpy()
        pmax = np.empty(n, np.int64)
        pmax[1:] = cm[:-1]
        brk = run_start | (us > pmax)
        isl_starts = np.flatnonzero(brk)
        # union per island = max(end) - min(start); min(start) is the
        # island's first row (sorted), max(end) = cm at island's last
        isl_last = np.empty(len(isl_starts), np.int64)
        isl_last[:-1] = isl_starts[1:] - 1
        isl_last[-1] = n - 1
        spans = cm[isl_last] - us[isl_starts]
        # fold islands back to keys: island's key = key at its start
        key_run_idx = np.repeat(np.arange(len(starts)), sizes)[isl_starts]
        n_isl = np.bincount(key_run_idx, minlength=len(starts))
        uni = np.bincount(key_run_idx, weights=spans.astype(np.float64),
                          minlength=len(starts)).astype(np.int64)
        return pa.table({
            key_col: t[key_col].take(pa.array(starts, pa.int64())),
            "n_islands": pa.array(n_isl, pa.int64()),
            "union_us": pa.array(uni, pa.int64()),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")


def grouped_cusum(ds, key_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id", value_col: str = "value",
                  k_milli: int = 0, h_milli: int = 0,
                  num_shards: int | None = None):
    """Per-key one-sided CUSUM drift alarm over the event stream:
    ``S_i = max(0, S_{i-1} + (v_milli_i - k_milli))`` with alarm when
    ``S_i > h_milli``.  The recursion LOOKS sequential but obeys the
    exact identity ``S_i = C_i - min(0, min_{j<=i} C_j)`` with C the
    running sum of deviations — so the scan is two C-level cumulative
    passes (cumsum + per-key running min), no per-row Python, and the
    whole operator is reproducible by a SQL window oracle (window
    SUM + window MIN + least()).  All terms exact int64 milli-units.

    -> Dataset(key_col, n_events int64, max_cusum int64,
       n_alarms int64, first_alarm_order) — first_alarm_order is the
       ``order_col`` value of the first alarming event (null when the
       key never alarms).
    """
    import pandas as pd

    nb = num_shards or _default_shards()

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[value_col])))
        t = t.select([key_col, ts_col, order_col, value_col])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, nb, 193), pa.int64()))

    def scan(t: pa.Table) -> pa.Table:
        t, keys, _us, (vals,) = _sorted_shard(t, key_col, ts_col,
                                              order_col,
                                              extra=[value_col])
        n = len(keys)
        ktype = t.schema.field(key_col).type
        otype = t.schema.field(order_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "n_events": pa.array([], pa.int64()),
                             "max_cusum": pa.array([], pa.int64()),
                             "n_alarms": pa.array([], pa.int64()),
                             "first_alarm_order": pa.array([], otype)})
        vmilli = np.trunc(np.abs(np.asarray(vals, np.float64)) * 1000.0
                          + 0.5).astype(np.int64) \
            * np.where(np.asarray(vals, np.float64) < 0, -1, 1)
        d = vmilli - np.int64(k_milli)
        starts, sizes = _group_starts(keys)
        rid = np.repeat(np.arange(len(starts)), sizes)
        # per-key cumsum: global cumsum minus the key's prefix offset
        cs = np.cumsum(d)
        prefix = np.zeros(len(starts), np.int64)
        prefix[1:] = cs[starts[1:] - 1]
        c = cs - prefix[rid]
        runmin = pd.Series(c).groupby(pd.Series(rid)).cummin() \
            .to_numpy()
        s = c - np.minimum(runmin, 0)
        alarm = s > np.int64(h_milli)
        max_c = np.maximum.reduceat(s, starts)
        n_alarms = np.bincount(rid[alarm], minlength=len(starts))
        order_vals = t[order_col].to_numpy(zero_copy_only=False)
        first_order = np.full(len(starts), None, object)
        if alarm.any():
            a_idx = np.flatnonzero(alarm)
            a_rid = rid[a_idx]
            firsts = np.ones(len(a_rid), bool)
            firsts[1:] = a_rid[1:] != a_rid[:-1]  # a_idx sorted
            fi = a_idx[firsts]
            first_order[rid[fi]] = order_vals[fi]
        return pa.table({
            key_col: t[key_col].take(pa.array(starts, pa.int64())),
            "n_events": pa.array(sizes, pa.int64()),
            "max_cusum": pa.array(max_c, pa.int64()),
            "n_alarms": pa.array(n_alarms, pa.int64()),
            "first_alarm_order": pa.array(first_order.tolist(), otype),
        })

    return ds.map_batches(exchange, batch_format="pyarrow") \
        .groupby("kshard").map_groups(scan, batch_format="pyarrow")
