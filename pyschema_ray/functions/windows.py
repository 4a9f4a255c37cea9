"""Windowed aggregates over event streams.

Tumbling windows are a plain groupby on the truncated timestamp (see
the events_hourly driver query); this module adds the overlapping
cases:

* :func:`sliding_window_aggregate` — fixed-length windows advancing by
  a smaller slide: each event belongs to exactly window/slide windows,
  exploded per batch and PARTIALLY AGGREGATED before the shuffle, so
  the exchange carries (window_start, key, partial) — cardinality
  bounded by windows × keys, never event count.

Sessionization (gap-based windows) lives in functions/joins.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sliding_window_aggregate(ds, ts_col: str = "ts",
                             key_col: str = "event_type",
                             value_col: str = "value",
                             window_s: int = 7200, slide_s: int = 3600,
                             value_scale: int = 100):
    """-> Dataset(key, window_start, sum_scaled, n_events).

    ``window_s`` must be a multiple of ``slide_s``; every event lands
    in exactly ``window_s // slide_s`` windows.  ``window_start`` is
    int64 epoch seconds; values are scaled to int64
    (``round(value * value_scale)``) so the distributed sum is exact
    and order-independent (the float-discipline rule the SQL oracles
    require).
    """
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s

    def explode_partial(t: pa.Table) -> pa.Table:
        # ALWAYS normalize to µs — a timestamp[s]/[ms] column would
        # otherwise feed wrong-unit epochs into the bucket math
        ts = pc.cast(t[ts_col], pa.timestamp("us"))
        us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        epoch = us // 1_000_000
        base = (epoch // slide_s) * slide_s
        # half_towards_infinity (= half away from zero) matches SQL round(); pc.round's default
        # half_to_even would disagree by 1 cent on exact binary halves
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t[value_col], pa.float64()), float(value_scale)),
            round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(base)
        ws = np.concatenate([base - i * slide_s for i in range(k)])
        exploded = pa.table({
            key_col: pa.array(np.tile(keys, k)),
            "window_start": pa.array(ws, pa.int64()),
            "cents": pa.array(np.tile(cents, k), pa.int64()),
        })
        # combiner: collapse to one partial row per (key, window)
        g = exploded.group_by([key_col, "window_start"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns([key_col, "window_start", "sum_scaled",
                                 "n_events"])

    pre = ds.map_batches(explode_partial, batch_format="pyarrow")
    import ray.data.aggregate as A

    agg = pre.groupby([key_col, "window_start"]).aggregate(
        A.Sum("sum_scaled"), A.Sum("n_events"))
    return agg.map_batches(
        lambda t: t.rename_columns([key_col, "window_start",
                                    "sum_scaled", "n_events"]),
        batch_format="pyarrow")


def sliding_window_ndv(ds, ts_col: str = "ts",
                       key_col: str = "event_type",
                       unit_col: str = "user_id",
                       window_s: int = 7200, slide_s: int = 3600,
                       num_shards: int | None = None):
    """EXACT distinct-``unit_col`` count per (key, sliding window) —
    "active users per 2h window sliding hourly", the streaming-metrics
    staple SQL writes as ``count(DISTINCT user) GROUP BY key,
    window``.

    Same scale discipline as :func:`sliding_window_aggregate` plus
    :func:`~pyschema_ray.functions.analytics.grouped_ndv`'s
    distinct-pair exchange: each batch explodes events into their
    ``window_s // slide_s`` windows and immediately dedups
    (key, window, unit) triples (combiner — the exchange carries
    DISTINCT triples, never events), triples co-shard on a bounded
    UNIT-hash shard (a unit's duplicates always land together, so
    cross-shard double counting is impossible), each shard dedups
    again and counts per (key, window), and a final small groupby
    sums partials (windows x keys cardinality moderate by contract).
    Null keys/units are ignored (SQL semantics).

    -> Dataset(key_col, window_start int64 epoch-s, ndv int64).
    """
    from .dedup import _default_shards, _key_shards

    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s
    num_shards = num_shards or _default_shards()

    def explode_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[unit_col])),
                             pc.is_valid(t[ts_col])))
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = (us // 1_000_000 // slide_s) * slide_s
        ws = np.concatenate([base - i * slide_s for i in range(k)])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        units = t[unit_col].to_numpy(zero_copy_only=False)
        g = pa.table({
            key_col: pa.array(np.tile(keys, k)),
            "window_start": pa.array(ws, pa.int64()),
            unit_col: pa.array(np.tile(units, k)),
        }).group_by([key_col, "window_start", unit_col]).aggregate([])
        shard = _key_shards(
            g[unit_col].to_numpy(zero_copy_only=False), num_shards, 67)
        return g.append_column("ushard", pa.array(shard, pa.int64()))

    def count_shard(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, "window_start", unit_col]).aggregate([])
        c = g.group_by([key_col, "window_start"]).aggregate(
            [(unit_col, "count")])
        return c.select([key_col, "window_start", f"{unit_col}_count"]) \
                .rename_columns([key_col, "window_start", "ndv"])

    import ray.data.aggregate as A

    partials = ds.map_batches(explode_distinct, batch_format="pyarrow") \
        .groupby("ushard").map_groups(count_shard, batch_format="pyarrow")
    out = partials.groupby([key_col, "window_start"]) \
        .aggregate(A.Sum("ndv"))
    return out.map_batches(
        lambda t: t.rename_columns([key_col, "window_start", "ndv"]),
        batch_format="pyarrow")


_PERIOD_US = {"hour": 3_600_000_000,
              "day": 86_400_000_000,
              "week": 7 * 86_400_000_000}


def dense_period_counts(ds, ts_col: str = "ts", unit: str = "hour"):
    """Time-series resample with gap fill: event counts per calendar
    period (``unit``: "hour" / "day" / "week", Arrow
    ``floor_temporal`` = SQL ``date_trunc``), with every period
    between the global min and max emitted — zero-count gaps
    included (the dense grid a forecasting / monitoring consumer
    needs; a plain groupby silently drops empty periods).

    Dataflow: per-batch period value_counts (the combiner — the
    exchange carries at most one row per period per batch), a
    period-key groupby sums partials, and ONE final single-group pass
    materializes the dense grid vectorized (np.arange over epoch-µs +
    one scatter).  The final pass sees only the AGGREGATE (time-span
    bounded — e.g. ten years of hours is 87,600 rows), never event
    rows, so it is result-sized by construction.  Periods are
    fixed-width in naive-timestamp space (no DST in timestamp[us]
    without timezone), so grid arithmetic is exact integer µs.  Null
    timestamps are dropped.

    -> Dataset(period timestamp[us], n_events int64), sorted output
    not guaranteed (sort at the consumer).
    """
    import ray.data.aggregate as A

    if unit not in _PERIOD_US:
        raise ValueError(f"unit must be one of {sorted(_PERIOD_US)}, "
                         f"got {unit!r}")
    step = _PERIOD_US[unit]

    def partial(t: pa.Table) -> pa.Table:
        col = t[ts_col]
        col = pa.chunked_array([col]) if isinstance(col, pa.Array) else col
        col = col.drop_null()
        p = pc.floor_temporal(pc.cast(col, pa.timestamp("us")),
                              unit=unit)
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        vc = pc.cast(p, pa.int64()).value_counts()
        return pa.table({
            "period_us": vc.field("values"),
            "n_events": pc.cast(vc.field("counts"), pa.int64())})

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"period": pa.array([], pa.timestamp("us")),
                             "n_events": pa.array([], pa.int64())})
        us = t["period_us"].to_numpy(zero_copy_only=False)
        n = t["n_events"].to_numpy(zero_copy_only=False)
        lo = int(us.min())
        grid = np.arange(lo, int(us.max()) + 1, step)
        dense = np.zeros(len(grid), np.int64)
        dense[(us - lo) // step] = n
        return pa.table({
            "period": pc.cast(pa.array(grid, pa.int64()),
                              pa.timestamp("us")),
            "n_events": pa.array(dense, pa.int64())})

    sparse = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("period_us").aggregate(A.Sum("n_events")) \
        .map_batches(lambda t: t.rename_columns(["period_us",
                                                 "n_events"]),
                     batch_format="pyarrow")
    # single-group final pass over the result-sized aggregate
    return sparse.repartition(1).map_batches(fill,
                                             batch_format="pyarrow",
                                             batch_size=None)
