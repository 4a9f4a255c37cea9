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
