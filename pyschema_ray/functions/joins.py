"""Join operators, Ray-Data-first.

* :func:`broadcast_join` — small-side enrichment: the dimension table
  is ``ray.put`` ONCE; every map task does an Arrow C++ hash join of
  its batch against the broadcast table.  No shuffle; the fact side
  streams.  This is the right join for star-schema enrichment at any
  scale where the dim side fits a worker (the usual case).
* :func:`shuffle_join` — large-to-large: Ray Data's native hash
  partitioned ``Dataset.join`` (both sides exchange by key).  Use only
  when neither side is broadcastable; choose ``num_partitions`` ~ total
  cores.
* :func:`sessionize` — per-key event sessionization (gap-based window
  op): events shard by HASH of the entity key (bounded integer
  exchange, never a groupby on the raw near-unique key — the rule in
  dedup.py/unique.py), then ONE numpy pass per shard sessionizes ALL
  keys at once via sorted (key, ts) boundary arrays.  The per-shard
  history must fit a task; shard count is cluster-proportional.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_shards, _group_starts, _key_shards


def _with_key_shard(ds, key_col: str, num_shards: int, seed: int = 37,
                    columns: list[str] | None = None):
    """Project + attach the bounded integer exchange key.  Null entity
    keys are dropped (the raw-key groupby they replace could not order
    them either; null-key rows belong to the not_null constraint)."""
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        if columns is not None:
            t = t.select(columns)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kshard", pa.array(_key_shards(keys, num_shards, seed),
                               pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_join(ds, dim_table: pa.Table, keys, right_keys=None,
                   join_type: str = "inner"):
    """Enrich ``ds`` (fact side, streams) with ``dim_table`` (small,
    broadcast once).  ``keys``/``right_keys``: str or list[str]."""
    import ray

    if isinstance(keys, str):
        keys = [keys]
    right_keys = right_keys or keys
    if isinstance(right_keys, str):
        right_keys = [right_keys]
    dim_ref = ray.put(dim_table)

    def join_batch(t: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)  # object-store read, cached per worker
        return t.join(dim, keys=keys, right_keys=right_keys,
                      join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def shuffle_join(left, right, on, right_on=None, join_type: str = "inner",
                 num_partitions: int | None = None):
    """Large-to-large hash-partitioned join via Ray Data's native
    ``Dataset.join`` (both sides shuffle by key)."""
    import ray

    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is None:
        right_on = on
    elif isinstance(right_on, str):
        right_on = (right_on,)
    else:
        right_on = tuple(right_on)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=on, right_on=right_on)


def _session_bounds(df, key_col: str, ts_col: str, gap_seconds: float):
    """Sort a shard by (key, ts) and return the vectorized session
    decomposition for ALL keys at once: (sorted df, ts µs int64,
    new_session mask, key-run starts, key-run sizes)."""
    df = df.sort_values([key_col, ts_col], kind="stable")
    keys = df[key_col].to_numpy()
    us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    n = len(us)
    new_session = np.ones(n, dtype=bool)
    if n > 1:
        same_key = keys[1:] == keys[:-1]
        gaps_ok = (us[1:] - us[:-1]) / 1e6 <= gap_seconds
        new_session[1:] = ~(same_key & gaps_ok)
    kstarts, ksizes = _group_starts(keys)
    return df, us, new_session, kstarts, ksizes


def sessionize(ds, key_col: str, ts_col: str, gap_seconds: float,
               out_prefix: str = "session",
               num_shards: int | None = None):
    """Gap-based sessionization: events of one key, sorted by time,
    split where the inter-event gap exceeds ``gap_seconds``.  Returns
    one row per (key, session) with start/end/count.

    Execution shape: ONE bounded integer-shard exchange (hash of the
    entity key, cluster-proportional width), then a single numpy pass
    per shard computes every key's sessions together — never one
    Python/pandas call per key (at 10^8-10^9 entities a per-key group
    loop is the scale-killer this module's header rule forbids)."""
    num_shards = num_shards or _default_shards()

    def per_shard(df):
        import pandas as pd

        df, us, new_session, _, _ = _session_bounds(
            df, key_col, ts_col, gap_seconds)
        n = len(us)
        keys = df[key_col].to_numpy()
        ts_vals = df[ts_col].to_numpy().astype("datetime64[us]")
        sstarts = np.flatnonzero(new_session)
        sends = np.append(sstarts[1:], n) - 1
        s_keys = keys[sstarts]
        # per-key session ordinal: session index minus the index of the
        # key's first session (sessions inherit key-sorted order)
        ks, kz = _group_starts(s_keys)
        first_of_key = np.repeat(ks, kz)
        sess_id = np.arange(len(sstarts)) - first_of_key
        return pd.DataFrame({
            key_col: s_keys,
            f"{out_prefix}_id": sess_id,
            "start": ts_vals[sstarts],
            "end": ts_vals[sends],
            "n_events": np.append(sstarts[1:], n) - sstarts,
        })

    sharded = _with_key_shard(ds, key_col, num_shards,
                              columns=[key_col, ts_col])
    return sharded.groupby("kshard").map_groups(per_shard,
                                                batch_format="pandas")


def asof_join(left, right, key_col: str, ts_col: str,
              right_ts_col: str | None = None,
              direction: str = "backward", suffix: str = "_right",
              num_shards: int | None = None):
    """Per-key as-of join: each left row matched to the nearest right
    row of the SAME key at-or-before (``backward``) / at-or-after
    (``forward``) its timestamp.

    Ray-Data-first composition: both sides are tagged and unioned, then
    ONE bounded integer-shard exchange (hash of the entity key)
    co-locates every key's combined history; inside each shard a single
    sorted-merge ``pd.merge_asof(by=key_col)`` matches ALL keys at once
    — never one pandas call per key.  Partitioning assumption: one
    shard's combined history fits a task; the hash shard is skew-free
    for entity-id keys."""
    num_shards = num_shards or _default_shards()

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col]))
            keys = t[key_col].to_numpy(zero_copy_only=False)
            t = t.append_column(
                "kshard", pa.array(_key_shards(keys, num_shards, 37),
                                   pa.int64()))
            return t.append_column("__side", pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8()))
        return fn

    rts = right_ts_col or ts_col
    # capture the exact column sets up front so every group emits the
    # SAME schema (selecting by all-null inference would drop a genuine
    # left column that happens to be all-null for one shard)
    left_cols = [n for n in left.schema().names]
    right_cols = [n for n in right.schema().names]
    out_right = [c for c in right_cols if c != key_col]
    out_cols = left_cols + [c + suffix if c in left_cols else c
                            for c in out_right]
    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt_named = right.map_batches(tag(1), batch_format="pyarrow")

    def per_shard(df):
        import pandas as pd

        lhs = df[df["__side"] == 0][left_cols] \
            .sort_values(ts_col, kind="stable")
        rhs = df[df["__side"] == 1][[key_col] + out_right]
        if lhs.empty:
            return pd.DataFrame(columns=out_cols)
        if rhs.empty:
            return lhs.reindex(columns=out_cols)
        rhs = rhs.sort_values(rts, kind="stable")
        out = pd.merge_asof(lhs, rhs, left_on=ts_col, right_on=rts,
                            by=key_col, direction=direction,
                            suffixes=("", suffix))
        return out.reindex(columns=out_cols)

    both = lt.union(rt_named)
    return both.groupby("kshard").map_groups(per_shard,
                                             batch_format="pandas")


def session_counts(ds, key_col: str, ts_col: str, gap_seconds: float,
                   num_shards: int | None = None):
    """(key, n_sessions, n_events) per key — SQL-oracle-friendly
    projection of :func:`sessionize`.  Same one-numpy-pass-per-shard
    execution shape (the previous per-key variant emitted a 1-row
    pandas DataFrame per entity — a Python loop over 10^9 keys)."""
    num_shards = num_shards or _default_shards()

    def per_shard(df):
        import pandas as pd

        df, _, new_session, kstarts, ksizes = _session_bounds(
            df, key_col, ts_col, gap_seconds)
        keys = df[key_col].to_numpy()
        # per-key session count = number of new_session marks in the
        # key's run; one reduceat over the whole shard
        n_sessions = np.add.reduceat(new_session.astype(np.int64), kstarts)
        return pd.DataFrame({key_col: keys[kstarts],
                             "n_sessions": n_sessions,
                             "n_events": ksizes})

    sharded = _with_key_shard(ds, key_col, num_shards,
                              columns=[key_col, ts_col])
    return sharded.groupby("kshard").map_groups(per_shard,
                                                batch_format="pandas")


def broadcast_range_join_count(ds, intervals: pa.Table, ts_col: str = "ts",
                               id_col: str = "interval_id",
                               start_col: str = "start",
                               end_col: str = "end") -> pa.Table:
    """Range join (count form): events per interval [start, end) — the
    broadcast-side variant, for interval tables that fit an object-
    store copy (the common case: thousands to millions of windows
    against billions of events).

    Per batch the event timestamps are sorted ONCE and every interval's
    count comes from two vectorized ``searchsorted`` probes, so a batch
    costs O(B log B + I log B) regardless of overlap; per-batch partial
    count vectors merge by addition (tiny: one int per interval).  For
    interval tables too large to broadcast, co-partition both sides by
    time bucket (the asof_join pattern) instead — documented
    assumption, not implemented here.

    Returns a pa.Table(id_col, n_events) — interval ids with zero
    matches included.
    """
    import ray

    ids = intervals[id_col].to_numpy(zero_copy_only=False)
    starts = intervals[start_col].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    ends = intervals[end_col].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    ref = ray.put((starts, ends))

    def partial(t: pa.Table) -> pa.Table:
        s, e = ray.get(ref)
        # ALWAYS normalize to µs — a timestamp[s] column would otherwise
        # compare second-epochs against the µs interval bounds
        ts = pc.cast(t[ts_col], pa.timestamp("us"))
        us = np.sort(pc.cast(ts, pa.int64())
                     .to_numpy(zero_copy_only=False))
        counts = (np.searchsorted(us, e, side="left")
                  - np.searchsorted(us, s, side="left"))
        # only intervals this block actually overlaps (usually few):
        # the downstream exchange stays O(overlapping), not blocks × I
        nz = np.flatnonzero(counts)
        return pa.table({"idx": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    import ray.data.aggregate as A

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("idx").aggregate(A.Sum("n"))
    totals = np.zeros(len(ids), dtype=np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        totals[b["idx"].to_numpy(zero_copy_only=False)] = \
            b["sum(n)"].to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids),
                     "n_events": pa.array(totals, pa.int64())})
