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

from ..sketches import pa_key_type as _pa_key_type
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
                 num_partitions: int | None = None,
                 size_hint_bytes: int | None = None,
                 target_partition_bytes: int = 256 << 20):
    """Large-to-large hash-partitioned join via Ray Data's native
    ``Dataset.join`` (both sides shuffle by key).

    Partition count is SIZE-driven when the caller supplies
    ``size_hint_bytes`` (combined input bytes, e.g. from parquet
    metadata): ``ceil(bytes / target_partition_bytes)`` with a floor
    of 8 and no CPU cap — at 100 TB the count must track data volume
    so one partition's build side fits a task's heap, while a
    CPU-proportional count (the fallback) would OOM.  Locally the
    floor keeps small inputs from paying the per-partition actor
    startup of a wide join (measured 2x on sub-10 MB joins)."""
    import math

    import ray

    if num_partitions is None:
        if size_hint_bytes is not None:
            num_partitions = max(
                8, math.ceil(size_hint_bytes / target_partition_bytes))
        else:
            num_partitions = max(
                8, int(ray.cluster_resources().get("CPU", 8)))
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
        kt = _pa_key_type(df[key_col])
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
        sess_id = np.arange(len(sstarts), dtype=np.int64) - first_of_key
        # Arrow output with pinned types — see sketches.pa_key_type
        return pa.table({
            key_col: pa.array(s_keys, type=kt, from_pandas=True),
            f"{out_prefix}_id": pa.array(sess_id, pa.int64()),
            "start": pa.array(ts_vals[sstarts], pa.timestamp("us")),
            "end": pa.array(ts_vals[sends], pa.timestamp("us")),
            "n_events": pa.array(
                (np.append(sstarts[1:], n) - sstarts).astype(np.int64),
                pa.int64()),
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

    rts = right_ts_col or ts_col
    # capture the exact column sets up front so every group emits the
    # SAME schema (selecting by all-null inference would drop a genuine
    # left column that happens to be all-null for one shard)
    left_schema = pa.schema(left.schema().base_schema)
    left_cols = list(left_schema.names)
    right_cols = [n for n in right.schema().names]
    out_right = [c for c in right_cols if c != key_col]
    out_cols = left_cols + [c + suffix if c in left_cols else c
                            for c in out_right]
    # side-missing columns are padded with TYPED SENTINELS, not nulls:
    # a null-padded int64 column coerces to float64 inside the pandas
    # map_groups and corrupts values above 2^53 (the
    # _route_pair_payloads rule).  Sentinel values are never read —
    # per_shard projects each side to its own columns.
    right_schema = pa.schema(right.schema().base_schema)
    pad_types = {c: left_schema.field(c).type
                 for c in left_cols if c != key_col}
    pad_types_left = {c: right_schema.field(c).type
                      for c in right_cols
                      if c != key_col and c not in left_cols}

    def _sentinel(tp, n: int) -> pa.Array:
        if pa.types.is_integer(tp) or pa.types.is_timestamp(tp) \
                or pa.types.is_date(tp) or pa.types.is_duration(tp):
            return pa.array(np.zeros(n, np.int64)).cast(tp)
        if pa.types.is_floating(tp):
            return pa.array(np.zeros(n, np.float64)).cast(tp)
        if pa.types.is_boolean(tp):
            return pa.array(np.zeros(n, bool))
        if pa.types.is_string(tp) or pa.types.is_large_string(tp):
            return pa.array(np.full(n, "", object), tp)
        return pa.nulls(n, tp)  # nested types: object cells, no coercion

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col]))
            keys = t[key_col].to_numpy(zero_copy_only=False)
            pads = pad_types if side == 1 else pad_types_left
            for c, tp in pads.items():
                if c not in t.column_names:
                    t = t.append_column(c, _sentinel(tp, t.num_rows))
            t = t.append_column(
                "kshard", pa.array(_key_shards(keys, num_shards, 37),
                                   pa.int64()))
            t = t.append_column("__side", pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8()))
            # canonical column order: both union sides carry the same
            # column SET but in side-specific order, which the
            # executor reports as schema divergence
            return t.select(sorted(t.column_names))
        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt_named = right.map_batches(tag(1), batch_format="pyarrow")

    def per_shard(df):
        import pandas as pd

        lhs = df[df["__side"] == 0][left_cols] \
            .sort_values(ts_col, kind="stable")
        rhs = df[df["__side"] == 1][[key_col] + out_right]
        if lhs.empty:
            # dtype-preserving empty (an all-object pd.DataFrame
            # would emit a wrongly-typed block schema); matches the
            # rhs.empty branch's shape
            return lhs.reindex(columns=out_cols)
        if rhs.empty:
            return lhs.reindex(columns=out_cols)
        # merge_asof emits only the LEFT on-column when the two time
        # columns share a name — rename the right one up front so the
        # matched timestamp survives into the output as ts<suffix>
        r_on = rts
        if rts == ts_col:
            r_on = rts + suffix
            rhs = rhs.rename(columns={rts: r_on})
        rhs = rhs.sort_values(r_on, kind="stable")
        out = pd.merge_asof(lhs, rhs, left_on=ts_col, right_on=r_on,
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
        kt = _pa_key_type(df[key_col])
        df, _, new_session, kstarts, ksizes = _session_bounds(
            df, key_col, ts_col, gap_seconds)
        keys = df[key_col].to_numpy()
        # per-key session count = number of new_session marks in the
        # key's run; one reduceat over the whole shard
        n_sessions = np.add.reduceat(new_session.astype(np.int64), kstarts)
        return pa.table({
            key_col: pa.array(keys[kstarts], type=kt, from_pandas=True),
            "n_sessions": pa.array(n_sessions, pa.int64()),
            "n_events": pa.array(ksizes.astype(np.int64), pa.int64())})

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
    interval tables too large to broadcast, use
    :func:`copartition_range_join_count` (both sides co-partitioned by
    time bucket) instead.

    Returns a pa.Table(id_col, n_events) — interval ids with zero
    matches included; degenerate (end <= start) and null-bound
    intervals are included with n_events = 0; null-id intervals are
    excluded (same contract as the co-partitioned variant).
    """
    import ray

    intervals = intervals.filter(pc.is_valid(intervals[id_col]))
    ids = intervals[id_col].to_numpy(zero_copy_only=False)
    starts = intervals[start_col].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    ends = intervals[end_col].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    # null bounds arrive as NaT -> int64 min; zero them so the probe
    # pair is an empty range instead of garbage offsets
    bounds_ok = pc.and_(pc.is_valid(intervals[start_col]),
                        pc.is_valid(intervals[end_col])) \
        .to_numpy(zero_copy_only=False)
    starts = np.where(bounds_ok, starts, 0)
    ends = np.where(bounds_ok, ends, 0)
    ref = ray.put((starts, ends))

    def partial(t: pa.Table) -> pa.Table:
        s, e = ray.get(ref)
        # ALWAYS normalize to µs — a timestamp[s] column would otherwise
        # compare second-epochs against the µs interval bounds
        ts = pc.cast(t[ts_col], pa.timestamp("us"))
        us = np.sort(pc.cast(ts, pa.int64())
                     .to_numpy(zero_copy_only=False))
        # clamp: a degenerate interval (e <= s) must count 0, not the
        # negative difference of its two probes
        counts = np.maximum(np.searchsorted(us, e, side="left")
                            - np.searchsorted(us, s, side="left"), 0)
        # only intervals this block actually overlaps (usually few):
        # the downstream exchange stays O(overlapping), not blocks × I
        nz = np.flatnonzero(counts)
        return pa.table({"idx": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    import ray.data.aggregate as A

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("idx").aggregate(A.Sum("n"))
    totals = np.zeros(len(ids), dtype=np.int64)
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        totals[b["idx"].to_numpy(zero_copy_only=False)] = \
            b["sum(n)"].to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids),
                     "n_events": pa.array(totals, pa.int64())})


def interval_overlap_pairs(ds, key_cols: list[str],
                           start_col: str = "start",
                           end_col: str = "end",
                           bucket_s: float = 3600.0):
    """Interval-overlap SELF-join: pairs of rows whose [start, end]
    intervals intersect (``a.start <= b.end AND b.start <= a.end``),
    each pair once with (key_cols of a) < (key_cols of b)
    lexicographically.

    Shape: each interval is replicated to the time BUCKETS it spans
    (``bucket_s`` wide — replication factor 1 + duration/bucket_s, so
    pick a width ≳ the typical interval); ONE bucket groupby
    co-locates everything that could overlap; per bucket a vectorized
    n×n mask finds intersecting pairs, and a pair is EMITTED ONLY in
    the bucket containing ``max(start_a, start_b)`` (the overlap
    start), so cross-bucket duplicates are impossible without a
    distinct pass.  Per-bucket cost is O(n_b^2) — the classic overlap
    join bargain; n_b is bounded by interval density × bucket width.

    Returns Dataset(<key>_a ..., <key>_b ...) pinned to the input key
    types.  Null start/end rows are dropped.
    """
    us = np.int64(int(bucket_s * 1e6))
    out_fields = []
    in_schema = pa.schema(ds.schema().base_schema)
    for side in ("a", "b"):
        for kc in key_cols:
            out_fields.append(pa.field(f"{kc}_{side}",
                                       in_schema.field(kc).type))
    out_schema = pa.schema(out_fields)

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[start_col]),
                             pc.is_valid(t[end_col])))
        st = pc.cast(pc.cast(t[start_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        en = pc.cast(pc.cast(t[end_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        b0, b1 = st // us, en // us
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(st)), reps)
        # bucket id per replicated row: b0[i] + offset within run
        off = np.arange(len(idx)) - np.repeat(
            np.cumsum(reps) - reps, reps)
        out = t.take(pa.array(idx))
        return out.append_column(
            "bucket", pa.array(b0[idx] + off, pa.int64()))

    def pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n < 2:
            return out_schema.empty_table()
        bucket = t["bucket"][0].as_py()
        st = pc.cast(pc.cast(t[start_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        en = pc.cast(pc.cast(t[end_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        # lexicographic key order -> pairs (i < j) are ordered pairs
        order = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in key_cols])
        t = t.take(order)
        onp = order.to_numpy(zero_copy_only=False)
        st, en = st[onp], en[onp]
        overlap = (st[:, None] <= en[None, :]) \
            & (st[None, :] <= en[:, None])
        # emit only in the bucket of the overlap start
        ostart = np.maximum(st[:, None], st[None, :])
        mine = (ostart // us) == bucket
        ai, bi = np.nonzero(np.triu(overlap & mine, k=1))
        cols = {}
        for kc in key_cols:
            col = t[kc]
            cols[f"{kc}_a"] = col.take(pa.array(ai))
        for kc in key_cols:
            col = t[kc]
            cols[f"{kc}_b"] = col.take(pa.array(bi))
        return pa.table(cols).cast(out_schema)

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pyarrow")


def copartition_range_join_count(events, intervals, ts_col: str = "ts",
                                 id_col: str = "interval_id",
                                 start_col: str = "start",
                                 end_col: str = "end",
                                 bucket_s: int = 3600,
                                 num_shards: int | None = None):
    """Range join (count form) for interval tables too LARGE to
    broadcast (e.g. one window per user at corpus scale) — the
    co-partitioned variant :func:`broadcast_range_join_count` documents.

    Both sides exchange ONCE, co-partitioned by time bucket: an
    interval [start, end) is replicated to every ``bucket_s``-second
    bucket it overlaps with bounds CLIPPED to the bucket, so per-bucket
    counts sum to the exact total without double counting; events go to
    their own bucket.  The shuffle key is hash(bucket) mod a
    cluster-proportional shard count (never the raw bucket id — bucket
    cardinality grows with the time span).  Inside a shard one numpy
    pass per bucket counts ALL of that bucket's intervals via two
    searchsorted probes against the bucket's sorted event times; the
    per-interval partials then sum on an id-hash shard exchange.

    Partitioning assumptions (documented contract): interval length is
    bounded (replication factor ~ length/bucket_s + 1 — pick bucket_s
    near the typical interval length) and one time-bucket shard's
    events fit a task.  Returns Dataset(id_col, n_events) with
    zero-match intervals included; degenerate (end <= start) and
    null-bound intervals ride a single zero-width replica through the
    same exchange and appear with n_events = 0 exactly like the
    broadcast variant; null-id intervals are excluded (both variants).
    Both inputs are Datasets and stream.
    """
    import pandas as pd

    num_shards = num_shards or _default_shards()
    bus = int(bucket_s) * 1_000_000
    # pin the interval Dataset: the schema() probe below executes part
    # of its upstream pipeline, and without materialize() the exchange
    # would re-execute that whole pipeline a second time (intervals
    # are often themselves derived through a groupby).  materialize()
    # keeps the blocks distributed in the object store — it does NOT
    # pull them to the driver, so "too big to broadcast" is still fine.
    intervals = intervals.materialize()
    id_type = pa.schema(intervals.schema().base_schema).field(id_col).type

    def _us(col) -> np.ndarray:
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)

    def _bshard(bucket: np.ndarray) -> np.ndarray:
        from .dedup import _key_hash
        return (_key_hash(bucket, 41) % np.uint64(num_shards)) \
            .astype(np.int64)

    # "rid" travels the exchange in the id's NATIVE type (int ids stay
    # int64 end-to-end): a cast-to-string column would make every
    # pandas shard frame carry an object column, which defeats Ray's
    # cheap block size estimation (and warns on empty blocks)
    def _rid_sentinel(n: int) -> pa.Array:
        # placeholder rid for event rows (never read — iv rows only)
        if pa.types.is_string(id_type) or pa.types.is_large_string(id_type):
            return pa.array(np.full(n, "", object), id_type)
        try:
            return pc.cast(pa.array(np.zeros(n, np.int64)), id_type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # exotic id type (binary/list/...): nulls — rid is unread
            # on event rows (ArrowNotImplementedError is NOT a subclass
            # of ArrowInvalid; catching only the latter left this path
            # dead)
            return pa.nulls(n, id_type)

    def iv_rows(t: pa.Table) -> pa.Table:
        # null-id intervals are excluded (documented contract); null
        # bounds would turn the int math into NaN floats, so zero them
        # behind a mask and route those rows — like degenerate
        # (end <= start) ones — through a single ZERO-WIDTH replica
        # (a == b -> both searchsorted probes equal -> count 0): they
        # surface in the output with n_events = 0 without a separate
        # union branch or a second pass over the interval Dataset
        t = t.filter(pc.is_valid(t[id_col]))
        bounds_ok = pc.and_(pc.is_valid(t[start_col]),
                            pc.is_valid(t[end_col])) \
            .to_numpy(zero_copy_only=False)
        def us_filled(col) -> np.ndarray:
            # fill nulls BEFORE the int cast: a nullable int64
            # to_numpy detours through float64/NaN
            c = pc.fill_null(pc.cast(col, pa.timestamp("us")),
                             pa.scalar(0, pa.timestamp("us")))
            return pc.cast(c, pa.int64()).to_numpy(zero_copy_only=False)

        s = np.where(bounds_ok, us_filled(t[start_col]), 0)
        e = np.where(bounds_ok, us_filled(t[end_col]), 0)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        live = e > s
        first = np.where(live, s // bus, 0)
        last = np.where(live, (e - 1) // bus, 0)
        counts = last - first + 1  # dead intervals: exactly 1 replica
        total = int(counts.sum())
        # bucket index per replica: first[i] + (0..counts[i]-1)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        bucket = np.repeat(first, counts) \
            + (np.arange(total) - np.repeat(starts, counts))
        rep_live = np.repeat(live, counts)
        lo = np.where(rep_live,
                      np.maximum(np.repeat(s, counts), bucket * bus), 0)
        hi = np.where(rep_live,
                      np.minimum(np.repeat(e, counts), (bucket + 1) * bus), 0)
        return pa.table({
            "bshard": pa.array(_bshard(bucket), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "side": pa.array(np.zeros(total, np.int8), pa.int8()),
            # explicit type: an all-filtered batch would infer Arrow
            # null and fail unification with sibling blocks
            "rid": pa.array(np.repeat(ids, counts), type=id_type),
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
        })

    def ev_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[ts_col]))
        us = _us(t[ts_col])
        bucket = us // bus
        n = len(us)
        return pa.table({
            "bshard": pa.array(_bshard(bucket), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            # non-null placeholder (null cells would degrade pandas
            # int64 rid to float64 inside map_groups)
            "rid": _rid_sentinel(n),
            "a": pa.array(us, pa.int64()),
            "b": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    union = intervals.map_batches(iv_rows, batch_format="pyarrow").union(
        events.select_columns([ts_col])
              .map_batches(ev_rows, batch_format="pyarrow"))

    def count_shard(t: pa.Table) -> pa.Table:
        # pyarrow-format exchange (round-5 A/B winner): the group
        # logic was already pure numpy, so skipping the
        # Arrow->pandas->Arrow hop removes both the conversion cost
        # and the object-dtype coercion hazards
        from .dedup import _group_starts, _key_shards

        rid_type = t.schema.field("rid").type
        empty = pa.table({"idshard": pa.array([], pa.int64()),
                          "rid": pa.array([], rid_type),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        side = t["side"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        ivmask = side == 0
        if not ivmask.any():
            return empty
        evmask = ~ivmask
        ets = a[evmask]
        ebk = bucket[evmask]
        order = np.lexsort((ets, ebk))
        ets, ebk = ets[order], ebk[order]
        # ONE pass: sort intervals by bucket too, walk the distinct
        # interval buckets via run boundaries (no per-bucket rescans
        # of the whole shard's interval columns)
        ivbk_raw = bucket[ivmask]
        iorder = np.argsort(ivbk_raw, kind="stable")
        ivbk = ivbk_raw[iorder]
        ilo = a[ivmask][iorder]
        ihi = t["b"].to_numpy(zero_copy_only=False)[ivmask][iorder]
        irid = t["rid"].to_numpy(zero_copy_only=False)[ivmask][iorder]
        istarts, isizes = _group_starts(ivbk)
        nn = np.empty(len(ivbk), np.int64)
        for s0, m in zip(istarts, isizes):
            bk = ivbk[s0]
            seg0, seg1 = np.searchsorted(ebk, [bk, bk + 1])
            seg = ets[seg0:seg1]
            nn[s0:s0 + m] = np.searchsorted(seg, ihi[s0:s0 + m],
                                            side="left") \
                - np.searchsorted(seg, ilo[s0:s0 + m], side="left")
        # zero-count replicas are kept: every interval has >= 1 bucket
        # replica, so zero-match intervals surface in the final sum
        # without a separate zero-row union branch (one less exchange)
        return pa.table({
            "idshard": pa.array(_key_shards(irid, num_shards, 43),
                                pa.int64()),
            "rid": pa.array(irid, type=rid_type),
            "n": pa.array(nn.astype(np.int64), pa.int64())})

    partials = union.groupby("bshard").map_groups(count_shard,
                                                  batch_format="pyarrow")

    def total_per_id(t: pa.Table) -> pa.Table:
        g = t.group_by("rid").aggregate([("n", "sum")])
        return pa.table({id_col: g["rid"],
                         "n_events": pc.cast(g["n_sum"], pa.int64())})

    out = partials.groupby("idshard").map_groups(total_per_id,
                                                 batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index(id_col), id_col,
                               pc.cast(t[id_col], id_type)),
        batch_format="pyarrow")
