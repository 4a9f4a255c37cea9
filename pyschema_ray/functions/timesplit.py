"""Hot-key-safe variants of the per-entity time-series operators.

The plain :func:`~pyschema_ray.functions.joins.sessionize` /
``asof_join`` exchange co-locates each key's ENTIRE history on one
hash shard — the documented fit-a-task assumption.  A single
pathological key (a 10^8-event bot user) lands wholly on one task with
no escape.  The operators here remove that assumption by exchanging on
``(key, time-bucket)`` instead: a hot key's history spreads over
``span / bucket_seconds`` shards, each bounded by the key's event rate
× ``bucket_seconds``, and the cross-bucket seams are repaired in a
SECOND, tiny exchange that carries only per-(key, bucket) summary rows
(never raw events).

Requirements and costs (the documented contract):

* ``bucket_seconds > gap_seconds`` — then sessions can only merge
  across ADJACENT bucket cuts, and the boundary-session stitch is a
  plain gap pass over per-bucket first/last sessions.
* Cost vs the plain variant: the same single pass over raw events,
  plus a second exchange whose volume is O(keys × active buckets)
  rows — use the plain variant unless hot keys are a real risk.
* Output session identity: sessions are identified by their START
  TIME, not a per-key ordinal (a global per-key ordinal would need
  every session of a key in one place — exactly the assumption this
  module exists to remove).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import pa_key_type as _pa_key_type
from .dedup import _default_shards, _group_starts, _key_hash, _key_shards


def _bucket_shards(keys, buckets: np.ndarray, num_shards: int,
                   seed: int = 67) -> np.ndarray:
    """Bounded shard id from (key, bucket) — hot keys spread across
    buckets, co-located within one."""
    h = _key_hash(keys, seed) ^ (buckets.view(np.uint64) *
                                 np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_shards)).astype(np.int64)


def sessionize_timesplit(ds, key_col: str, ts_col: str,
                         gap_seconds: float,
                         bucket_seconds: float | None = None,
                         num_shards: int | None = None):
    """Gap-based sessionization with NO one-key-fits-a-task
    assumption.  Semantics identical to
    :func:`~pyschema_ray.functions.joins.sessionize` except the output
    has no per-key ordinal ``session_id`` (see module docstring);
    returns Dataset(key, start, end, n_events), one row per session.

    Phase A: events exchange on hash(key, ts // bucket_seconds);
    each shard sessionizes every (key, bucket) run it holds in one
    numpy pass, with bucket cuts forced as session breaks.  Sessions
    NOT touching their bucket's first/last position are complete
    (their neighbours are >gap away within the same bucket) and are
    emitted directly.  Phase B: each (key, bucket)'s first/last
    session rides a key-hash exchange where one gap pass merges
    cross-cut chains (cur.start - prev.end <= gap — exactly the
    event-level rule, since those are the events adjacent to the cut).
    """
    import pandas as pd

    num_shards = num_shards or _default_shards()
    if bucket_seconds is None:
        bucket_seconds = max(float(gap_seconds) * 16.0, 3600.0)
    if bucket_seconds <= gap_seconds:
        raise ValueError("bucket_seconds must exceed gap_seconds, or "
                         "non-adjacent buckets could merge")
    bus = int(bucket_seconds * 1e6)
    gap_us = float(gap_seconds) * 1e6

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        t = t.select([key_col, ts_col])
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bucket = us // bus
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "kbshard": pa.array(
                _bucket_shards(keys, bucket, num_shards), pa.int64()),
            key_col: t[key_col],
            "bucket": pa.array(bucket, pa.int64()),
            "us": pa.array(us, pa.int64()),
        })

    def sessions_a(df):
        df = df.sort_values([key_col, "bucket", "us"], kind="stable")
        keys = df[key_col].to_numpy()
        bks = df["bucket"].to_numpy()
        us = df["us"].to_numpy()
        n = len(us)
        new_s = np.ones(n, dtype=bool)
        if n > 1:
            same = (keys[1:] == keys[:-1]) & (bks[1:] == bks[:-1])
            new_s[1:] = ~(same & (us[1:] - us[:-1] <= gap_us))
        sstart = np.flatnonzero(new_s)
        send = np.append(sstart[1:], n) - 1
        s_key = keys[sstart]
        s_bk = bks[sstart]
        s_lo = us[sstart]
        s_hi = us[send]
        s_n = send - sstart + 1
        # first/last session per (key, bucket) run
        rs, rz = _group_starts(s_key, s_bk)
        is_first = np.zeros(len(sstart), dtype=bool)
        is_first[rs] = True
        is_last = np.zeros(len(sstart), dtype=bool)
        is_last[rs + rz - 1] = True
        boundary = is_first | is_last
        # Arrow output with pinned types (sketches.pa_key_type rule)
        return pa.table({
            key_col: pa.array(s_key, type=_pa_key_type(df[key_col]),
                              from_pandas=True),
            "start_us": pa.array(s_lo, pa.int64()),
            "end_us": pa.array(s_hi, pa.int64()),
            "n_events": pa.array(s_n.astype(np.int64), pa.int64()),
            "boundary": pa.array(boundary, pa.bool_()),
        })

    phase_a = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("kbshard").map_groups(sessions_a, batch_format="pandas")
    # interior sessions are final; boundary sessions stitch.  ONE
    # consumer pattern: route every session row through the key-hash
    # exchange would double-ship interiors, so split via two cheap
    # filters over the (already small) session stream — materialize
    # once to avoid re-running phase A per consumer.
    phase_a = phase_a.materialize()

    def _session_rows(kt, keys, lo, hi, ne) -> pa.Table:
        return pa.table({
            key_col: pa.array(keys, type=kt, from_pandas=True),
            "start_us": pa.array(lo, pa.int64()),
            "end_us": pa.array(hi, pa.int64()),
            "n_events": pa.array(ne.astype(np.int64), pa.int64()),
        })

    def interior(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["boundary"])) \
                .select([key_col, "start_us", "end_us", "n_events"])

    def to_stitch(t: pa.Table) -> pa.Table:
        d = t.filter(t["boundary"])
        keys = d[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "kshard": pa.array(_key_shards(keys, num_shards, 71),
                               pa.int64()),
            key_col: d[key_col],
            "start_us": d["start_us"],
            "end_us": d["end_us"],
            "n_events": d["n_events"],
        })

    def stitch(df):
        kt = _pa_key_type(df[key_col])
        df = df.sort_values([key_col, "start_us"], kind="stable")
        keys = df[key_col].to_numpy()
        lo = df["start_us"].to_numpy()
        hi = df["end_us"].to_numpy()
        ne = df["n_events"].to_numpy()
        n = len(lo)
        new_c = np.ones(n, dtype=bool)
        if n > 1:
            same = keys[1:] == keys[:-1]
            new_c[1:] = ~(same & (lo[1:] - hi[:-1] <= gap_us))
        cs = np.flatnonzero(new_c)
        ce = np.append(cs[1:], n) - 1
        return _session_rows(kt, keys[cs], lo[cs], hi[ce],
                             np.add.reduceat(ne, cs))

    stitched = phase_a.map_batches(to_stitch, batch_format="pyarrow") \
        .groupby("kshard").map_groups(stitch, batch_format="pandas") \
        .map_batches(lambda t: t.select([key_col, "start_us", "end_us",
                                         "n_events"]),
                     batch_format="pyarrow")
    out = phase_a.map_batches(interior, batch_format="pyarrow") \
        .union(stitched)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "start": pc.cast(t["start_us"], pa.timestamp("us")),
            "end": pc.cast(t["end_us"], pa.timestamp("us")),
            "n_events": t["n_events"],
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def session_counts_timesplit(ds, key_col: str, ts_col: str,
                             gap_seconds: float,
                             bucket_seconds: float | None = None,
                             num_shards: int | None = None):
    """(key, n_sessions, n_events) per key, hot-key-safe: the final
    per-key aggregate consumes SESSION rows (one per session), not raw
    events, so even a pathological key contributes session-count rows
    bounded by its activity span / gap — vastly smaller than its event
    count.  Composition: :func:`sessionize_timesplit` -> key-hash
    exchange -> per-key sums."""
    import pandas as pd

    num_shards = num_shards or _default_shards()
    sessions = sessionize_timesplit(ds, key_col, ts_col, gap_seconds,
                                    bucket_seconds, num_shards)

    def tag(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "kshard": pa.array(_key_shards(keys, num_shards, 73),
                               pa.int64()),
            key_col: t[key_col],
            "n_events": t["n_events"],
        })

    def per_key(df):
        kt = _pa_key_type(df[key_col])
        df = df.sort_values(key_col, kind="stable")
        keys = df[key_col].to_numpy()
        ks, kz = _group_starts(keys)
        return pa.table({
            key_col: pa.array(keys[ks], type=kt, from_pandas=True),
            "n_sessions": pa.array(kz.astype(np.int64), pa.int64()),
            "n_events": pa.array(np.add.reduceat(
                df["n_events"].to_numpy(), ks).astype(np.int64),
                pa.int64()),
        })

    return sessions.map_batches(tag, batch_format="pyarrow") \
        .groupby("kshard").map_groups(per_key, batch_format="pandas")


def asof_join_timesplit(left, right, key_col: str, ts_col: str,
                        right_ts_col: str | None = None,
                        direction: str = "backward",
                        suffix: str = "_right",
                        bucket_seconds: float = 3600.0,
                        num_shards: int | None = None):
    """Per-key as-of join with NO one-key-fits-a-task assumption —
    the hot-key-safe variant of
    :func:`~pyschema_ray.functions.joins.asof_join` (same output
    contract).  Both sides co-partition by (key, ts // bucket_seconds)
    so a hot key's history spreads across its active buckets; the
    match that crosses bucket cuts (a left row whose nearest right row
    lives in an EARLIER bucket — or a later one, for ``forward``) is
    repaired by CARRY rows: per (key, bucket), the latest right row is
    pre-reduced batch-locally (a map_batches combiner, no exchange),
    one tiny key-hash exchange computes, for every LEFT-active bucket,
    the nearest right row outside it, and that single right row is
    replicated into the bucket's group for the final merge_asof.

    Cost vs the plain variant: the right side ships twice (once as
    per-bucket summaries, once raw) plus one carry row per (key,
    left-active bucket).  Use the plain variant unless hot keys are a
    real risk."""
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    num_shards = num_shards or _default_shards()
    bus = int(bucket_seconds * 1e6)
    rts = right_ts_col or ts_col

    left_schema = pa.schema(left.schema().base_schema)
    right_schema = pa.schema(right.schema().base_schema)
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    out_right = [c for c in right_cols if c != key_col]
    out_cols = left_cols + [c + suffix if c in left_cols else c
                            for c in out_right]

    def _us_of(col) -> np.ndarray:
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)

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
        return pa.nulls(n, tp)

    # ---- pass 1a: batch-local last/first right row per (key, bucket)
    keep_last = direction == "backward"

    def right_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[rts])))
        df = t.to_pandas()
        us = _us_of(t[rts])
        df["__us"] = us
        df["__bucket"] = us // bus
        df = df.sort_values("__us", kind="stable")
        df = df.drop_duplicates([key_col, "__bucket"], keep="last"
                                if keep_last else "first")
        keys = df[key_col].to_numpy()
        df["__kshard"] = _key_shards(keys, num_shards, 79)
        return pa.Table.from_pandas(df, preserve_index=False)

    # ---- pass 1b: batch-local distinct LEFT-active (key, bucket)
    def left_active(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        bucket = _us_of(t[ts_col]) // bus
        df = pd.DataFrame({key_col: keys, "__bucket": bucket})
        df = df.drop_duplicates([key_col, "__bucket"])
        n = len(df)
        # SAME schema as right_partials, value columns padded with
        # TYPED sentinels: a null-padded union would coerce the right
        # side's int64 carry values to float64 inside the pandas
        # stitch groups, corrupting values above 2^53 (the
        # _route_pair_payloads rule)
        out = pa.table({c: pa.array(df[key_col].to_numpy())
                        if c == key_col
                        else _sentinel(right_schema.field(c).type, n)
                        for c in right_cols})
        out = out.append_column("__us", pa.array(np.zeros(n, np.int64)))
        out = out.append_column(
            "__bucket", pa.array(df["__bucket"].to_numpy(), pa.int64()))
        return out.append_column(
            "__kshard", pa.array(_key_shards(df[key_col].to_numpy(),
                                             num_shards, 79), pa.int64()))

    rp = right.map_batches(right_partials, batch_format="pyarrow")
    la = left.select_columns([key_col, ts_col]) \
        .map_batches(left_active, batch_format="pyarrow")

    # ---- stitch: per key, nearest outside-bucket right row for every
    # left-active bucket (vectorized across ALL keys in the shard via
    # factorized (key, bucket) rank arrays — no per-key Python)
    def stitch(df):
        is_right = df["__side"].to_numpy() == 1
        r = df.loc[is_right]
        l = df.loc[~is_right]
        if r.empty or l.empty:
            return df.iloc[0:0]  # dtype-preserving empty
        # re-reduce batch partials to the true per-(key,bucket) row
        r = r.sort_values("__us", kind="stable")
        r = r.drop_duplicates([key_col, "__bucket"],
                              keep="last" if keep_last else "first")
        codes_all, uniq = pd.factorize(
            pd.concat([r[key_col], l[key_col]], ignore_index=True))
        rcode = codes_all[:len(r)].astype(np.int64)
        lcode = codes_all[len(r):].astype(np.int64)
        rbk = r["__bucket"].to_numpy()
        lbk = l["__bucket"].to_numpy()
        lo = min(int(rbk.min()), int(lbk.min()))
        width = max(int(rbk.max()), int(lbk.max())) - lo + 2
        rrank = rcode * width + (rbk - lo)
        lrank = lcode * width + (lbk - lo)
        order = np.argsort(rrank, kind="stable")
        rrank = rrank[order]
        if direction == "backward":
            idx = np.searchsorted(rrank, lcode * width + (lbk - lo),
                                  side="left") - 1
            ok = idx >= 0
        else:
            idx = np.searchsorted(rrank, lcode * width + (lbk - lo),
                                  side="right")
            ok = idx < len(rrank)
        idx = np.clip(idx, 0, max(len(rrank) - 1, 0))
        # same-key guard: the neighbour rank must belong to this key
        ok &= (rrank[idx] // width) == lcode
        src = order[idx[ok]]
        carry = r.iloc[src].copy()
        # carry rows adopt the LEFT bucket so exchange 2 co-locates
        # them with the left rows they serve
        carry["__bucket"] = lbk[ok]
        # reset the iloc-inherited index: downstream pandas assigns
        # align by index, and a non-range index would misalign them
        # into NaN (coercing int64 value columns to float64)
        return carry.drop(columns=["__kshard"]) \
            .assign(__kshard=_key_shards(carry[key_col].to_numpy(),
                                         num_shards, 79)) \
            .reset_index(drop=True)

    def tag_side(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column("__side", pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8()))
            return t.select(sorted(t.column_names))  # canonical order
        return fn

    stitch_in = rp.map_batches(tag_side(1), batch_format="pyarrow").union(
        la.map_batches(tag_side(0), batch_format="pyarrow"))
    carries = stitch_in.groupby("__kshard").map_groups(
        stitch, batch_format="pandas")

    # ---- exchange 2: left + right + carry rows by (key, bucket)
    pad_right = {c: left_schema.field(c).type
                 for c in left_cols if c != key_col}
    pad_left = {c: right_schema.field(c).type for c in right_cols
                if c != key_col and c not in left_cols}

    def tag2(side, ts_name):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                                 pc.is_valid(t[ts_name])))
            us = _us_of(t[ts_name])
            bucket = us // bus
            keys = t[key_col].to_numpy(zero_copy_only=False)
            pads = pad_right if side == 1 else pad_left
            for c, tp in pads.items():
                if c not in t.column_names:
                    t = t.append_column(c, _sentinel(tp, t.num_rows))
            t = t.append_column("__kbshard", pa.array(
                _bucket_shards(keys, bucket, num_shards, 83), pa.int64()))
            t = t.append_column("__bucket", pa.array(bucket, pa.int64()))
            t = t.append_column("__side", pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8()))
            # canonical order: the three union branches carry the same
            # column set in branch-specific order otherwise
            return t.select(sorted(t.column_names))
        return fn

    def carry_tag(df):
        if df.empty:
            return df.assign(__kbshard=pd.Series([], dtype=np.int64),
                             __side=pd.Series([], dtype=np.int8))
        keys = df[key_col].to_numpy()
        bucket = df["__bucket"].to_numpy().astype(np.int64)
        pads = pad_right
        for c, tp in pads.items():
            if c not in df.columns:
                # positional numpy assign — a pandas Series here would
                # align by index and NaN-coerce on non-range indices
                df = df.assign(**{c: _sentinel(tp, len(df))
                                  .to_numpy(zero_copy_only=False)})
        return df.assign(
            __kbshard=_bucket_shards(keys, bucket, num_shards, 83),
            __side=np.full(len(df), 1, np.int8))

    lt = left.map_batches(tag2(0, ts_col), batch_format="pyarrow")
    rt = right.map_batches(tag2(1, rts), batch_format="pyarrow")

    def to_arrow_like(df):
        # align carry frames to the tagged-right arrow schema, in the
        # same canonical (sorted) column order as tag2's output
        cols = sorted(c for c in df.columns
                      if c not in ("__us", "__kshard"))
        return pa.Table.from_pandas(df[cols], preserve_index=False)

    ct = carries.map_batches(carry_tag, batch_format="pandas") \
        .map_batches(to_arrow_like, batch_format="pandas")

    def per_shard(df):
        lhs = df[df["__side"] == 0][left_cols] \
            .sort_values(ts_col, kind="stable")
        rhs = df[df["__side"] == 1]
        # a carry row can duplicate a raw right row already in the
        # bucket — drop FULL-ROW dupes so merge_asof sees each once
        # (deduping on (key, ts) alone would collapse genuinely
        # distinct same-timestamp right rows the plain variant keeps)
        rhs = rhs[[key_col] + out_right].drop_duplicates()
        if lhs.empty:
            # dtype-preserving empty, same shape as the rhs.empty
            # branch (an all-object frame would mistype the block)
            return lhs.reindex(columns=out_cols)
        if rhs.empty:
            return lhs.reindex(columns=out_cols)
        r_on = rts
        if rts == ts_col:
            r_on = rts + suffix
            rhs = rhs.rename(columns={rts: r_on})
        rhs = rhs.sort_values(r_on, kind="stable")
        out = pd.merge_asof(lhs, rhs, left_on=ts_col, right_on=r_on,
                            by=key_col, direction=direction,
                            suffixes=("", suffix))
        return out.reindex(columns=out_cols)

    both = lt.union(rt).union(ct)
    return both.groupby("__kbshard").map_groups(per_shard,
                                                batch_format="pandas")
