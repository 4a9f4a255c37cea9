"""Incremental (streaming) sessionization over ordered micro-batches.

The batch engine answers "what were the sessions" after the corpus
lands; a TRAINING-DATA FEED needs sessions AS THEY CLOSE — state
carried across micro-batches, watermarks deciding when a session can
never be extended again, late arrivals accounted rather than
silently merged.  This is the one shape the Dataset API genuinely
cannot express (shared mutable per-key state across an ordered
stream), so it drops to raw Ray actors exactly as the build brief
licenses:

* **Per-shard stateful actors** (:class:`_SessionShard`): each holds
  the open-session dict for its user-hash shard.  Micro-batches
  arrive tagged with a SEQUENCE NUMBER and are applied in order via
  a reorder buffer (bounded by in-flight blocks), so parallel
  routing tasks cannot reorder the stream.
* **Routing tasks** move data worker->actor: the driver submits one
  route task per time-sorted block REF and never materializes rows.
* **Watermark** = max event time seen by the shard minus the allowed
  lateness.  An open session closes once the watermark passes
  ``last_event + gap`` (no on-time event can extend it — any such
  event would start a new session anyway).  Events below the
  watermark are counted late and dropped, never merged.
* **Within a batch everything is vectorized** — run boundaries and
  gap splits exactly as the batch sessionizer; Python bookkeeping is
  O(unique users per batch), not O(events).

With in-order feed and zero lateness the emitted sessions are
BIT-EQUAL to the batch sessionize (the `streaming_user_sessions`
driver query is hash-checked against the same SQL oracle as
`user_sessions`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _group_starts, _key_shards

_GAP_SEED = 211


def _sessions_table(rows: list) -> pa.Table:
    if not rows:
        return pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_id": pa.array([], pa.int64()),
            "start": pa.array([], pa.timestamp("us")),
            "end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64())})
    u, sid, st, en, n = zip(*rows)
    return pa.table({
        "user_id": pa.array(u, pa.int64()),
        "session_id": pa.array(sid, pa.int64()),
        "start": pa.array(np.asarray(st, "datetime64[us]")),
        "end": pa.array(np.asarray(en, "datetime64[us]")),
        "n_events": pa.array(n, pa.int64())})


class _SessionShard:
    """Ray actor body: open-session state + reorder buffer for one
    user-hash shard.  ``ingest(seq, table)`` applies contiguous
    sequence numbers in order; ``finalize()`` flushes remaining open
    sessions and returns (sessions_table, n_late)."""

    def __init__(self, gap_us: int, lateness_us: int):
        self.gap = int(gap_us)
        self.late_allow = int(lateness_us)
        self.open: dict = {}      # user -> [start_us, last_us, n]
        self.sid: dict = {}       # user -> next session index
        self.closed: list = []    # (user, sid, start, end, n)
        self.buffer: dict = {}    # seq -> pa.Table
        self.next_seq = 0
        self.max_ts = -(1 << 62)
        self.n_late = 0

    def ingest(self, seq: int, t) -> int:
        self.buffer[seq] = t
        while self.next_seq in self.buffer:
            self._apply(self.buffer.pop(self.next_seq))
            self.next_seq += 1
        return len(self.buffer)

    def _close(self, user, cur):
        k = self.sid.get(user, 0)
        self.sid[user] = k + 1
        self.closed.append((user, k, cur[0], cur[1], cur[2]))

    def _apply(self, t: pa.Table):
        if t.num_rows == 0:
            return
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts_us", "ascending")])
        t = t.take(idx)
        users = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        # an event is late iff it precedes the watermark ALREADY
        # established by earlier batches (this batch advances the
        # watermark only after it applies)
        late_mask = ts < (self.max_ts - self.late_allow)
        self.n_late += int(late_mask.sum())
        self.max_ts = max(self.max_ts, int(ts.max()))
        keep = ~late_mask
        users, ts = users[keep], ts[keep]
        if len(users):
            starts, sizes = _group_starts(users)
            for r in range(len(starts)):
                s, e = starts[r], starts[r] + sizes[r]
                u = int(users[s])
                uts = ts[s:e]
                cur = self.open.pop(u, None)
                splits = np.flatnonzero(np.diff(uts) > self.gap) + 1
                bounds = np.concatenate(
                    ([0], splits, [len(uts)])).astype(np.int64)
                for b in range(len(bounds) - 1):
                    lo, hi = int(bounds[b]), int(bounds[b + 1])
                    if b == 0 and cur is not None \
                            and int(uts[lo]) - cur[1] <= self.gap:
                        cur = [cur[0], int(uts[hi - 1]),
                               cur[2] + (hi - lo)]
                        continue
                    if cur is not None:
                        self._close(u, cur)
                    cur = [int(uts[lo]), int(uts[hi - 1]), hi - lo]
                self.open[u] = cur
        # watermark pass: close opens that can never extend again
        wm = self.max_ts - self.late_allow
        for u, cur in list(self.open.items()):
            if wm - cur[1] > self.gap:
                del self.open[u]
                self._close(u, cur)

    def finalize(self):
        for u in sorted(self.open):
            self._close(u, self.open.pop(u))
        out = self.closed
        self.closed = []
        return _sessions_table(sorted(out)), self.n_late


def streaming_sessionize(ds, key_col: str = "user_id",
                         ts_col: str = "ts",
                         gap_seconds: float = 1800.0,
                         allowed_lateness_s: float = 0.0,
                         n_shards: int = 4):
    """Run the stream: time-sort ``ds``, submit one ROUTING TASK per
    sorted block (data moves object-store -> task -> actor, never the
    driver), apply per shard in sequence order, finalize.

    Returns (sessions pa.Table(user_id, session_id, start, end,
    n_events), total_late_events).  With ``allowed_lateness_s=0`` and
    an in-order feed this equals the batch sessionize exactly.
    """
    import ray

    gap_us = int(round(gap_seconds * 1_000_000))
    late_us = int(round(allowed_lateness_s * 1_000_000))
    Shard = ray.remote(_SessionShard)
    actors = [Shard.remote(gap_us, late_us) for _ in range(n_shards)]

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        return pa.table({
            "user_id": pc.cast(t[key_col], pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64())})

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow") \
        .sort("ts_us")

    @ray.remote
    def route(block, seq, actors):
        t = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = _key_shards(users, len(actors), _GAP_SEED)
        waits = []
        for a, actor in enumerate(actors):
            sub = t.filter(pa.array(shard == a))
            waits.append(actor.ingest.remote(seq, sub))
        ray.get(waits)  # backpressure: seq applied before task exits
        return t.num_rows

    bundles = sorted_ds.iter_internal_ref_bundles()
    pending = []
    seq = 0
    for bundle in bundles:
        for block_ref, _meta in bundle.blocks:
            pending.append(route.remote(block_ref, seq, actors))
            seq += 1
            if len(pending) > 2 * len(actors):  # bounded in-flight
                ray.get(pending.pop(0))
    ray.get(pending)

    parts = ray.get([a.finalize.remote() for a in actors])
    tables = [p[0] for p in parts if p[0].num_rows]
    n_late = sum(p[1] for p in parts)
    out = pa.concat_tables(tables) if tables else _sessions_table([])
    return out.sort_by([("user_id", "ascending"),
                        ("session_id", "ascending")]), n_late


class _WindowShard:
    """Actor body for streaming tumbling-window aggregates: state is
    {(window_start_us, group) -> [sum_cents, n]} for the windows of
    one window-hash shard; a window closes (emits + frees state) the
    moment the shard's watermark passes its end — the per-shard max
    is a lower bound of the global stream position under in-order
    feed, so closing on it is safe."""

    def __init__(self, width_us: int, lateness_us: int):
        self.width = int(width_us)
        self.late_allow = int(lateness_us)
        self.state: dict = {}
        self.emitted: list = []
        self.buffer: dict = {}
        self.next_seq = 0
        self.max_ts = -(1 << 62)
        self.n_late = 0

    def ingest(self, seq: int, t) -> int:
        self.buffer[seq] = t
        while self.next_seq in self.buffer:
            self._apply(self.buffer.pop(self.next_seq))
            self.next_seq += 1
        return len(self.buffer)

    def _apply(self, t: pa.Table):
        if t.num_rows == 0:
            return
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        late = ts < (self.max_ts - self.late_allow)
        self.n_late += int(late.sum())
        self.max_ts = max(self.max_ts, int(ts.max()))
        keep = ~late
        ts = ts[keep]
        groups = t["grp"].to_numpy(zero_copy_only=False)[keep]
        cents = t["cents"].to_numpy(zero_copy_only=False)[keep]
        win = (ts // self.width) * self.width
        # one C-level group_by per batch, then O(distinct) dict folds
        g = pa.table({
            "w": pa.array(win, pa.int64()),
            "grp": pa.array(groups),
            "c": pa.array(cents, pa.int64()),
            "one": pa.array(np.ones(len(win), np.int64)),
        }).group_by(["w", "grp"]).aggregate([("c", "sum"),
                                             ("one", "sum")])
        for w, grp, c, n in zip(g["w"].to_pylist(),
                                g["grp"].to_pylist(),
                                g["c_sum"].to_pylist(),
                                g["one_sum"].to_pylist()):
            cur = self.state.setdefault((w, grp), [0, 0])
            cur[0] += c
            cur[1] += n
        wm = self.max_ts - self.late_allow
        for (w, grp) in [k for k in self.state
                         if k[0] + self.width <= wm]:
            c, n = self.state.pop((w, grp))
            self.emitted.append((w, grp, c, n))

    def finalize(self):
        for (w, grp), (c, n) in sorted(self.state.items()):
            self.emitted.append((w, grp, c, n))
        self.state = {}
        out = self.emitted
        self.emitted = []
        if not out:
            return pa.table({
                "window_start": pa.array([], pa.timestamp("us")),
                "grp": pa.array([], pa.string()),
                "sum_cents": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())}), self.n_late
        w, grp, c, n = zip(*sorted(out))
        return pa.table({
            "window_start": pa.array(np.asarray(w, "datetime64[us]")),
            "grp": pa.array(grp),
            "sum_cents": pa.array(c, pa.int64()),
            "n_events": pa.array(n, pa.int64())}), self.n_late


def streaming_tumbling_counts(ds, ts_col: str = "ts",
                              group_col: str = "event_type",
                              value_col: str = "value",
                              width_s: float = 3600.0,
                              allowed_lateness_s: float = 0.0,
                              n_shards: int = 4):
    """Streaming tumbling-window (sum_cents, n) per (window, group):
    the incremental twin of the batch events_hourly aggregate, built
    on the same routing/actor/watermark machinery as
    :func:`streaming_sessionize` but sharded by WINDOW hash so a
    window's whole state lives (and dies) on one actor.

    Returns (pa.Table(window_start, grp, sum_cents, n_events),
    n_late)."""
    import ray

    from .lm import _round_half_away

    width_us = int(round(width_s * 1_000_000))
    late_us = int(round(allowed_lateness_s * 1_000_000))
    Shard = ray.remote(_WindowShard)
    actors = [Shard.remote(width_us, late_us) for _ in range(n_shards)]

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[group_col])))
        v = t[value_col].to_numpy(zero_copy_only=False)
        cents = _round_half_away(np.asarray(v, np.float64) * 100.0) \
            .astype(np.int64)
        return pa.table({
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "grp": t[group_col],
            "cents": pa.array(cents, pa.int64())})

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow") \
        .sort("ts_us")

    @ray.remote
    def route(block, seq, actors, width_us):
        t = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        win = (ts // width_us).astype(np.uint64)
        shard = _key_shards(win.astype(np.int64), len(actors),
                            _GAP_SEED + 1)
        waits = [actor.ingest.remote(seq, t.filter(pa.array(shard == a)))
                 for a, actor in enumerate(actors)]
        ray.get(waits)
        return t.num_rows

    pending = []
    seq = 0
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, _meta in bundle.blocks:
            pending.append(route.remote(block_ref, seq, actors,
                                        width_us))
            seq += 1
            if len(pending) > 2 * len(actors):
                ray.get(pending.pop(0))
    ray.get(pending)

    parts = ray.get([a.finalize.remote() for a in actors])
    tables = [p[0] for p in parts if p[0].num_rows]
    n_late = sum(p[1] for p in parts)
    if tables:
        out = pa.concat_tables(tables).sort_by(
            [("grp", "ascending"), ("window_start", "ascending")])
    else:
        out = parts[0][0]
    return out, n_late


class _CusumShard:
    """Actor body for the streaming CUSUM monitor: per-key state is
    exactly THREE integers (cumulative deviation C, its running min
    M, the running max of S = C - min(M, 0)) plus alarm bookkeeping —
    O(1) per key, courtesy of the same identity the batch operator
    vectorizes (functions/ordered.py::grouped_cusum).  Sequence-
    ordered ingest like the other shards."""

    def __init__(self, k_milli: int, h_milli: int, lateness_us: int):
        self.k = int(k_milli)
        self.h = int(h_milli)
        self.late_allow = int(lateness_us)
        # user -> [C, runmin, max_s, n_events, n_alarms, first_order]
        self.state: dict = {}
        self.buffer: dict = {}
        self.next_seq = 0
        self.max_ts = -(1 << 62)
        self.n_late = 0

    def ingest(self, seq: int, t) -> int:
        self.buffer[seq] = t
        while self.next_seq in self.buffer:
            self._apply(self.buffer.pop(self.next_seq))
            self.next_seq += 1
        return len(self.buffer)

    def _apply(self, t: pa.Table):
        if t.num_rows == 0:
            return
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts_us", "ascending"),
                                            ("order", "ascending")])
        t = t.take(idx)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        late = ts < (self.max_ts - self.late_allow)
        self.n_late += int(late.sum())
        self.max_ts = max(self.max_ts, int(ts.max()))
        keep = ~late
        users = t["user_id"].to_numpy(zero_copy_only=False)[keep]
        vmilli = t["vmilli"].to_numpy(zero_copy_only=False)[keep]
        orders = t["order"].to_numpy(zero_copy_only=False)[keep]
        if not len(users):
            return
        d = vmilli - np.int64(self.k)
        starts, sizes = _group_starts(users)
        for r in range(len(starts)):
            s, e = starts[r], starts[r] + sizes[r]
            u = int(users[s])
            st = self.state.setdefault(
                u, [0, 0, 0, 0, 0, None])
            c_local = st[0] + np.cumsum(d[s:e])
            runmin = np.minimum(np.minimum.accumulate(c_local), st[1])
            s_vec = c_local - np.minimum(runmin, 0)
            alarms = s_vec > self.h
            if alarms.any():
                if st[5] is None:
                    st[5] = int(orders[s + int(np.argmax(alarms))])
                st[4] += int(alarms.sum())
            st[2] = max(st[2], int(s_vec.max()))
            st[3] += e - s
            st[0] = int(c_local[-1])
            st[1] = int(runmin[-1])

    def finalize(self):
        rows = sorted(self.state.items())
        self.state = {}
        if not rows:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "max_cusum": pa.array([], pa.int64()),
                "n_alarms": pa.array([], pa.int64()),
                "first_alarm_order": pa.array([], pa.int64())}), \
                self.n_late
        u = [r[0] for r in rows]
        st = [r[1] for r in rows]
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "n_events": pa.array([x[3] for x in st], pa.int64()),
            "max_cusum": pa.array([x[2] for x in st], pa.int64()),
            "n_alarms": pa.array([x[4] for x in st], pa.int64()),
            "first_alarm_order": pa.array([x[5] for x in st],
                                          pa.int64())}), self.n_late


def streaming_cusum(ds, key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    value_col: str = "value",
                    k_milli: int = 0, h_milli: int = 0,
                    allowed_lateness_s: float = 0.0,
                    n_shards: int = 4):
    """Streaming per-key CUSUM monitor on the shard-actor framework:
    O(1) integer state per key, alarms observable AS THE STREAM RUNS
    (the batch operator only answers afterwards).  In-order feed
    reproduces the batch grouped_cusum exactly, so the driver query
    shares its SQL window oracle.

    Returns (pa.Table(user_id, n_events, max_cusum, n_alarms,
    first_alarm_order), n_late)."""
    import ray

    from .lm import _round_half_away

    late_us = int(round(allowed_lateness_s * 1_000_000))
    Shard = ray.remote(_CusumShard)
    actors = [Shard.remote(k_milli, h_milli, late_us)
              for _ in range(n_shards)]

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[value_col])))
        v = t[value_col].to_numpy(zero_copy_only=False)
        vm = _round_half_away(np.asarray(v, np.float64) * 1000.0) \
            .astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t[key_col], pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "order": pc.cast(t[order_col], pa.int64()),
            "vmilli": pa.array(vm, pa.int64())})

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow") \
        .sort(["ts_us", "order"])

    @ray.remote
    def route(block, seq, actors):
        t = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = _key_shards(users, len(actors), _GAP_SEED + 2)
        ray.get([actor.ingest.remote(seq,
                                     t.filter(pa.array(shard == a)))
                 for a, actor in enumerate(actors)])
        return t.num_rows

    pending = []
    seq = 0
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, _meta in bundle.blocks:
            pending.append(route.remote(block_ref, seq, actors))
            seq += 1
            if len(pending) > 2 * len(actors):
                ray.get(pending.pop(0))
    ray.get(pending)

    parts = ray.get([a.finalize.remote() for a in actors])
    tables = [p[0] for p in parts if p[0].num_rows]
    n_late = sum(p[1] for p in parts)
    out = pa.concat_tables(tables) if tables else parts[0][0]
    return out.sort_by([("user_id", "ascending")]), n_late
