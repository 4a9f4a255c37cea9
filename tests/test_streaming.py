"""functions/streaming.py: incremental sessionization — batch
equality through the full actor pipeline, and the watermark / late /
reorder semantics unit-tested on the actor body itself."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from pyschema_ray.functions.streaming import (_SessionShard,
                                              streaming_sessionize)


def _events_tbl(uids, ts_secs):
    return pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(pd.to_datetime(
            [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
             for s in ts_secs])),
    })


def _batch(uids, ts_secs):
    base = 1704067200_000_000  # 2024-01-01 in µs
    return pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts_us": pa.array([base + int(s * 1e6) for s in ts_secs],
                          pa.int64()),
    })


def test_streaming_equals_batch_sessionize(tmp_path):
    rng = np.random.default_rng(17)
    n = 4000
    uids = rng.integers(0, 80, n).tolist()
    ts = np.sort(rng.integers(0, 500_000, n)).tolist()
    tbl = _events_tbl(uids, ts)
    ds = ray.data.from_arrow(tbl).repartition(13)
    got, n_late = streaming_sessionize(ds, gap_seconds=1800.0,
                                       n_shards=3)
    assert n_late == 0
    from pyschema_ray.functions.joins import sessionize
    want_ds = sessionize(ray.data.from_arrow(tbl), "user_id", "ts",
                         gap_seconds=1800.0)
    parts = [b for b in want_ds.iter_batches(batch_format="pyarrow",
                                             batch_size=None)
             if b.num_rows]
    want = pa.concat_tables(parts)
    want = pa.table({
        "user_id": want["user_id"],
        "session_id": pa.compute.cast(want["session_id"], pa.int64()),
        "start": pa.compute.cast(want["start"], pa.timestamp("us")),
        "end": pa.compute.cast(want["end"], pa.timestamp("us")),
        "n_events": pa.compute.cast(want["n_events"], pa.int64()),
    }).sort_by([("user_id", "ascending"), ("session_id", "ascending")])
    assert got.equals(want)


def test_streaming_shard_count_invariance():
    rng = np.random.default_rng(23)
    n = 1500
    uids = rng.integers(0, 40, n).tolist()
    ts = np.sort(rng.integers(0, 200_000, n)).tolist()
    tbl = _events_tbl(uids, ts)
    outs = []
    for shards in (1, 5):
        got, _ = streaming_sessionize(ray.data.from_arrow(tbl),
                                      n_shards=shards)
        outs.append(got)
    assert outs[0].equals(outs[1])


def test_actor_reorder_buffer_applies_in_sequence():
    sh = _SessionShard(gap_us=10_000_000, lateness_us=0)
    b0 = _batch([1, 1], [0, 1])
    b1 = _batch([1], [2])
    # seq 1 arrives FIRST: must wait in the buffer
    assert sh.ingest(1, b1) == 1
    assert sh.ingest(0, b0) == 0   # drains both
    out, n_late = sh.finalize()
    assert out["n_events"].to_pylist() == [3]
    assert n_late == 0


def test_actor_late_event_dropped_and_counted():
    sh = _SessionShard(gap_us=10_000_000, lateness_us=5_000_000)
    sh.ingest(0, _batch([1], [100.0]))
    # watermark = 100s - 5s = 95s; 90s is LATE, 97s is within grace
    sh.ingest(1, _batch([1, 1], [90.0, 97.0]))
    out, n_late = sh.finalize()
    assert n_late == 1
    # the 97s event merges into the open session (gap 10s)
    assert out["n_events"].to_pylist() == [2]


def test_actor_watermark_closes_unextendable_sessions():
    sh = _SessionShard(gap_us=5_000_000, lateness_us=0)
    sh.ingest(0, _batch([1], [0.0]))
    # user 2's event at t=100s pushes the watermark; user 1's open
    # session (last=0s, gap 5s) can never be extended -> closed NOW
    sh.ingest(1, _batch([2], [100.0]))
    assert len(sh.closed) == 1
    assert sh.closed[0][0] == 1
    out, _ = sh.finalize()
    assert out["user_id"].to_pylist() == [1, 2]


def test_actor_session_ids_count_up_per_user():
    sh = _SessionShard(gap_us=1_000_000, lateness_us=0)
    sh.ingest(0, _batch([7, 7, 7], [0.0, 10.0, 20.0]))  # 3 sessions
    out, _ = sh.finalize()
    assert out["session_id"].to_pylist() == [0, 1, 2]
    assert out["start"].to_pylist() == out["end"].to_pylist()


def test_window_shard_closes_and_frees_state():
    from pyschema_ray.functions.streaming import _WindowShard
    sh = _WindowShard(width_us=3_600_000_000, lateness_us=0)

    def wbatch(ts_secs, grps, cents):
        base = 1704067200_000_000
        return pa.table({
            "ts_us": pa.array([base + int(s * 1e6) for s in ts_secs],
                              pa.int64()),
            "grp": pa.array(grps, pa.string()),
            "cents": pa.array(cents, pa.int64())})

    sh.ingest(0, wbatch([10, 20], ["a", "a"], [100, 200]))
    assert len(sh.state) == 1 and not sh.emitted
    # an event two hours later closes (and frees) the first window
    sh.ingest(1, wbatch([7500], ["b"], [50]))
    assert len(sh.emitted) == 1
    assert sh.emitted[0][1] == "a" and sh.emitted[0][2] == 300
    assert len(sh.state) == 1  # only the open window remains
    out, n_late = sh.finalize()
    assert out["n_events"].to_pylist() == [2, 1]
    assert n_late == 0


def test_window_shard_late_event_excluded():
    from pyschema_ray.functions.streaming import _WindowShard
    sh = _WindowShard(width_us=3_600_000_000,
                      lateness_us=60_000_000)

    def wbatch(ts_secs, grps, cents):
        base = 1704067200_000_000
        return pa.table({
            "ts_us": pa.array([base + int(s * 1e6) for s in ts_secs],
                              pa.int64()),
            "grp": pa.array(grps, pa.string()),
            "cents": pa.array(cents, pa.int64())})

    sh.ingest(0, wbatch([10000], ["a"], [1]))
    # 9000s is > 60s behind the 10000s watermark -> late, dropped;
    # 9950s is within the grace window -> counted into the SAME
    # [7200s, 10800s) window as the 10000s event
    sh.ingest(1, wbatch([9000, 9950], ["a", "a"], [5, 7]))
    out, n_late = sh.finalize()
    assert n_late == 1
    assert out["sum_cents"].to_pylist() == [8]
    assert out["n_events"].to_pylist() == [2]


def test_streaming_cusum_state_is_o1_and_alarms_incrementally():
    from pyschema_ray.functions.streaming import _CusumShard

    def cbatch(uids, ts_secs, vmilli, orders):
        base = 1704067200_000_000
        return pa.table({
            "user_id": pa.array(uids, pa.int64()),
            "ts_us": pa.array([base + int(s * 1e6) for s in ts_secs],
                              pa.int64()),
            "order": pa.array(orders, pa.int64()),
            "vmilli": pa.array(vmilli, pa.int64())})

    sh = _CusumShard(k_milli=0, h_milli=5000, lateness_us=0)
    # S after [3000, -4000]: 3000, then 0 (clamped)
    sh.ingest(0, cbatch([1, 1], [0, 1], [3000, -4000], [0, 1]))
    assert sh.state[1][4] == 0           # no alarms yet
    # +6000 pushes S to 6000 > 5000 -> alarm fires MID-STREAM
    sh.ingest(1, cbatch([1], [2], [6000], [2]))
    assert sh.state[1][4] == 1
    assert sh.state[1][5] == 2           # first alarm at order 2
    out, _ = sh.finalize()
    assert out["max_cusum"].to_pylist() == [6000]
    # state is 6 scalars per key, regardless of event count
    assert len(sh.state) == 0


def test_streaming_cusum_carry_across_batches_matches_recursion():
    from pyschema_ray.functions.streaming import _CusumShard
    rng = np.random.default_rng(31)
    d = rng.integers(-500, 500, 200).tolist()

    def cbatch(vals, t0, o0):
        base = 1704067200_000_000
        n = len(vals)
        return pa.table({
            "user_id": pa.array([1] * n, pa.int64()),
            "ts_us": pa.array([base + (t0 + i) * 1_000_000
                               for i in range(n)], pa.int64()),
            "order": pa.array([o0 + i for i in range(n)], pa.int64()),
            "vmilli": pa.array(vals, pa.int64())})

    sh = _CusumShard(k_milli=0, h_milli=3000, lateness_us=0)
    # feed in ragged batches: 7, 50, 143
    sh.ingest(0, cbatch(d[:7], 0, 0))
    sh.ingest(1, cbatch(d[7:57], 7, 7))
    sh.ingest(2, cbatch(d[57:], 57, 57))
    out, _ = sh.finalize()
    s = 0
    mx = 0
    n_alarms = 0
    first = None
    for i, x in enumerate(d):
        s = max(0, s + x)
        mx = max(mx, s)
        if s > 3000:
            n_alarms += 1
            if first is None:
                first = i
    assert out["max_cusum"].to_pylist() == [mx]
    assert out["n_alarms"].to_pylist() == [n_alarms]
    assert out["first_alarm_order"].to_pylist() == [first]
