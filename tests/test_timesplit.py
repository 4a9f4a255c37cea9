"""Hot-key-safe (time-split + stitch) sessionization: must agree with
the plain one-shard-per-key variants on every corpus, including a
pathological single key whose history would land on one task in the
plain exchange."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _events_table(seed=7, n=20_000, n_users=300, span_s=7 * 86400):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.randint(0, span_s, n) * 1_000_000) \
        .astype("timedelta64[us]")
    return pa.table({
        "user_id": pa.array(rng.randint(0, n_users, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def _collect_sessions(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows])
    return t.sort_by([("user_id", "ascending"), ("start", "ascending")])


def test_sessionize_timesplit_matches_plain():
    import ray.data

    from pyschema_ray.functions.joins import sessionize
    from pyschema_ray.functions.timesplit import sessionize_timesplit

    tbl = _events_table()
    ds = ray.data.from_arrow(tbl)
    gap = 1800.0

    plain = _collect_sessions(
        sessionize(ds, "user_id", "ts", gap)
        .map_batches(lambda d: d[["user_id", "start", "end", "n_events"]],
                     batch_format="pandas"))
    split = _collect_sessions(
        sessionize_timesplit(ray.data.from_arrow(tbl), "user_id", "ts",
                             gap, bucket_seconds=7200.0))
    assert plain.num_rows == split.num_rows
    for col in ("user_id", "start", "end", "n_events"):
        assert pc.all(pc.equal(plain[col], split[col])).as_py(), col


def test_sessionize_timesplit_hot_key():
    """One key with 200k events at 10 s spacing (every session boundary
    lands mid-bucket or at a cut): the time-split path must reproduce
    the plain path exactly even though the key's history spans ~2000
    buckets."""
    import ray.data

    from pyschema_ray.functions.joins import sessionize
    from pyschema_ray.functions.timesplit import (session_counts_timesplit,
                                                  sessionize_timesplit)

    rng = np.random.RandomState(11)
    n = 200_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # mixture of short gaps (same session) and long gaps (breaks)
    gaps_s = np.where(rng.rand(n) < 0.01,
                      rng.randint(200, 4000, n), rng.randint(1, 60, n))
    ts = base + (np.cumsum(gaps_s) * 1_000_000).astype("timedelta64[us]")
    tbl = pa.table({
        "user_id": pa.array(np.full(n, 42), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    gap = 120.0
    plain = _collect_sessions(
        sessionize(ray.data.from_arrow(tbl), "user_id", "ts", gap)
        .map_batches(lambda d: d[["user_id", "start", "end", "n_events"]],
                     batch_format="pandas"))
    split = _collect_sessions(
        sessionize_timesplit(ray.data.from_arrow(tbl), "user_id", "ts",
                             gap, bucket_seconds=600.0))
    assert plain.num_rows == split.num_rows
    for col in ("start", "end", "n_events"):
        assert pc.all(pc.equal(plain[col], split[col])).as_py(), col

    counts = pa.concat_tables(
        [b for b in session_counts_timesplit(
            ray.data.from_arrow(tbl), "user_id", "ts", gap,
            bucket_seconds=600.0).iter_batches(batch_format="pyarrow")
         if b.num_rows])
    assert counts.num_rows == 1
    assert counts["n_sessions"][0].as_py() == plain.num_rows
    assert counts["n_events"][0].as_py() == n


def test_timesplit_rejects_bucket_not_exceeding_gap():
    import pytest
    import ray.data

    from pyschema_ray.functions.timesplit import sessionize_timesplit

    ds = ray.data.from_arrow(_events_table(n=100))
    with pytest.raises(ValueError):
        sessionize_timesplit(ds, "user_id", "ts", gap_seconds=3600.0,
                             bucket_seconds=1800.0)


def test_session_counts_timesplit_matches_plain_counts():
    import ray.data

    from pyschema_ray.functions.joins import session_counts
    from pyschema_ray.functions.timesplit import session_counts_timesplit

    tbl = _events_table(seed=13, n=8000, n_users=97)
    gap = 900.0
    plain = pa.concat_tables(
        [b for b in session_counts(
            ray.data.from_arrow(tbl), "user_id", "ts", gap)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by("user_id")
    split = pa.concat_tables(
        [b for b in session_counts_timesplit(
            ray.data.from_arrow(tbl), "user_id", "ts", gap,
            bucket_seconds=3600.0)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by("user_id")
    assert plain.num_rows == split.num_rows
    for col in ("user_id", "n_sessions", "n_events"):
        assert pc.all(pc.equal(plain[col], split[col])).as_py(), col


def _asof_frames(seed=21, n_left=6000, n_right=4000, n_keys=80,
                 span_s=4 * 86400):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-05-01T00:00:00", "us")

    def mk(n, val_col):
        ts = base + (rng.randint(0, span_s, n) * 1_000_000) \
            .astype("timedelta64[us]")
        return pa.table({
            "key": pa.array(rng.randint(0, n_keys, n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            val_col: pa.array(rng.randint(0, 10**6, n), pa.int64()),
        })

    return mk(n_left, "lv"), mk(n_right, "rv")


def _collect_sorted(ds, cols):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows])
    return t.select(cols).sort_by([(c, "ascending") for c in cols])


def test_asof_join_timesplit_matches_plain_both_directions():
    import ray.data

    from pyschema_ray.functions.joins import asof_join
    from pyschema_ray.functions.timesplit import asof_join_timesplit

    lt, rt = _asof_frames()
    cols = ["key", "ts", "lv", "ts_right", "rv"]
    for direction in ("backward", "forward"):
        plain = _collect_sorted(
            asof_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                      "key", "ts", direction=direction), cols)
        split = _collect_sorted(
            asof_join_timesplit(ray.data.from_arrow(lt),
                                ray.data.from_arrow(rt), "key", "ts",
                                direction=direction,
                                bucket_seconds=7200.0), cols)
        assert plain.num_rows == split.num_rows, direction
        for c in cols:
            assert pc.all(pc.equal(plain[c], split[c])).as_py() \
                in (True, None), (direction, c)
        # null-match rows must agree too (pc.equal yields null there)
        for c in ("ts_right", "rv"):
            pn = pc.sum(pc.cast(pc.is_null(plain[c]), pa.int64())).as_py()
            sn = pc.sum(pc.cast(pc.is_null(split[c]), pa.int64())).as_py()
            assert pn == sn, (direction, c)


def test_asof_join_timesplit_hot_key_sparse_buckets():
    """One hot key with dense left events plus right events clustered
    in a few buckets far apart: most left buckets need a carry row
    from MANY buckets earlier."""
    import ray.data

    from pyschema_ray.functions.joins import asof_join
    from pyschema_ray.functions.timesplit import asof_join_timesplit

    base = np.datetime64("2024-01-01T00:00:00", "us")
    nl = 50_000
    lts = base + (np.arange(nl) * np.int64(3_000_000)) \
        .astype("timedelta64[us]")  # every 3 s for ~41 h
    left = pa.table({
        "key": pa.array(np.full(nl, 7), pa.int64()),
        "ts": pa.array(lts, pa.timestamp("us")),
        "lv": pa.array(np.arange(nl), pa.int64()),
    })
    # right rows only in hour 0 and hour 30
    rts_ = np.concatenate([
        np.arange(0, 3600, 600), 30 * 3600 + np.arange(0, 3600, 600)])
    right = pa.table({
        "key": pa.array(np.full(len(rts_), 7), pa.int64()),
        "ts": pa.array(base + (rts_ * 1_000_000).astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "rv": pa.array(np.arange(len(rts_)), pa.int64()),
    })
    cols = ["key", "ts", "lv", "ts_right", "rv"]
    plain = _collect_sorted(
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  "key", "ts"), cols)
    split = _collect_sorted(
        asof_join_timesplit(ray.data.from_arrow(left),
                            ray.data.from_arrow(right), "key", "ts",
                            bucket_seconds=3600.0), cols)
    assert plain.num_rows == split.num_rows
    for c in cols:
        assert pc.all(pc.equal(plain[c], split[c])).as_py() \
            in (True, None), c


def test_asof_timesplit_preserves_large_int64_values():
    """Regression: the stitch-phase union used to null-pad the right
    value columns for left-active marker rows, coercing carry values
    to float64 and corrupting ints above 2^53."""
    import ray.data

    from pyschema_ray.functions.timesplit import asof_join_timesplit

    base = np.datetime64("2024-01-01T00:00:00", "us")
    big = (1 << 60) + 12345  # not representable in float64
    left = pa.table({
        "key": pa.array([1, 1], pa.int64()),
        "ts": pa.array(base + np.array([7200, 10800]) * np.timedelta64(1, "s"),
                       pa.timestamp("us")),
        "lv": pa.array([0, 1], pa.int64()),
    })
    right = pa.table({
        "key": pa.array([1], pa.int64()),
        "ts": pa.array([base], pa.timestamp("us")),
        "rv": pa.array([big], pa.int64()),
    })
    out = pa.concat_tables(
        [b for b in asof_join_timesplit(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "key", "ts", bucket_seconds=3600.0)
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    # both left rows match the hour-0 right row via carry; the value
    # survives exactly
    assert out.num_rows == 2
    assert out["rv"].to_pylist() == [big, big]
    assert pa.types.is_integer(out.schema.field("rv").type)
