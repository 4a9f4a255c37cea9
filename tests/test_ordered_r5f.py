"""Round-5f ordered/window + unpivot primitives: grouped_lag_delta
(row-level LAG), grouped_first_last (FIRST_VALUE/LAST_VALUE), unpivot
(melt) — duckdb window parity, ties, nulls, empties."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyschema_ray.functions.ordered import (grouped_first_last,
                                            grouped_lag_delta)
from pyschema_ray.functions.relational import unpivot


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _tab(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def _events():
    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:00:05",
         "2024-01-01T00:00:05", "2024-01-01T00:01:00",
         "2024-01-01T02:00:00", "2024-01-01T02:00:01",
         None, "2024-01-01T03:00:00"], dtype="datetime64[us]"),
        pa.timestamp("us"), from_pandas=True)
    return pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, None], pa.int64()),
        "ts": ts,
        "event_id": pa.array([10, 11, 12, 13, 20, 21, 22, 30],
                             pa.int64()),
    })


def test_grouped_lag_delta_matches_duckdb():
    import duckdb

    t = _events()
    out = _tab(grouped_lag_delta(_ds(t), "user_id", "ts", "event_id"))
    got = sorted(map(tuple, out.to_pylist() and
                     [tuple(r.values()) for r in out.to_pylist()]),
                 key=repr)
    want = sorted((tuple(r) for r in duckdb.sql("""
        SELECT user_id, event_id,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id), ts)
                   AS delta_us
          FROM t WHERE user_id IS NOT NULL AND ts IS NOT NULL
    """).fetchall()), key=repr)
    assert got == want
    # tie at equal ts: delta 0, ordered by event_id
    rows = {r["event_id"]: r["delta_us"] for r in out.to_pylist()}
    assert rows[10] is None          # first event of user 1
    assert rows[12] == 0             # tied-ts row
    assert rows[13] == 55_000_000    # 55 s later


def test_grouped_first_last_matches_duckdb():
    import duckdb

    t = _events()
    out = _tab(grouped_first_last(_ds(t), "user_id", "ts", "event_id"))
    got = sorted((tuple(r.values()) for r in out.to_pylist()), key=repr)
    want = sorted((tuple(r) for r in duckdb.sql("""
        WITH w AS (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM t WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        SELECT user_id,
               max(CASE WHEN rn_a = 1 THEN event_id END) AS first,
               max(CASE WHEN rn_d = 1 THEN event_id END) AS last,
               CAST(count(*) AS BIGINT) AS n_rows
          FROM w GROUP BY user_id
    """).fetchall()), key=repr)
    assert got == want


def test_lag_delta_empty():
    t = _events().slice(0, 0)
    out = _tab(grouped_lag_delta(_ds(t, 1), "user_id", "ts", "event_id"))
    assert out is None or out.num_rows == 0


def test_grouped_moving_sum_matches_duckdb():
    """ROWS BETWEEN 2 PRECEDING AND CURRENT ROW — frame edges, null
    values (count excluded, sum skips; all-null frame -> NULL sum)."""
    import duckdb

    from pyschema_ray.functions.ordered import grouped_moving_sum

    ts = pa.array(np.array(
        ["2024-01-01T00:00:%02d" % i for i in range(6)]
        + ["2024-01-02T00:00:00", "2024-01-02T00:00:01"],
        dtype="datetime64[us]"), pa.timestamp("us"))
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": ts,
        "oid": pa.array(list(range(8)), pa.int64()),
        "v": pa.array([10, None, 30, None, None, None, 5, 7],
                      pa.int64()),
    })
    out = _tab(grouped_moving_sum(_ds(t), "k", "ts", "oid", "v",
                                  preceding=2))
    got = sorted((tuple(r.values()) for r in out.to_pylist()), key=repr)
    want = sorted((tuple(r) for r in duckdb.sql("""
        SELECT k, oid,
               CAST(sum(v) OVER (PARTITION BY k ORDER BY ts, oid
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS moving_sum,
               CAST(count(v) OVER (PARTITION BY k ORDER BY ts, oid
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_win
          FROM t
    """).fetchall()), key=repr)
    assert got == want
    rows = {r["oid"]: (r["moving_sum"], r["n_win"])
            for r in out.to_pylist()}
    assert rows[5] == (None, 0)  # frame rows 3,4,5 all NULL
    assert rows[2] == (40, 2)    # 10 + NULL + 30


def test_interval_overlap_pairs_cross_bucket_dedup():
    """Intervals spanning several buckets: each overlapping pair is
    emitted exactly once (overlap-start-bucket rule), long+short and
    disjoint cases — against a brute-force reference."""
    from pyschema_ray.functions.joins import interval_overlap_pairs

    def mk(iv):
        st = pa.array(np.array([s for s, _ in iv],
                               dtype="datetime64[s]").astype(
                               "datetime64[us]"), pa.timestamp("us"))
        en = pa.array(np.array([e for _, e in iv],
                               dtype="datetime64[s]").astype(
                               "datetime64[us]"), pa.timestamp("us"))
        return pa.table({"k": pa.array(range(len(iv)), pa.int64()),
                         "start": st, "end": en})

    # interval 0 spans 5 buckets; 1-3 are short ones inside it;
    # 4 is disjoint
    iv = [("2024-01-01T00:30:00", "2024-01-01T05:30:00"),
          ("2024-01-01T01:10:00", "2024-01-01T01:20:00"),
          ("2024-01-01T03:10:00", "2024-01-01T03:20:00"),
          ("2024-01-01T05:00:00", "2024-01-01T06:10:00"),
          ("2024-01-02T00:00:00", "2024-01-02T00:30:00")]
    out = _tab(interval_overlap_pairs(_ds(mk(iv), 2), ["k"],
                                      bucket_s=3600.0))
    got = sorted((r["k_a"], r["k_b"]) for r in out.to_pylist())
    want = sorted(
        (i, j) for i in range(len(iv)) for j in range(i + 1, len(iv))
        if iv[i][0] <= iv[j][1] and iv[j][0] <= iv[i][1])
    assert got == want
    assert (0, 4) not in got  # disjoint stays out
    assert len(got) == len(set(got))  # exactly-once across buckets


def test_unpivot_roundtrip_and_types():
    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "a": pa.array([1.25, 2.5], pa.float64()),
        "b": pa.array([10.0, None], pa.float64()),
    })
    out = _tab(unpivot(
        _ds(t, 2), ["k"], ["a", "b"], value_fn=lambda c: pc.round(
            pc.multiply(c, 100.0), round_mode="half_towards_infinity")))
    assert out.schema.names == ["k", "measure", "value"]
    assert out.schema.field("value").type == pa.int64()
    got = sorted((tuple(r.values()) for r in out.to_pylist()), key=repr)
    assert got == sorted([(1, "a", 125), (2, "a", 250),
                          (1, "b", 1000), (2, "b", None)], key=repr)


def test_grouped_range_moving_sum_matches_duckdb():
    """RANGE BETWEEN 10s PRECEDING AND CURRENT ROW — tie peers share
    one frame (later peer rows included), time (not row-count) bounds,
    null values excluded from count, all-null frame -> NULL sum."""
    import duckdb

    from pyschema_ray.functions.ordered import grouped_range_moving_sum

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:00:05",
         "2024-01-01T00:00:05", "2024-01-01T00:00:14",
         "2024-01-01T00:00:30", "2024-01-01T00:05:00",
         "2024-01-01T00:05:08", "2024-01-02T00:00:00",
         "2024-01-02T00:00:03"],
        dtype="datetime64[us]"), pa.timestamp("us"))
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": ts,
        "eid": pa.array(list(range(9)), pa.int64()),
        "v": pa.array([10, 20, 30, 40, None, None, 7, 5, None],
                      pa.int64()),
    })
    out = _tab(grouped_range_moving_sum(_ds(t), "k", "ts", "eid", "v",
                                        preceding_us=10_000_000))
    got = sorted((tuple(r.values()) for r in out.to_pylist()), key=repr)
    want = sorted((tuple(r) for r in duckdb.sql("""
        SELECT k, eid,
               CAST(sum(v) OVER (PARTITION BY k ORDER BY ts
                    RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS range_sum,
               CAST(count(v) OVER (PARTITION BY k ORDER BY ts
                    RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n_win
          FROM t
    """).fetchall()), key=repr)
    assert got == want
    rows = {r["eid"]: (r["range_sum"], r["n_win"])
            for r in out.to_pylist()}
    # tie peers at :05 share the frame [ :00, :05 x2 ] = 10+20+30
    assert rows[1] == (60, 3) and rows[2] == (60, 3)
    # :14 sees only the :05 peers (:00 is 14s back, outside RANGE)
    assert rows[3] == (90, 3)
    # :30 frame = itself only, value NULL -> NULL sum, count 0
    assert rows[4] == (None, 0)
    # :05:08 frame = :05:00 (NULL) + itself -> 7, count 1
    assert rows[6] == (7, 1)
    # key 2 independent: :03 sees :00
    assert rows[8] == (5, 1)


def test_grouped_range_moving_sum_empty():
    from pyschema_ray.functions.ordered import grouped_range_moving_sum

    ts = pa.array(np.array([], dtype="datetime64[us]"),
                  pa.timestamp("us"))
    t = pa.table({"k": pa.array([], pa.int64()), "ts": ts,
                  "eid": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    out = _tab(grouped_range_moving_sum(_ds(t, 1), "k", "ts", "eid",
                                        "v", preceding_us=1_000_000))
    assert out is None or out.num_rows == 0


def test_transition_counts_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import transition_counts

    rng = np.random.default_rng(7)
    n = 400
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 3600, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    states = rng.choice(["click", "view", "buy", None], n,
                        p=[0.4, 0.4, 0.1, 0.1])
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "ts": ts,
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(states.tolist(), pa.string()),
    })
    out = _tab(transition_counts(_ds(t, 5), "user_id", "ts",
                                 "event_id", "event_type"))
    out = out.sort_by([("prev_state", "ascending"),
                       ("next_state", "ascending")])
    exp = duckdb.sql("""
        WITH e AS (SELECT * FROM t
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_type IS NOT NULL),
        w AS (SELECT lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_state,
                     event_type AS next_state
                FROM e)
        SELECT prev_state, next_state,
               CAST(count(*) AS BIGINT) AS n_transitions
          FROM w WHERE prev_state IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2
    """).arrow().cast(out.schema)
    assert out.equals(exp)


def test_transition_counts_null_state_bridges():
    # Null-state rows are removed BEFORE pairing, so A, NULL, B
    # yields the A->B transition (and so does the LAG-over-filtered
    # oracle form).
    from pyschema_ray.functions.ordered import transition_counts

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:00:01",
         "2024-01-01T00:00:02"], dtype="datetime64[us]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": ts,
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "event_type": pa.array(["A", None, "B"], pa.string()),
    })
    out = _tab(transition_counts(_ds(t, 2), "user_id", "ts",
                                 "event_id", "event_type"))
    assert out.to_pydict() == {"prev_state": ["A"],
                               "next_state": ["B"],
                               "n_transitions": [1]}


def test_transition_counts_empty_and_singletons():
    from pyschema_ray.functions.ordered import transition_counts

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:00:01"],
        dtype="datetime64[us]"), pa.timestamp("us"))
    # two keys, one event each: no transitions at all
    t = pa.table({
        "user_id": pa.array([1, 2], pa.int64()),
        "ts": ts,
        "event_id": pa.array([0, 1], pa.int64()),
        "event_type": pa.array(["A", "B"], pa.string()),
    })
    out = _tab(transition_counts(_ds(t, 2), "user_id", "ts",
                                 "event_id", "event_type"))
    assert out is None or out.num_rows == 0


def test_longest_streaks_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import longest_streaks

    rng = np.random.default_rng(11)
    n = 600
    # many events per (user, day) so the dedup combiner matters
    day_off = rng.integers(0, 30, n)
    sec = rng.integers(0, 86400, n)
    ts = pa.array(
        np.datetime64("2024-03-01") +
        (day_off * 86400 + sec).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
        "ts": ts,
    })
    out = _tab(longest_streaks(_ds(t, 5), "user_id", "ts")) \
        .sort_by([("user_id", "ascending")])
    exp = duckdb.sql("""
        WITH d AS (SELECT DISTINCT user_id,
                          CAST(date_trunc('day', ts) AS DATE) AS day
                     FROM t
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        r AS (SELECT user_id, day,
                     (day - DATE '1970-01-01')
                     - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS isl
                FROM d),
        s AS (SELECT user_id, isl, count(*) AS len FROM r GROUP BY 1, 2)
        SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
               CAST(max(len) AS BIGINT) AS longest_streak
          FROM s GROUP BY 1 ORDER BY 1
    """).arrow().cast(out.schema)
    assert out.equals(exp)


def test_longest_streaks_shapes():
    from pyschema_ray.functions.ordered import longest_streaks

    ts = pa.array(np.array(
        ["2024-01-01T05:00:00", "2024-01-02T23:59:59",
         "2024-01-03T00:00:00", "2024-01-07T12:00:00",
         "2024-01-07T13:00:00",  # same day twice: one active day
         "2024-02-01T00:00:00", None], dtype="datetime64[us]"),
        pa.timestamp("us"), from_pandas=True)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": ts,
    })
    out = _tab(longest_streaks(_ds(t, 3), "user_id", "ts")) \
        .sort_by([("user_id", "ascending")])
    assert out.to_pydict() == {
        "user_id": [1, 2],
        "n_active_days": [4, 1],      # 1st,2nd,3rd,7th / Feb 1
        "longest_streak": [3, 1],     # Jan 1-2-3
    }


def test_conversion_within_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import conversion_within

    rng = np.random.default_rng(29)
    n = 500
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 7 * 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": ts,
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase"], n).tolist(),
            pa.string()),
    })
    out = pa.concat_tables(
        [b for b in conversion_within(_ds(t, 5), "view", "purchase",
                                      3_600_000_000)
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows])
    assert out.num_rows == 1
    exp = duckdb.sql("""
        WITH a AS (SELECT user_id, ts FROM t
                    WHERE event_type = 'view'),
        conv AS (SELECT a.user_id,
                        CASE WHEN EXISTS (
                            SELECT 1 FROM t b
                             WHERE b.user_id = a.user_id
                               AND b.event_type = 'purchase'
                               AND b.ts > a.ts
                               AND b.ts <= a.ts + INTERVAL 1 HOUR)
                             THEN 1 ELSE 0 END AS c FROM a)
        SELECT CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(c), 0) AS BIGINT),
               CAST(count(DISTINCT user_id) AS BIGINT),
               CAST(count(DISTINCT CASE WHEN c = 1
                                   THEN user_id END) AS BIGINT)
          FROM conv
    """).fetchone()
    got = tuple(out[c][0].as_py() for c in
                ("n_from", "n_converted", "n_users_from",
                 "n_users_converted"))
    assert got == exp
    assert got[1] > 0          # some conversions exist at this seed


def test_conversion_within_tie_is_not_converted():
    from pyschema_ray.functions.ordered import conversion_within

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:00:00",   # tie: no
         "2024-01-01T01:00:00", "2024-01-01T01:30:00",   # 30m: yes
         "2024-01-02T00:00:00", "2024-01-02T02:00:00"],  # 2h: no
        dtype="datetime64[us]"), pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "ts": ts,
        "event_type": pa.array(["view", "purchase", "view",
                                "purchase", "view", "purchase"],
                               pa.string()),
    })
    out = pa.concat_tables(
        [b for b in conversion_within(_ds(t, 2), "view", "purchase",
                                      3_600_000_000)
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows])
    assert out.to_pylist()[0] == {
        "n_from": 3, "n_converted": 1,
        "n_users_from": 3, "n_users_converted": 1}


def test_top_session_paths_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import top_session_paths

    rng = np.random.default_rng(37)
    n = 600
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 3 * 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": ts,
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["a", "b", "c"], n).tolist(), pa.string()),
    })
    out = _tab(top_session_paths(_ds(t, 5), k=10,
                                 gap_us=1_800_000_000))
    out = out.sort_by([("n_sessions", "descending"),
                       ("path", "ascending")])
    exp = duckdb.sql("""
        WITH w AS (
            SELECT *, CASE WHEN lag(ts) OVER win IS NULL
                        OR date_diff('microsecond',
                                     lag(ts) OVER win, ts) > 1800000000
                      THEN 1 ELSE 0 END AS brk
              FROM t
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
                FROM w),
        p AS (SELECT user_id, sid,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
                FROM s GROUP BY 1, 2)
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
          FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 10
    """).arrow().cast(out.schema)
    assert out.equals(exp)


def test_top_session_paths_single_events():
    from pyschema_ray.functions.ordered import top_session_paths

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T02:00:00"],
        dtype="datetime64[us]"), pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": ts,
        "event_id": pa.array([0, 1], pa.int64()),
        "event_type": pa.array(["a", "a"], pa.string()),
    })
    # 2h gap -> two singleton sessions with the same path
    out = _tab(top_session_paths(_ds(t, 2), k=5))
    assert out.to_pydict() == {"path": ["a"], "n_sessions": [2]}


def test_latest_state_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import latest_state

    rng = np.random.default_rng(43)
    n = 400
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    vals = rng.normal(0, 1, n)
    vals[rng.random(n) < 0.1] = np.nan
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
        "ts": ts,
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["set", "touch", "drop"], n).tolist(),
            pa.string()),
        "value": pa.array([None if np.isnan(v) else float(v)
                           for v in vals], pa.float64()),
    })
    out = _tab(latest_state(_ds(t, 5), delete_state="drop")) \
        .sort_by([("user_id", "ascending")])
    exp = duckdb.sql("""
        WITH r AS (SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn FROM t)
        SELECT user_id, event_type AS last_event_type,
               value AS last_value
          FROM r WHERE rn = 1 AND event_type <> 'drop'
         ORDER BY user_id
    """).arrow().cast(out.schema)
    assert out.equals(exp)
    # some keys tombstoned at this seed
    assert out.num_rows < 50


def test_latest_state_tombstone_then_revive():
    from pyschema_ray.functions.ordered import latest_state

    ts = pa.array(np.array(
        ["2024-01-01T00:00:00", "2024-01-01T01:00:00",
         "2024-01-01T02:00:00"], dtype="datetime64[us]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": ts,
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "event_type": pa.array(["set", "drop", "set"], pa.string()),
        "value": pa.array([1.0, None, 3.0], pa.float64()),
    })
    out = _tab(latest_state(_ds(t, 2), delete_state="drop"))
    assert out.to_pydict() == {"user_id": [1],
                               "last_event_type": ["set"],
                               "last_value": [3.0]}
    # delete wins when it is last
    t2 = t.slice(0, 2)
    out2 = _tab(latest_state(_ds(t2, 2), delete_state="drop"))
    assert out2 is None or out2.num_rows == 0


def test_gap_stddev_by_state_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import gap_stddev_by_state

    rng = np.random.default_rng(67)
    n = 500
    ts = pa.array(
        np.datetime64("2024-01-01") +
        (rng.integers(0, 5 * 86400, n) * 1_000_000
         + rng.integers(0, 1_000_000, n)).astype("timedelta64[us]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "ts": ts,
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["a", "b"], n).tolist(), pa.string()),
    })
    out = gap_stddev_by_state(_ds(t, 5))
    exp = duckdb.sql("""
        WITH d AS (SELECT event_type,
                          date_diff('second',
                                    lag(ts) OVER (
                                        PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id),
                                    ts) AS g
                     FROM t),
        v AS (SELECT event_type, CAST(g AS HUGEINT) AS x
                FROM d WHERE g IS NOT NULL),
        m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS sx, sum(x*x) AS sxx FROM v GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
               CASE WHEN n < 2 THEN NULL
                    ELSE sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                              / CAST(n*(n-1) AS DOUBLE)) END
                   AS stddev_samp,
               sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                    / CAST(n*n AS DOUBLE)) AS stddev_pop
          FROM m ORDER BY 1
    """).arrow().cast(out.schema)
    assert out.equals(exp)


def test_events_before_anchor_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import events_before_anchor

    rng = np.random.default_rng(71)
    n = 400
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": ts,
        "event_type": pa.array(
            rng.choice(["signup", "view", "buy"], n,
                       p=[0.1, 0.6, 0.3]).tolist(), pa.string()),
    })
    out = _tab(events_before_anchor(_ds(t, 5), "signup")) \
        .sort_by([("event_type", "ascending")])
    exp = duckdb.sql("""
        WITH s AS (SELECT user_id, min(ts) AS sig FROM t
                    WHERE event_type = 'signup' GROUP BY 1)
        SELECT t.event_type,
               CAST(coalesce(sum(CASE WHEN s.sig IS NOT NULL
                                  AND t.ts < s.sig
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_before,
               CAST(coalesce(sum(CASE WHEN s.sig IS NULL
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_no_anchor,
               CAST(count(*) AS BIGINT) AS n_events
          FROM t LEFT JOIN s USING (user_id)
         GROUP BY 1 ORDER BY 1
    """).arrow().cast(out.schema)
    assert out.equals(exp)
    assert sum(out["n_before"].to_pylist()) > 0


def test_rolling_retention_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.ordered import rolling_retention

    rng = np.random.default_rng(73)
    n = 500
    ts = pa.array(
        np.datetime64("2024-01-01") +
        rng.integers(0, 60 * 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": ts,
    })
    out = _tab(rolling_retention(_ds(t, 5))).sort_by("week")
    exp = duckdb.sql("""
        WITH d AS (SELECT DISTINCT user_id,
                          CAST(date_trunc('week', ts) AS DATE) AS w
                     FROM t)
        SELECT CAST(a.w AS TIMESTAMP) AS week,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(coalesce(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM d b
                         WHERE b.user_id = a.user_id
                           AND b.w = a.w + 7)
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_retained
          FROM d a GROUP BY 1 ORDER BY 1
    """).arrow().cast(out.schema)
    assert out.equals(exp)
    assert sum(out["n_retained"].to_pylist()) > 0
