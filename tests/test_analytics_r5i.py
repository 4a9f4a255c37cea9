"""Round-5i analytics: cohort_retention — multi-cohort matrix parity
with the DuckDB min-month + distinct-count oracle, null handling,
empty input."""

import numpy as np
import pyarrow as pa


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _tab(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def _events():
    # users 1-2 start in Jan, user 3 starts in Feb; user 1 skips Feb
    # and returns in Mar; nulls dropped
    stamps = ["2024-01-05", "2024-01-20", "2024-03-02",   # user 1
              "2024-01-10", "2024-02-10",                 # user 2
              "2024-02-15", "2024-03-15",                 # user 3
              "2024-02-01"]                               # null user
    ts = pa.array(np.array(stamps, dtype="datetime64[us]"),
                  pa.timestamp("us"))
    users = pa.array([1, 1, 1, 2, 2, 3, 3, None], pa.int64())
    return pa.table({"user_id": users, "ts": ts})


def test_cohort_retention_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.analytics import cohort_retention

    t = _events()
    out = _tab(cohort_retention(_ds(t), "user_id", "ts"))
    got = sorted((tuple(r.values()) for r in out.to_pylist()), key=repr)
    want = sorted((tuple(r) for r in duckdb.sql("""
        WITH e AS (
            SELECT user_id, date_trunc('month', ts) AS m FROM t
             WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        c AS (SELECT user_id, min(m) AS cohort FROM e GROUP BY user_id)
        SELECT CAST(c.cohort AS TIMESTAMP) AS cohort_month,
               CAST(e.m AS TIMESTAMP) AS activity_month,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
          FROM e JOIN c USING (user_id) GROUP BY 1, 2
    """).fetchall()), key=repr)
    assert got == want
    # spot shape: Jan cohort has 2 members, 1 retained in Feb
    # (user 2) and 1 in Mar (user 1); Feb cohort = user 3 alone
    import datetime as dt
    rows = {(r["cohort_month"], r["activity_month"]): r["n_users"]
            for r in out.to_pylist()}
    jan, feb, mar = (dt.datetime(2024, m, 1) for m in (1, 2, 3))
    assert rows[(jan, jan)] == 2
    assert rows[(jan, feb)] == 1
    assert rows[(jan, mar)] == 1
    assert rows[(feb, feb)] == 1
    assert rows[(feb, mar)] == 1
    assert (mar, mar) not in rows  # nobody STARTS in March


def test_cohort_retention_week_unit_and_empty():
    from pyschema_ray.functions.analytics import cohort_retention

    t = _events()
    out = _tab(cohort_retention(_ds(t), "user_id", "ts", unit="week"))
    assert out.num_rows >= 5  # finer unit -> more pairs
    assert sum(r["n_users"] for r in out.to_pylist()
               if r["cohort_month"] == r["activity_month"]) >= 3

    empty = _tab(cohort_retention(_ds(t.slice(0, 0), 1),
                                  "user_id", "ts"))
    assert empty is None or empty.num_rows == 0


def test_dense_period_counts_fills_gaps():
    import duckdb

    from pyschema_ray.functions.windows import dense_period_counts

    # three active hours with a 2-hour hole and a day-long hole
    stamps = ["2024-01-01T00:10:00", "2024-01-01T00:50:00",
              "2024-01-01T03:20:00", "2024-01-02T07:00:00", None]
    ts = pa.array(np.array(
        [s if s else "NaT" for s in stamps], dtype="datetime64[us]"),
        pa.timestamp("us"), from_pandas=True)
    t = pa.table({"ts": ts})
    out = _tab(dense_period_counts(_ds(t), "ts", unit="hour")) \
        .sort_by([("period", "ascending")])
    # grid spans 2024-01-01T00 .. 2024-01-02T07 inclusive = 32 hours
    assert out.num_rows == 32
    got = [(r["period"], r["n_events"]) for r in out.to_pylist()]
    want = [(r[0], r[1]) for r in duckdb.sql("""
        WITH c AS (SELECT date_trunc('hour', ts) AS h,
                          CAST(count(*) AS BIGINT) AS n
                     FROM t WHERE ts IS NOT NULL GROUP BY 1),
        b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS h FROM b)
        SELECT CAST(g.h AS TIMESTAMP), CAST(coalesce(c.n, 0) AS BIGINT)
          FROM g LEFT JOIN c USING (h) ORDER BY 1
    """).fetchall()]
    assert got == want
    counts = dict(got)
    import datetime as dt
    assert counts[dt.datetime(2024, 1, 1, 0)] == 2
    assert counts[dt.datetime(2024, 1, 1, 1)] == 0   # gap filled
    assert counts[dt.datetime(2024, 1, 1, 3)] == 1
    assert sum(v == 0 for v in counts.values()) == 32 - 3


def test_dense_period_counts_empty_and_bad_unit():
    import pytest

    from pyschema_ray.functions.windows import dense_period_counts

    ts = pa.array(np.array([], dtype="datetime64[us]"),
                  pa.timestamp("us"))
    out = _tab(dense_period_counts(_ds(pa.table({"ts": ts}), 1), "ts"))
    assert out is None or out.num_rows == 0
    with pytest.raises(ValueError):
        dense_period_counts(_ds(pa.table({"ts": ts}), 1), "ts",
                            unit="fortnight")


def test_period_totals_delta_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.analytics import period_totals_delta

    rng = np.random.default_rng(3)
    n = 500
    ts = pa.array(
        np.datetime64("2023-06-01") +
        rng.integers(0, 300 * 86400, n).astype("timedelta64[s]"),
        pa.timestamp("us"))
    t = pa.table({"ts": ts,
                  "cents": pa.array(rng.integers(-500, 10000, n),
                                    pa.int64())})
    out = _tab(period_totals_delta(_ds(t, 4), "ts", "cents",
                                   unit="month"))
    out = out.sort_by([("period", "ascending")])
    exp = duckdb.sql("""
        WITH m AS (SELECT date_trunc('month', ts) AS period,
                          sum(cents) AS total_cents
                     FROM t WHERE ts IS NOT NULL GROUP BY 1)
        SELECT CAST(period AS TIMESTAMP) AS period,
               CAST(total_cents AS BIGINT) AS total_cents,
               CAST(total_cents - lag(total_cents)
                        OVER (ORDER BY period) AS BIGINT) AS delta_cents
          FROM m ORDER BY period
    """).arrow().cast(out.schema)
    assert out.equals(exp)
    assert not out["delta_cents"][0].is_valid  # first month: NULL


def test_period_totals_delta_empty():
    from pyschema_ray.functions.analytics import period_totals_delta

    ts = pa.array(np.array([], dtype="datetime64[us]"),
                  pa.timestamp("us"))
    t = pa.table({"ts": ts, "cents": pa.array([], pa.int64())})
    out = _tab(period_totals_delta(_ds(t, 1), "ts", "cents"))
    assert out is None or out.num_rows == 0


def test_grouped_iqr_outlier_counts_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.analytics import \
        grouped_iqr_outlier_counts

    rng = np.random.default_rng(19)
    n = 800
    vals = np.where(rng.random(n) < 0.05,
                    rng.normal(0, 500, n),       # heavy tail
                    rng.normal(100, 10, n))
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n).tolist(),
                      pa.string()),
        "v": pa.array(vals, pa.float64()),
    })
    out = grouped_iqr_outlier_counts(_ds(t, 4), "g", "v")
    exp = duckdb.sql("""
        WITH q AS (SELECT g, quantile_cont(v, 0.25) AS q1,
                          quantile_cont(v, 0.75) AS q3
                     FROM t WHERE v IS NOT NULL GROUP BY 1)
        SELECT q.g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN t.v < q.q1 - 1.5 * (q.q3 - q.q1)
                              OR t.v > q.q3 + 1.5 * (q.q3 - q.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          FROM t JOIN q USING (g) WHERE t.v IS NOT NULL
         GROUP BY 1 ORDER BY 1
    """).arrow().cast(out.schema)
    assert out.equals(exp)
    assert sum(out["n_outliers"].to_pylist()) > 0


def test_grouped_iqr_outlier_counts_empty():
    from pyschema_ray.functions.analytics import \
        grouped_iqr_outlier_counts

    t = pa.table({"g": pa.array([], pa.string()),
                  "v": pa.array([], pa.float64())})
    out = grouped_iqr_outlier_counts(_ds(t, 1), "g", "v")
    assert out.num_rows == 0


def test_audience_overlap_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.analytics import audience_overlap

    rng = np.random.default_rng(23)
    n = 700
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["a", "b", "c", "d"], n).tolist(), pa.string()),
    })
    out = audience_overlap(_ds(t, 4), "user_id", "event_type")
    exp = duckdb.sql("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM t),
        tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                  FROM ut GROUP BY 1),
        pr AS (SELECT a.event_type AS ca, b.event_type AS cb,
                      CAST(count(*) AS BIGINT) AS nb
                 FROM ut a JOIN ut b ON a.user_id = b.user_id
                  AND a.event_type < b.event_type GROUP BY 1, 2)
        SELECT ta.event_type AS cat_a, tb.event_type AS cat_b,
               CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
               CAST(coalesce(pr.nb, 0) AS BIGINT) AS n_both,
               CAST(ta.n + tb.n - coalesce(pr.nb, 0) AS BIGINT)
                   AS n_union,
               CAST(coalesce(pr.nb, 0) AS DOUBLE)
                   / (ta.n + tb.n - coalesce(pr.nb, 0)) AS jaccard
          FROM tot ta JOIN tot tb ON ta.event_type < tb.event_type
          LEFT JOIN pr ON pr.ca = ta.event_type
                      AND pr.cb = tb.event_type
         ORDER BY 1, 2
    """).arrow().cast(out.schema)
    assert out.equals(exp)


def test_audience_overlap_disjoint_and_empty():
    from pyschema_ray.functions.analytics import audience_overlap

    t = pa.table({
        "user_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["x", "x", "y", "y"], pa.string()),
    })
    out = audience_overlap(_ds(t, 2), "user_id", "event_type")
    assert out.to_pydict() == {
        "cat_a": ["x"], "cat_b": ["y"], "n_a": [2], "n_b": [2],
        "n_both": [0], "n_union": [4], "jaccard": [0.0]}

    e = pa.table({"user_id": pa.array([], pa.int64()),
                  "event_type": pa.array([], pa.string())})
    assert audience_overlap(_ds(e, 1), "user_id",
                            "event_type").num_rows == 0


def test_grouped_quantiles_tdigest_rank_error_bound():
    from pyschema_ray.functions.analytics import \
        grouped_quantiles_tdigest

    rng = np.random.default_rng(41)
    n = 20_000
    groups = rng.choice(["lo", "hi"], n)
    vals = np.where(groups == "lo", rng.normal(10, 2, n),
                    rng.lognormal(3, 1, n))
    t = pa.table({"g": pa.array(groups.tolist(), pa.string()),
                  "v": pa.array(vals, pa.float64())})
    out = _tab(grouped_quantiles_tdigest(_ds(t, 6), "g", "v",
                                         qs=(0.5, 0.9, 0.99)))
    out = out.sort_by([("g", "ascending")])
    assert out.column_names == ["g", "q_0.5", "q_0.9", "q_0.99"]
    for row in out.to_pylist():
        gv = np.sort(vals[groups == row["g"]])
        for q in (0.5, 0.9, 0.99):
            est = row[f"q_{q}"]
            # empirical rank of the estimate must be within 2% of q
            rank = np.searchsorted(gv, est) / len(gv)
            assert abs(rank - q) < 0.02, (row["g"], q, rank)


def test_grouped_quantiles_tdigest_empty():
    from pyschema_ray.functions.analytics import \
        grouped_quantiles_tdigest

    t = pa.table({"g": pa.array([], pa.string()),
                  "v": pa.array([], pa.float64())})
    out = _tab(grouped_quantiles_tdigest(_ds(t, 1), "g", "v"))
    assert out is None or out.num_rows == 0


def test_benford_digit_counts_matches_reference():
    from pyschema_ray.functions.analytics import benford_digit_counts

    rng = np.random.default_rng(47)
    # log-uniform magnitudes approximately follow Benford
    vals = np.round(10 ** rng.uniform(0, 6, 5000)).astype(np.int64)
    vals = np.concatenate([vals, [-123, 0, 7]])
    t = pa.table({"cents": pa.array(vals.tolist() + [None], pa.int64())})
    out = _tab(benford_digit_counts(_ds(t, 4), "cents")) \
        .sort_by([("digit", "ascending")])
    want = {}
    for v in vals:
        v = abs(int(v))
        if v > 0:
            want[int(str(v)[0])] = want.get(int(str(v)[0]), 0) + 1
    total = sum(want.values())
    assert out["digit"].to_pylist() == sorted(want)
    assert out["n"].to_pylist() == [want[d] for d in sorted(want)]
    for d, sh in zip(out["digit"].to_pylist(),
                     out["share"].to_pylist()):
        assert sh == want[d] / total
    # rough Benford check on log-uniform data: digit 1 most frequent
    assert out["n"][0].as_py() == max(out["n"].to_pylist())


def test_benford_digit_counts_empty():
    from pyschema_ray.functions.analytics import benford_digit_counts

    t = pa.table({"cents": pa.array([0, 0, None], pa.int64())})
    out = _tab(benford_digit_counts(_ds(t, 1), "cents"))
    assert out is None or out.num_rows == 0


def test_corr_matrix_matches_numpy():
    from pyschema_ray.functions.analytics import corr_matrix

    rng = np.random.default_rng(53)
    n = 2000
    x = rng.integers(0, 100, n).astype(float)
    y = 3 * x + rng.integers(0, 50, n)            # strong positive
    z = rng.integers(0, 100, n).astype(float)     # independent
    t = pa.table({"x": pa.array(x), "y": pa.array(y * 1.0),
                  "z": pa.array(z)})
    out = corr_matrix(_ds(t, 4), ["x", "y", "z"])
    got = {(a, b): c for a, b, c in
           zip(out["col_a"].to_pylist(), out["col_b"].to_pylist(),
               out["corr"].to_pylist())}
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    ref = np.corrcoef(np.vstack([x, y, z]))
    assert abs(got[("x", "y")] - ref[0, 1]) < 1e-12
    assert abs(got[("x", "z")] - ref[0, 2]) < 1e-12
    assert got[("x", "y")] > 0.9


def test_corr_matrix_constant_column_null():
    from pyschema_ray.functions.analytics import corr_matrix

    t = pa.table({"x": pa.array([1.0, 1.0, 1.0]),
                  "y": pa.array([1.0, 2.0, 3.0])})
    out = corr_matrix(_ds(t, 1), ["x", "y"])
    assert out["corr"][0].as_py() is None


def test_grouped_geomean_matches_reference():
    import math

    from pyschema_ray.functions.analytics import grouped_geomean

    rng = np.random.default_rng(59)
    n = 300
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], n).tolist(), pa.string()),
        "c": pa.array(rng.integers(-5, 5000, n), pa.int64()),
    })
    out = _tab(grouped_geomean(_ds(t, 4), "g", "c")).sort_by("g")

    def half_away(x):
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)

    want = {}
    for g, c in zip(t["g"].to_pylist(), t["c"].to_pylist()):
        if c > 0:
            s, cnt = want.get(g, (0, 0))
            want[g] = (s + half_away(math.log(c) * 1000.0), cnt + 1)
    got = list(zip(out["g"].to_pylist(), out["n"].to_pylist(),
                   out["sum_mlog"].to_pylist()))
    assert got == [(g, c, s) for g, (s, c) in sorted(want.items())]
    for row in out.to_pylist():
        s, cnt = want[row["g"]]
        # gm within float tolerance of the quantized formula
        assert abs(row["gm"] - math.exp(s / (1000.0 * cnt))) < 1e-9
        # and within 0.2% of the true geometric mean (quantization)
        vals = [c for g2, c in zip(t["g"].to_pylist(),
                                   t["c"].to_pylist())
                if g2 == row["g"] and c > 0]
        true_gm = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert abs(row["gm"] / true_gm - 1) < 0.002
