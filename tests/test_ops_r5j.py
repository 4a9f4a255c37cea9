"""Round-5j entry-query edge cases, each compared against its own
oracle_sql() run by DuckDB on the same tiny fixture: weighted-median
boundary semantics, Gini tie invariance across many blocks,
mutual-information parity, null profile, and the association-rules
cross-block duplicate-partkey regression."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry_r5j", os.path.join(os.path.dirname(__file__),
                                      "..", "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def entry():
    return _entry()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable") \
             .reset_index(drop=True)


def _compare(entry, name, sf_dir, tables):
    import duckdb
    out = entry.queries()[name](str(sf_dir))
    got = out.to_pandas() if isinstance(out, pa.Table) else out
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(str(sf_dir), f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(entry.oracle_sql()[name]).df()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return got


def test_weighted_median_exact_boundary(tmp_path, entry):
    # two qty levels with EQUAL weight: 2*cumw == tot exactly at the
    # lower one -> lower weighted median must pick it
    tbl = pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_quantity": pa.array([10.0, 10.0, 40.0, 40.0]),
        "l_extendedprice": pa.array([5.0, 5.0, 5.0, 5.0]),
        "l_returnflag": pa.array(["A"] * 4, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = _compare(entry, "revenue_weighted_median_qty", tmp_path,
                   ["lineitem"])
    assert got["wmedian_qty"].tolist() == [10]
    assert got["total_cents"].tolist() == [2000]


def test_weighted_median_null_rows_dropped(tmp_path, entry):
    tbl = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_quantity": pa.array([7.0, None, 9.0]),
        "l_extendedprice": pa.array([1.0, 2.0, None]),
        "l_returnflag": pa.array(["R", "R", "R"], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = _compare(entry, "revenue_weighted_median_qty", tmp_path,
                   ["lineitem"])
    assert got["wmedian_qty"].tolist() == [7]


def test_gini_ties_across_blocks(tmp_path, entry, monkeypatch):
    # 64 customers all with IDENTICAL revenue, forced through many
    # blocks: any rank assignment within the global tie must leave
    # sum(rank*x) unchanged -> S1 = x * n(n+1)/2
    n = 64
    tbl = pa.table({
        "o_custkey": pa.array(list(range(n)), pa.int64()),
        "o_totalprice": pa.array([123.45] * n),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "16")
    got = _compare(entry, "customer_revenue_gini", tmp_path, ["orders"])
    assert got["n_customers"].tolist() == [n]
    assert got["rank_weighted_cents"].tolist() == \
        [12345 * n * (n + 1) // 2]


def test_gini_skewed_with_aggregated_customers(tmp_path, entry):
    # one whale customer with several orders, several minnows
    tbl = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([100.0, 200.0, 300.0,
                                  1.0, 2.0, 3.0]),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = _compare(entry, "customer_revenue_gini", tmp_path, ["orders"])
    # sorted cents: 100, 200, 300, 60000 -> S1 exact
    assert got["rank_weighted_cents"].tolist() == \
        [1 * 100 + 2 * 200 + 3 * 300 + 4 * 60000]


def test_event_hour_mutual_info_parity(tmp_path, entry):
    rng = np.random.default_rng(7)
    n = 400
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.integers(0, 86400 * 5, n)
                 * np.timedelta64(1_000_000, "us"))
    types = rng.choice(["view", "click", "buy"], n)
    # make 'buy' hour-skewed so MI is nonzero
    ts[types == "buy"] = base + (
        (rng.integers(0, 5, (types == "buy").sum()) * 86400 + 3600 * 9)
        * np.timedelta64(1_000_000, "us"))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _compare(entry, "event_hour_mutual_info", tmp_path, ["events"])
    buy = got[got["event_type"] == "buy"]
    assert buy["mi_milli"].iloc[0] > 0  # concentrated -> informative


def test_null_profile_counts(tmp_path, entry):
    tbl = pa.table({
        "doc_id": pa.array([1, None, 3], pa.int64()),
        "text": pa.array(["a", "b", None], pa.string()),
        "lang": pa.array([None, None, None], pa.string()),
        "source": pa.array(["s", "s", "s"], pa.string()),
        "n_chars": pa.array([1, 1, None], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = _compare(entry, "null_profile_documents", tmp_path,
                   ["documents"])
    prof = dict(zip(got["column"], got["n_null"]))
    assert prof == {"doc_id": 1, "text": 1, "lang": 3, "source": 0,
                    "n_chars": 1}


def test_association_rules_duplicate_part_across_blocks(
        tmp_path, entry, monkeypatch):
    # order 1 contains part 100 TWICE with the rows at opposite file
    # ends so small blocks split them; n_a for part 100 must still
    # count order 1 once (the r5j regression)
    ok = [1, 1, 2, 3, 4, 5, 6, 7, 8, 1]
    pk = [100, 200, 100, 200, 100, 200, 100, 200, 100, 100]
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "5")
    got = _compare(entry, "part_association_rules", tmp_path,
                   ["lineitem"])
    row = got[(got["part_a"] == 100) & (got["part_b"] == 200)]
    assert row["n_a"].tolist() == [5]   # orders 1,2,4,6,8 — order 1 once
    assert row["n_b"].tolist() == [4]   # orders 1,3,5,7
    assert row["n_both"].tolist() == [1]  # order 1 only


def _ds(tbl, blocks=3):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(blocks)


def _tab(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def test_time_weighted_mean_null_value_changes_pairing():
    # user 1: values at t0, t10 (null at t5 DROPPED before pairing ->
    # one interval of 10 s at value 2.0); user 2 single event -> omitted
    from pyschema_ray.functions.ordered import time_weighted_mean
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = pa.array([base, base + np.timedelta64(5, "s"),
                   base + np.timedelta64(10, "s"), base],
                  pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": ts,
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([2.0, None, -3.5, 9.9]),
    })
    out = _tab(time_weighted_mean(_ds(t)))
    rows = {r["user_id"]: r for r in out.to_pylist()}
    assert set(rows) == {1}
    assert rows[1]["n_intervals"] == 1
    assert rows[1]["span_s"] == 10
    assert rows[1]["vtime_milli_s"] == 2000 * 10


def test_time_weighted_mean_negative_and_tied_seconds():
    from pyschema_ray.functions.ordered import time_weighted_mean
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # two events in the SAME floor-second (gap 0), then +3 s
    ts = pa.array([base, base + np.timedelta64(400, "ms"),
                   base + np.timedelta64(3, "s")], pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": ts,
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([-1.2345, 4.0, 0.0]),
    })
    out = _tab(time_weighted_mean(_ds(t))).to_pylist()[0]
    # round(-1.2345*1000) = -1235 (half away), gap 0; 4.0 holds 3 s
    assert out["n_intervals"] == 2
    assert out["span_s"] == 3
    assert out["vtime_milli_s"] == 4000 * 3


def test_join_cardinality_audit_skew_and_disjoint():
    from pyschema_ray.functions.relational import join_cardinality_audit
    left = pa.table({"k": pa.array([1, 1, 1, 2, 5, None], pa.int64())})
    right = pa.table({"k": pa.array([1, 1, 2, 2, 2, 9], pa.int64())})
    out = _tab(join_cardinality_audit(_ds(left), _ds(right), "k")) \
        .to_pylist()[0]
    assert out == {"n_left_keys": 3, "n_right_keys": 3,
                   "n_common_keys": 2,
                   "predicted_join_rows": 3 * 2 + 1 * 3,
                   "max_left_freq": 3, "max_right_freq": 3}


def test_join_cardinality_audit_empty_side():
    from pyschema_ray.functions.relational import join_cardinality_audit
    left = pa.table({"k": pa.array([], pa.int64())})
    right = pa.table({"k": pa.array([4, 4], pa.int64())})
    out = _tab(join_cardinality_audit(_ds(left, 1), _ds(right, 1),
                                      "k")).to_pylist()[0]
    assert out["n_left_keys"] == 0
    assert out["n_common_keys"] == 0
    assert out["predicted_join_rows"] == 0
    assert out["max_right_freq"] == 2


def test_footer_stats_audit_multi_rowgroup_with_nulls(tmp_path):
    import pyarrow.parquet as pqt

    from pyschema_ray.stages.audit import footer_stats_audit

    t = pa.table({
        "a": pa.array([5, 1, None, 9, 2, 2], pa.int64()),
        "b": pa.array([1.5, -2.0, 3.0, None, None, 0.25]),
    })
    p = tmp_path / "f.parquet"
    pqt.write_table(t, p, row_group_size=2)   # 3 row groups
    out = _tab(footer_stats_audit([str(p)], ["a", "b"]))
    assert out.num_rows == 6                  # 3 rgs x 2 cols
    assert all(out["stats_ok"].to_pylist())
    rows = {(r["row_group"], r["column"]): r for r in out.to_pylist()}
    assert rows[(0, "a")]["actual_min"] == 1.0
    assert rows[(0, "a")]["declared_min"] == 1.0
    assert rows[(1, "a")]["actual_nulls"] == 1
    assert rows[(1, "b")]["declared_max"] == 3.0
    assert rows[(2, "b")]["actual_min"] == 0.25
