"""Round-5k entry-query edge cases vs their own oracle_sql() twins:
exact two-sample rank tests (KS + Mann-Whitney) — hand-computed
midrank ties, tie invariance across many blocks, and a one-sided
(empty second group) corpus."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry_r5k", os.path.join(os.path.dirname(__file__),
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


def _events(vals_click, vals_view):
    types = ["click"] * len(vals_click) + ["view"] * len(vals_view)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(list(vals_click) + list(vals_view),
                          pa.float64()),
    })


def test_rank_tests_hand_computed_midranks(tmp_path, entry):
    # click {1,2,3} vs view {2,3,4}: R1 = 1 + 2.5 + 4.5 = 8
    # (midranks over the two ties), D = 1/3
    pq.write_table(_events([1.0, 2.0, 3.0], [2.0, 3.0, 4.0]),
                   tmp_path / "events.parquet")
    got = _compare(entry, "value_rank_tests", tmp_path, ["events"])
    assert got["n1"].tolist() == [3]
    assert got["n2"].tolist() == [3]
    assert got["ks_d_num"].tolist() == [3]      # D = 3/(3*3) = 1/3
    assert got["r1_doubled"].tolist() == [16]   # 2 * 8


def test_rank_tests_all_tied_across_blocks(tmp_path, entry,
                                           monkeypatch):
    # identical distributions, forced through many blocks: D must be
    # exactly 0 and 2*R1 = n1*(N+1) (every row gets the same midrank)
    n1, n2 = 40, 24
    pq.write_table(_events([7.25] * n1, [7.25] * n2),
                   tmp_path / "events.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "16")
    got = _compare(entry, "value_rank_tests", tmp_path, ["events"])
    assert got["ks_d_num"].tolist() == [0]
    assert got["r1_doubled"].tolist() == [n1 * (n1 + n2 + 1)]


def test_rank_tests_one_sided_group(tmp_path, entry):
    # no 'view' rows at all: N2 = 0 -> every a_v is 0; the doubled
    # rank sum degenerates to n1*(n1+1)
    pq.write_table(_events([5.0, 6.0, 7.0], []),
                   tmp_path / "events.parquet")
    got = _compare(entry, "value_rank_tests", tmp_path, ["events"])
    assert got["n2"].tolist() == [0]
    assert got["ks_d_num"].tolist() == [0]
    assert got["r1_doubled"].tolist() == [3 * 4]


def test_rank_tests_separated_distributions(tmp_path, entry):
    # fully separated: D = 1 -> ks_d_num = n1*n2; R1 minimal
    pq.write_table(_events([1.0, 2.0], [10.0, 11.0, 12.0]),
                   tmp_path / "events.parquet")
    got = _compare(entry, "value_rank_tests", tmp_path, ["events"])
    assert got["ks_d_num"].tolist() == [2 * 3]
    assert got["r1_doubled"].tolist() == [2 * (1 + 2)]


def _parts(keys, prices, sizes):
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_retailprice": pa.array(prices, pa.float64()),
        "p_size": pa.array(sizes, pa.int32()),
    })


def test_pareto_both_axis_ties_survive(tmp_path, entry):
    # two parts with IDENTICAL (price, size): neither dominates the
    # other (no strict inequality), both survive; a strictly worse
    # third part does not
    pq.write_table(_parts([1, 2, 3], [10.0, 10.0, 11.0], [5, 5, 5]),
                   tmp_path / "part.parquet")
    got = _compare(entry, "pareto_parts", tmp_path, ["part"])
    assert sorted(got["p_partkey"].tolist()) == [1, 2]


def test_pareto_cross_block_domination(tmp_path, entry, monkeypatch):
    # the dominating point sits in a DIFFERENT block than its victim:
    # per-block skylines alone would keep the victim; the global
    # merge + membership filter must kill it
    n = 64
    keys = list(range(n))
    prices = [50.0] * n
    sizes = [10] * n
    prices[63], sizes[63] = 10.0, 40   # dominates everything
    pq.write_table(_parts(keys, prices, sizes),
                   tmp_path / "part.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "16")
    got = _compare(entry, "pareto_parts", tmp_path, ["part"])
    assert got["p_partkey"].tolist() == [63]


def test_pareto_anticorrelated_all_survive(tmp_path, entry):
    # fully anti-correlated: every point is on the frontier
    n = 20
    pq.write_table(_parts(list(range(n)),
                          [float(10 + i) for i in range(n)],
                          [10 + i for i in range(n)]),
                   tmp_path / "part.parquet")
    got = _compare(entry, "pareto_parts", tmp_path, ["part"])
    assert len(got) == n


def test_pareto_null_axes_dropped(tmp_path, entry):
    tbl = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_retailprice": pa.array([5.0, None, 4.0], pa.float64()),
        "p_size": pa.array([7, 9, None], pa.int32()),
    })
    pq.write_table(tbl, tmp_path / "part.parquet")
    got = _compare(entry, "pareto_parts", tmp_path, ["part"])
    assert got["p_partkey"].tolist() == [1]


def _events_ts(uids, ts_secs, vals):
    return pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(
            pd.to_datetime([f"2024-01-01 00:00:{s:02d}" for s in ts_secs])),
        "event_id": pa.array(list(range(len(uids))), pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })


def test_ewma16_hand_computed(tmp_path, entry):
    # user 1: values 1.0 then 3.0 -> 3000*2^15 + 1000*2^14
    pq.write_table(_events_ts([1, 1], [1, 2], [1.0, 3.0]),
                   tmp_path / "events.parquet")
    got = _compare(entry, "user_value_ewma16", tmp_path, ["events"])
    assert got["ewma_scaled"].tolist() == [3000 * 32768 + 1000 * 16384]
    assert got["n_events"].tolist() == [2]


def test_ewma16_window_truncates_old_lags(tmp_path, entry):
    # 20 events: only the most recent 16 may contribute
    n = 20
    pq.write_table(_events_ts([7] * n, list(range(n)),
                              [float(i + 1) for i in range(n)]),
                   tmp_path / "events.parquet")
    got = _compare(entry, "user_value_ewma16", tmp_path, ["events"])
    expect = sum((20 - k) * 1000 * (1 << (15 - k)) for k in range(16))
    assert got["ewma_scaled"].tolist() == [expect]


def test_ewma16_negative_values_and_blocks(tmp_path, entry,
                                           monkeypatch):
    pq.write_table(_events_ts([1, 1, 2], [1, 2, 1],
                              [-2.5, 1.25, -0.001]),
                   tmp_path / "events.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "3")
    got = _compare(entry, "user_value_ewma16", tmp_path, ["events"])
    assert got["ewma_scaled"].tolist() == [
        1250 * 32768 + (-2500) * 16384, -1 * 32768]


def _events_dur(uids, ts_secs, vals):
    return pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(
            pd.to_datetime([f"2024-01-01 00:00:{s:02d}" for s in ts_secs])),
        "event_id": pa.array(list(range(len(uids))), pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })


def test_interval_union_overlap_touch_gap(tmp_path, entry):
    # value is SECONDS (milli precision).  user 1: [0s, 2s) + [1s,
    # 3s) overlap, [3s, 4s) touches (start == prev end) -> one island
    # of 4s; [10s, 11s) gaps -> second island
    pq.write_table(
        _events_dur([1, 1, 1, 1], [0, 1, 3, 10],
                    [2.0, 2.0, 1.0, 1.0]),
        tmp_path / "events.parquet")
    got = _compare(entry, "user_active_union", tmp_path, ["events"])
    assert got["n_islands"].tolist() == [2]
    assert got["union_us"].tolist() == [4_000_000 + 1_000_000]


def test_interval_union_contained_interval(tmp_path, entry):
    # second interval entirely INSIDE the first: union = first's span,
    # and a third interval starting before the first's end but after
    # the second's end must still merge (running-max, not last-end)
    pq.write_table(
        _events_dur([5, 5, 5], [0, 1, 8], [10.0, 2.0, 1.0]),
        tmp_path / "events.parquet")
    got = _compare(entry, "user_active_union", tmp_path, ["events"])
    assert got["n_islands"].tolist() == [1]
    assert got["union_us"].tolist() == [10_000_000]


def test_interval_union_nonpositive_dropped_blocks(tmp_path, entry,
                                                   monkeypatch):
    pq.write_table(
        _events_dur([1, 1, 2], [0, 5, 0], [0.0, 1.0, -3.0]),
        tmp_path / "events.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "3")
    got = _compare(entry, "user_active_union", tmp_path, ["events"])
    # user 1 keeps only the 5s event; user 2 vanishes entirely
    assert got["user_id"].tolist() == [1]
    assert got["union_us"].tolist() == [1_000_000]


def test_fd_audit_holds_and_violates(tmp_path, entry, monkeypatch):
    tbl = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, 20, 20], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "F", "F"], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "4")
    got = _compare(entry, "fd_audit_orders", tmp_path, ["orders"]) \
        .set_index("dependency")
    # orderkey -> custkey holds (unique determinant)
    assert got.loc["o_orderkey->o_custkey", "n_violations"] == 0
    # custkey 10 maps to {F, O} -> one violation
    assert got.loc["o_custkey->o_orderstatus", "n_violations"] == 1
    assert got.loc["o_custkey->o_orderstatus", "max_ndv"] == 2
    # status F maps to custkeys {10, 20}
    assert got.loc["o_orderstatus->o_custkey", "n_violations"] == 1


def test_selectivity_audit_tied_thresholds_and_blocks(tmp_path, entry,
                                                      monkeypatch):
    # heavy ties: one dominant value collapses several thresholds;
    # threshold-count bucketing must stay deterministic across blocks
    prices = [100.0] * 60 + [float(100 + i) for i in range(1, 41)]
    tbl = pa.table({"o_totalprice": pa.array(prices, pa.float64())})
    pq.write_table(tbl, tmp_path / "orders.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "8")
    got = _compare(entry, "selectivity_audit_orders", tmp_path,
                   ["orders"])
    # every row lands somewhere; totals conserved
    assert got["n_rows"].sum() == 100
    # the tied mass (cents == 10000 <= thresholds t1..t6) is decile 1
    assert got.iloc[0]["n_rows"] >= 60


def test_selectivity_audit_estimate_vs_actual(tmp_path, entry):
    # uniform integer dollars 1..1000: the uniformity estimate from
    # (n_rows, overlap, width) should approximate the true in-band
    # count within one bucket's worth of rows
    tbl = pa.table({"o_totalprice": pa.array(
        [float(i) for i in range(1, 1001)], pa.float64())})
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = _compare(entry, "selectivity_audit_orders", tmp_path,
                   ["orders"])
    est = (got["n_rows"] * got["overlap"]
           / (got["bucket_hi"] - got["bucket_lo"])).sum()
    actual = got["in_band_rows"].sum()
    # band is empty here (prices < $100k) -> both zero
    assert actual == 0 and est == 0


def test_cusum_identity_hand_computed(tmp_path, entry):
    # user 1 deviations (k=250): values 251, 247, 253 -> d = +1000,
    # -3000, +3000 milli; S = 1000, 0, 3000 -> max 3000, no alarm
    pq.write_table(_events_dur([1, 1, 1], [0, 1, 2],
                               [251.0, 247.0, 253.0]),
                   tmp_path / "events.parquet")
    got = _compare(entry, "cusum_value_alarms", tmp_path, ["events"])
    assert got["max_cusum"].tolist() == [3000]
    assert got["n_alarms"].tolist() == [0]
    assert got["first_alarm_order"].isna().all()


def test_cusum_alarm_and_reset_across_blocks(tmp_path, entry,
                                             monkeypatch):
    # spike breaches h=2,000,000 (2000 value-units above k): event 1;
    # the later negative run drags S back to 0 and it re-alarms at
    # event 4 -> n_alarms counts BOTH breaching events
    pq.write_table(
        _events_dur([9, 9, 9, 9, 9], [0, 1, 2, 3, 4],
                    [2500.0, 100.0, 100.0, 2600.0, 2400.0]),
        tmp_path / "events.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "5")
    got = _compare(entry, "cusum_value_alarms", tmp_path, ["events"])
    assert got["n_alarms"].tolist()[0] >= 2
    assert got["first_alarm_order"].tolist() == [0]


def test_cdc_apply_drops_fully_deleted_groups(tmp_path, entry,
                                              monkeypatch):
    # customer 5's ONLY order has key 17 -> deleted -> the group must
    # vanish from the maintained aggregate (n folds to 0)
    tbl = pa.table({
        "o_orderkey": pa.array([17, 13, 2], pa.int64()),
        "o_custkey": pa.array([5, 6, 6], pa.int64()),
        "o_totalprice": pa.array([100.0, 200.0, 50.0], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    monkeypatch.setenv("PSR_NUM_BLOCKS", "3")
    got = _compare(entry, "customer_totals_after_cdc", tmp_path,
                   ["orders"])
    assert got["o_custkey"].tolist() == [6]
    # order 13 repriced: (20000*11+5)//10 = 22000 cents; + 5000
    assert got["cents"].tolist() == [22000 + 5000]
    assert got["n"].tolist() == [2]


def test_sqlite_range_read_covers_negative_and_gapped_keys(tmp_path):
    from pyschema_ray.sources.sqlite_io import read_sqlite, write_sqlite
    import ray

    t = pa.table({
        "k": pa.array([-100, -1, 0, 7, 7, 999999], pa.int64()),
        "v": pa.array(["a", "b", None, "d", "e", "f"], pa.string()),
    })
    db = str(tmp_path / "t.db")
    write_sqlite(ray.data.from_arrow(t), db, "tt")
    got = read_sqlite(db, "tt", "k", n_partitions=4)
    parts = [b for b in got.iter_batches(batch_format="pyarrow",
                                         batch_size=None) if b.num_rows]
    back = pa.concat_tables(parts).sort_by([("k", "ascending"),
                                            ("v", "ascending")])
    assert back["k"].to_pylist() == [-100, -1, 0, 7, 7, 999999]
    assert back["v"].to_pylist() == ["a", "b", None, "d", "e", "f"]


def test_sqlite_empty_table_keeps_schema(tmp_path):
    from pyschema_ray.sources.sqlite_io import read_sqlite
    import sqlite3
    db = str(tmp_path / "e.db")
    con = sqlite3.connect(db)
    con.execute('CREATE TABLE et (k INTEGER, v TEXT)')
    con.commit(); con.close()
    ds = read_sqlite(db, "et", "k")
    assert ds.count() == 0
