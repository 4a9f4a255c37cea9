"""Round-4 operators: existence joins, rollup, cross-table value
consistency, per-key ordered scans, exact double deciles,
frequency-of-frequencies, inverted index."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


# ---------------------------------------------------------------- joins

def test_anti_join_not_exists_semantics():
    from pyschema_ray.functions.relational import anti_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, None], pa.int64()),
        "v": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, None, 2], pa.int64())}))
    out = _tbl(anti_join(left, right, "k", "rk", num_shards=3)) \
        .sort_by("v")
    # null probe keys ignored; null left key kept (NOT EXISTS)
    assert out["v"].to_pylist() == ["a", "c", "e"]


def test_semi_join_exists_semantics():
    from pyschema_ray.functions.relational import semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, None], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([3, 3, None, 1], pa.int64())}))
    out = _tbl(semi_join(left, right, "k", num_shards=3)).sort_by("k")
    assert out["k"].to_pylist() == [1, 3]


def test_anti_join_string_keys():
    from pyschema_ray.functions.relational import anti_join

    left = ray.data.from_arrow(pa.table({"s": ["x", "y", "z"]}))
    right = ray.data.from_arrow(pa.table({"s": ["y"]}))
    out = _tbl(anti_join(left, right, "s", num_shards=2)).sort_by("s")
    assert out["s"].to_pylist() == ["x", "z"]


# --------------------------------------------------------------- rollup

def test_rollup_counts_levels_and_null_label():
    from pyschema_ray.functions.relational import rollup_counts

    t = pa.table({
        "source": ["a", "a", "b", None],
        "lang": ["en", "fr", "en", "en"]})
    out = _tbl(rollup_counts(ray.data.from_arrow(t),
                             ["source", "lang"])).to_pandas()
    got = {(r.source, r.lang): r.n_rows for r in out.itertuples()}
    assert got[("a", "en")] == 1 and got[("a", "fr")] == 1
    assert got[("[NULL]", "en")] == 1
    assert got[("a", "[ALL]")] == 2
    assert got[("b", "[ALL]")] == 1
    assert got[("[NULL]", "[ALL]")] == 1
    assert got[("[ALL]", "[ALL]")] == 4
    # every level present: finest(4) + per-source(3) + grand(1)
    assert len(got) == 8


# --------------------------------------------------- order consistency

def test_order_consistency_counts():
    from pyschema_ray.functions.relational import order_consistency

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        # order 1 matches its lines, order 2 is off by $10,
        # order 3 has no lines
        "o_totalprice": pa.array([220.0, 100.0, 50.0], pa.float64())})
    lineitem = pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 90.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.1, 0.1, 0.0], pa.float64())})
    out = _tbl(order_consistency(
        ray.data.from_arrow(orders), ray.data.from_arrow(lineitem),
        num_shards=3)).to_pandas().iloc[0]
    assert out.n_orders == 3
    assert out.n_without_lines == 1
    assert out.n_mismatched == 1


# ------------------------------------------------------- ordered scans

def _ts(*seconds):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.array([base + np.timedelta64(int(s * 1_000_000), "us")
                     for s in seconds], pa.timestamp("us"))


def test_grouped_max_gap():
    from pyschema_ray.functions.ordered import grouped_max_gap

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": _ts(0, 10, 70, 5, 5, 0),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    out = _tbl(grouped_max_gap(ray.data.from_arrow(t), num_shards=3)) \
        .sort_by("user_id").to_pandas()
    # user 3 has a single event -> excluded
    assert out.user_id.tolist() == [1, 2]
    assert out.n_events.tolist() == [3, 2]
    assert out.max_gap_us.tolist() == [60_000_000, 0]


def test_windowed_duplicate_counts():
    from pyschema_ray.functions.ordered import windowed_duplicate_counts

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": ["c", "c", "c", "v", "c"],
        "ts": _ts(0, 30, 200, 31, 10),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
    out = _tbl(windowed_duplicate_counts(
        ray.data.from_arrow(t), window_s=60.0, num_shards=3)) \
        .to_pandas()
    # only user 1's second 'c' (gap 30s) is within the window;
    # the third 'c' is 170s after the second; user 2 has one event
    got = dict(zip(out.event_type, out.n_dups))
    assert got == {"c": 1}


# ------------------------------------------------------------- deciles

def test_exact_value_deciles_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.analytics import exact_value_deciles

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(0, 1, 5000),
        np.full(3000, 0.5),        # heavy tie -> constant-bucket path
        rng.uniform(50, 60, 100),  # far outlier band
    ])
    ds = ray.data.from_arrow(pa.table({"value": pa.array(
        vals, pa.float64())})).repartition(8)
    out = exact_value_deciles(ds, "value", n_buckets=64).to_pandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"value": vals}))
    for i, v in zip(out.tenth, out.value):
        want = con.execute(
            f"select quantile_disc(value, {i / 10.0}) from t") \
            .fetchone()[0]
        assert v == want, (i, v, want)


def test_exact_value_deciles_all_equal():
    from pyschema_ray.functions.analytics import exact_value_deciles

    ds = ray.data.from_arrow(pa.table({
        "value": pa.array([3.25] * 100, pa.float64())}))
    out = exact_value_deciles(ds, "value").to_pandas()
    assert (out.value == 3.25).all()


# ---------------------------------------------------------------- text

def test_frequency_of_frequencies_matches_counter():
    from collections import Counter

    from pyschema_ray.functions.text import frequency_of_frequencies

    texts = ["a b a", "b c", "a", None, "  "]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
    out = _tbl(frequency_of_frequencies(ds, num_shards=4)).to_pandas()
    words = Counter(w for s in texts if s and s.strip()
                    for w in s.split())
    want = Counter(words.values())
    got = dict(zip(out.n_occurrences, out.n_words))
    assert got == dict(want)


def test_inverted_index_postings():
    from pyschema_ray.functions.text import inverted_index

    t = pa.table({
        "doc_id": pa.array([10, 2, 5, 7], pa.int64()),
        "text": ["cat dog", "dog bird", "dog cat", "fish"]})
    ds = ray.data.from_arrow(t).repartition(2)
    out = _tbl(inverted_index(ds, min_df=2, num_shards=3)) \
        .sort_by("word").to_pandas()
    got = {r.word: (r.df, r.postings) for r in out.itertuples()}
    assert got == {"cat": (2, "5,10"), "dog": (3, "2,5,10")}


def test_left_count_distribution():
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.relational import left_count_distribution

    keys = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, None], pa.int64())}))
    facts = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, None, 99], pa.int64())})) \
        .repartition(3)
    out = pa.concat_tables(
        [b for b in left_count_distribution(keys, facts, "k")
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by("n_facts")
    # k=3,4 -> 0 facts; k=2 -> 1; k=1 -> 3; null key dropped;
    # fact key 99 (absent from keys) ignored
    assert out.to_pydict() == {"n_facts": [0, 1, 3],
                               "n_keys": [2, 1, 1]}


def test_snapshot_diff_classification():
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.relational import snapshot_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
        "text": pa.array(["a", "b", "c", "d", None, "x"]),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 6, 7], pa.int64()),
        "text": pa.array(["b", "C", "f", None]),
    })).repartition(2)
    out = pa.concat_tables(
        [b for b in snapshot_diff(old, new)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by("doc_id")
    # 1,4 removed; 3 changed; 6 added; 2 unchanged (absent);
    # null-key and null-text rows on either side ignored
    assert out.to_pydict() == {
        "doc_id": [1, 3, 4, 6],
        "status": ["removed", "changed", "removed", "added"],
    }


def test_grouping_sets_and_cube_match_duckdb():
    """grouping_sets_counts against DuckDB GROUPING SETS on a 3-col
    frame with real nulls (mapped to [NULL], distinct from the [ALL]
    sentinel); cube_counts = all 8 subsets."""
    import duckdb

    from pyschema_ray.functions.relational import (cube_counts,
                                                   grouping_sets_counts)

    t = pa.table({
        "a": pa.array(["x", "x", "y", None, "y", "x"], pa.string()),
        "b": pa.array(["1", None, "1", "2", "2", "1"], pa.string()),
        "c": pa.array(["p", "p", "q", "q", None, "p"], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    sets = [("a", "b", "c"), ("a", "c"), ("b",), ()]
    got = _tbl(grouping_sets_counts(ds, ["a", "b", "c"], sets)) \
        .to_pandas().sort_values(["a", "b", "c"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        SELECT CASE WHEN GROUPING(a)=1 THEN '[ALL]'
                    ELSE coalesce(a,'[NULL]') END AS a,
               CASE WHEN GROUPING(b)=1 THEN '[ALL]'
                    ELSE coalesce(b,'[NULL]') END AS b,
               CASE WHEN GROUPING(c)=1 THEN '[ALL]'
                    ELSE coalesce(c,'[NULL]') END AS c,
               CAST(count(*) AS BIGINT) AS n_rows
          FROM t GROUP BY GROUPING SETS ((a,b,c),(a,c),(b),())
         ORDER BY a, b, c
    """).df().reset_index(drop=True)
    assert got.values.tolist() == want.values.tolist()

    got_cube = _tbl(cube_counts(ds, ["a", "b"])) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want_cube = con.execute("""
        SELECT CASE WHEN GROUPING(a)=1 THEN '[ALL]'
                    ELSE coalesce(a,'[NULL]') END AS a,
               CASE WHEN GROUPING(b)=1 THEN '[ALL]'
                    ELSE coalesce(b,'[NULL]') END AS b,
               CAST(count(*) AS BIGINT) AS n_rows
          FROM t GROUP BY CUBE(a, b) ORDER BY a, b
    """).df().reset_index(drop=True)
    assert got_cube.values.tolist() == want_cube.values.tolist()


def test_grouping_sets_rejects_unknown_column():
    from pyschema_ray.functions.relational import grouping_sets_counts

    ds = ray.data.from_arrow(pa.table({"a": pa.array(["x"])}))
    try:
        grouping_sets_counts(ds, ["a"], [("zz",)])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
