"""Round-5f relational primitives: set_op_distinct (INTERSECT/EXCEPT
distinct semantics incl. NULL-equality and multi-column tuples) and
filter_above_group_avg (correlated-subquery group-local filter with
exact integer comparison)."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.analytics import filter_above_group_avg
from pyschema_ray.functions.relational import set_op_distinct


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _rows(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    if not tabs:
        return []
    t = pa.concat_tables(tabs)
    return sorted((tuple(r.values()) for r in t.to_pylist()), key=repr)


def test_intersect_except_single_int_col():
    left = pa.table({"k": pa.array([1, 2, 2, 3, 4, None], pa.int64())})
    right = pa.table({"k": pa.array([2, 4, 4, 5], pa.int64())})
    inter = _rows(set_op_distinct(_ds(left), _ds(right), ["k"],
                                  "intersect"))
    assert inter == [(2,), (4,)]
    exc = _rows(set_op_distinct(_ds(left), _ds(right), ["k"], "except"))
    assert exc == sorted([(None,), (1,), (3,)], key=repr)


def test_set_op_null_equality():
    """SQL set ops treat NULL as equal to NULL (distinct semantics)."""
    left = pa.table({"k": pa.array([None, 1], pa.int64())})
    right = pa.table({"k": pa.array([None, 2], pa.int64())})
    inter = _rows(set_op_distinct(_ds(left, 2), _ds(right, 2), ["k"],
                                  "intersect"))
    assert inter == [(None,)]
    exc = _rows(set_op_distinct(_ds(left, 2), _ds(right, 2), ["k"],
                                "except"))
    assert exc == [(1,)]


def test_set_op_multicol_and_duplicates():
    left = pa.table({
        "a": pa.array(["x", "x", "y", "y", None], pa.string()),
        "b": pa.array([1, 1, 2, 3, 9], pa.int64()),
    })
    right = pa.table({
        "a": pa.array(["x", "y", None, "z"], pa.string()),
        "b": pa.array([1, 3, 9, 9], pa.int64()),
    })
    inter = set_op_distinct(_ds(left), _ds(right), ["a", "b"],
                            "intersect")
    got = _rows(inter)
    assert got == sorted([("x", 1), ("y", 3), (None, 9)], key=repr)
    exc = _rows(set_op_distinct(_ds(left), _ds(right), ["a", "b"],
                                "except"))
    assert exc == [("y", 2)]


def test_set_op_empty_sides():
    empty = pa.table({"k": pa.array([], pa.int64())})
    full = pa.table({"k": pa.array([1, 2], pa.int64())})
    assert _rows(set_op_distinct(_ds(empty, 1), _ds(full, 1), ["k"],
                                 "intersect")) == []
    assert _rows(set_op_distinct(_ds(empty, 1), _ds(full, 1), ["k"],
                                 "except")) == []
    assert _rows(set_op_distinct(_ds(full, 1), _ds(empty, 1), ["k"],
                                 "except")) == [(1,), (2,)]


def test_set_op_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(5)
    left_t = pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64())})
    right_t = pa.table({"k": pa.array(rng.integers(20, 60, 300), pa.int64())})
    for op, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = _rows(set_op_distinct(_ds(left_t, 5), _ds(right_t, 4),
                                    ["k"], op))
        want = sorted(
            ((r[0],) for r in duckdb.sql(
                f"SELECT k FROM left_t {sql} SELECT k FROM right_t"
            ).fetchall()), key=repr)
        assert got == want


def test_filter_above_group_avg_exact():
    """2*x*n > 3*s  <=>  x > 1.5*avg — matches the window-SQL oracle,
    null keys form their own partition, null values never qualify."""
    import duckdb

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, None, None, 3], pa.int64()),
        "v": pa.array([100, 200, 600, 50, 50, 10, 100, None], pa.int64()),
        "tag": pa.array(list("abcdefgh"), pa.string()),
    })
    out = filter_above_group_avg(_ds(t, 3), "k", "v", num=3, den=2)
    got = _rows(out)
    want = sorted((tuple(r) for r in duckdb.sql("""
        WITH w AS (SELECT k, v, tag,
                          sum(v) OVER (PARTITION BY k) AS s,
                          count(v) OVER (PARTITION BY k) AS n
                     FROM t)
        SELECT k, v, tag FROM w WHERE 2*v*n > 3*s
    """).fetchall()), key=repr)
    assert got == want
    # spot-check the semantics directly: group 1 avg=300 -> only 600
    assert (1, 600, "c") in got
    assert all(r[0] != 2 for r in got)  # flat group: nothing above avg


def test_set_op_single_string_col():
    """Single non-integer key column exercises the string-composite
    shard path (the int fast path is type-gated)."""
    left = pa.table({"s": pa.array(["a", "b", "b", None, "c"],
                                   pa.string())})
    right = pa.table({"s": pa.array(["b", None, "d"], pa.string())})
    inter = _rows(set_op_distinct(_ds(left), _ds(right), ["s"],
                                  "intersect"))
    assert inter == sorted([("b",), (None,)], key=repr)
    exc = _rows(set_op_distinct(_ds(left), _ds(right), ["s"], "except"))
    assert exc == [("a",), ("c",)]


def test_filter_above_group_avg_string_keys():
    import duckdb

    t = pa.table({
        "k": pa.array(["x", "x", "x", "y", "y"], pa.string()),
        "v": pa.array([10, 20, 90, 5, 5], pa.int64()),
    })
    got = _rows(filter_above_group_avg(_ds(t, 2), "k", "v",
                                       num=3, den=2))
    want = sorted((tuple(r) for r in duckdb.sql("""
        WITH w AS (SELECT k, v, sum(v) OVER (PARTITION BY k) AS s,
                          count(v) OVER (PARTITION BY k) AS n FROM t)
        SELECT k, v FROM w WHERE 2*v*n > 3*s
    """).fetchall()), key=repr)
    assert got == want == [("x", 90)]


def test_not_in_join_null_trap():
    """SQL NOT IN three-valued semantics: one NULL in the probe set
    empties the whole result; NULL left keys never qualify; without
    probe nulls it equals NOT EXISTS minus null-keyed left rows."""
    import duckdb

    from pyschema_ray.functions.relational import not_in_join

    left_t = pa.table({"k": pa.array([1, 2, 3, None], pa.int64())})
    probe_clean = pa.table({"p": pa.array([2, 5], pa.int64())})
    probe_null = pa.table({"p": pa.array([2, None], pa.int64())})

    got = _rows(not_in_join(_ds(left_t), _ds(probe_clean), "k", "p"))
    want = sorted(
        ((r[0],) for r in duckdb.sql(
            "SELECT k FROM left_t WHERE k NOT IN "
            "(SELECT p FROM probe_clean)").fetchall()), key=repr)
    assert got == want == [(1,), (3,)]

    got_n = _rows(not_in_join(_ds(left_t), _ds(probe_null), "k", "p"))
    want_n = duckdb.sql("SELECT k FROM left_t WHERE k NOT IN "
                        "(SELECT p FROM probe_null)").fetchall()
    assert got_n == [] and want_n == []


def test_filter_above_group_avg_empty():
    t = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    assert _rows(filter_above_group_avg(_ds(t, 1), "k", "v")) == []


def test_unnest_list_ordinality_nulls_empties():
    import duckdb

    from pyschema_ray.functions.relational import unnest_list

    t = pa.table({
        "id": pa.array([10, 20, 30, 40], pa.int64()),
        "xs": pa.array([[1.5, 2.5], None, [], [7.0]],
                       pa.list_(pa.float64())),
    })
    got = _rows(unnest_list(_ds(t), "xs", ["id"]))
    want = sorted((tuple(r) for r in duckdb.sql(
        "SELECT id, CAST(generate_subscripts(xs, 1) AS BIGINT), "
        "CAST(unnest(xs) AS DOUBLE) FROM t").fetchall()), key=repr)
    assert got == want == [(10, 1, 1.5), (10, 2, 2.5), (40, 1, 7.0)]


def test_unnest_list_empty_and_all_null_blocks():
    from pyschema_ray.functions.relational import unnest_list

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "xs": pa.array([None, []], pa.list_(pa.int64()))})
    assert _rows(unnest_list(_ds(t, 2), "xs", ["id"])) == []
    e = pa.table({"id": pa.array([], pa.int64()),
                  "xs": pa.array([], pa.list_(pa.int64()))})
    assert _rows(unnest_list(_ds(e, 1), "xs", ["id"])) == []


def _one_row(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    t = pa.concat_tables(tabs)
    assert t.num_rows == 1
    return {c: t[c][0].as_py() for c in t.column_names}


def test_key_reconcile_matches_duckdb():
    import duckdb

    from pyschema_ray.functions.relational import key_reconcile

    rng = np.random.default_rng(31)
    lt = pa.table({"a": pa.array(
        rng.integers(0, 80, 200).tolist() + [None], pa.int64())})
    rt = pa.table({"b": pa.array(
        rng.integers(40, 140, 250).tolist() + [None], pa.int64())})
    got = _one_row(key_reconcile(_ds(lt, 3), _ds(rt, 4), "a", "b",
                                 num_shards=5))
    exp = duckdb.sql("""
        WITH l AS (SELECT DISTINCT a AS k FROM lt WHERE a IS NOT NULL),
        r AS (SELECT DISTINCT b AS k FROM rt WHERE b IS NOT NULL)
        SELECT CAST(coalesce(sum(CASE WHEN r.k IS NULL THEN 1 ELSE 0
                             END), 0) AS BIGINT) AS n_only_left,
               CAST(coalesce(sum(CASE WHEN l.k IS NULL THEN 1 ELSE 0
                             END), 0) AS BIGINT) AS n_only_right,
               CAST(coalesce(sum(CASE WHEN l.k IS NOT NULL
                                  AND r.k IS NOT NULL THEN 1 ELSE 0
                             END), 0) AS BIGINT) AS n_both
          FROM l FULL OUTER JOIN r ON l.k = r.k
    """).fetchone()
    assert (got["n_only_left"], got["n_only_right"],
            got["n_both"]) == exp


def test_key_reconcile_string_keys_and_empty():
    from pyschema_ray.functions.relational import key_reconcile

    lt = pa.table({"k": pa.array(["a", "b", "b", "c"], pa.string())})
    rt = pa.table({"k": pa.array(["b", "d"], pa.string())})
    got = _one_row(key_reconcile(_ds(lt, 2), _ds(rt, 2), "k"))
    assert got == {"n_only_left": 2, "n_only_right": 1, "n_both": 1}

    e = pa.table({"k": pa.array([], pa.string())})
    got = _one_row(key_reconcile(_ds(e, 1), _ds(e, 1), "k"))
    assert got == {"n_only_left": 0, "n_only_right": 0, "n_both": 0}
