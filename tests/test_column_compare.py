"""ColumnCompare constraint: cross-column row predicates (start <=
end, used <= total) — mask semantics, null policy, temporal types,
pruning declaration, nested rebind, and end-to-end violation rows."""

import datetime as dt

import pyarrow as pa
import pytest

from pyschema_ray.constraints import ColumnCompare


def test_mask_ops_and_null_policy():
    t = pa.table({
        "a": pa.array([1, 5, 3, None, 2], pa.int64()),
        "b": pa.array([2, 4, 3, 7, None], pa.int64())})
    assert ColumnCompare("a", "le", "b").mask(t).to_pylist() == \
        [True, False, True, True, True]      # nulls valid
    assert ColumnCompare("a", "lt", "b").mask(t).to_pylist() == \
        [True, False, False, True, True]
    assert ColumnCompare("a", "eq", "b").mask(t).to_pylist() == \
        [False, False, True, True, True]
    assert ColumnCompare("a", "ne", "b").mask(t).to_pylist() == \
        [True, True, False, True, True]


def test_mask_temporal_columns():
    d0 = dt.datetime(2024, 3, 1)
    t = pa.table({
        "start": pa.array([d0, d0 + dt.timedelta(hours=4)],
                          pa.timestamp("us")),
        "end": pa.array([d0 + dt.timedelta(hours=1), d0],
                        pa.timestamp("us"))})
    assert ColumnCompare("start", "le", "end").mask(t).to_pylist() == \
        [True, False]


def test_bad_op_rejected_and_pruning_declared():
    with pytest.raises(ValueError):
        ColumnCompare("a", "between", "b")
    c = ColumnCompare("x", "ge", "y")
    assert sorted(c.required_columns()) == ["x", "y"]
    assert c.name == "col_cmp(x >= y)"


def test_rebind_rewrites_both_paths():
    c = ColumnCompare("lo", "le", "hi").rebind("span")
    assert c.column == "span.lo" and c.other_column == "span.hi"
    assert "span.lo" in c.name and "span.hi" in c.name


def test_end_to_end_violation_rows():
    from pyschema_ray import Integer, Record, Text, no_auto_store
    from pyschema_ray.stages.validator import CompiledValidator

    @no_auto_store
    class Span(Record):
        sid = Text(nullable=False)
        lo = Integer(size=8)
        hi = Integer(size=8)
        _key_field = "sid"
        _extra_constraints = [ColumnCompare("lo", "le", "hi")]

    t = pa.table({
        "sid": pa.array(["a", "b", "c", "d"], pa.string()),
        "lo": pa.array([1, 9, None, 2], pa.int64()),
        "hi": pa.array([2, 3, 5, None], pa.int64())})
    cv = CompiledValidator(Span)
    cols = cv.read_columns()
    assert cols is not None and "lo" in cols and "hi" in cols
    result = cv.validate_table(t, "p0")
    viol = result.filter(
        pa.compute.equal(result["kind"], "violation"))
    bad = viol.filter(
        pa.compute.equal(viol["constraint"], "col_cmp(lo <= hi)"))
    assert bad["key"].to_pylist() == ["b"]
