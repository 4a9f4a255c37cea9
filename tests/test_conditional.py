"""Conditional (IF/THEN) constraint: strict guard semantics (null
guard never matches), inner null contract preserved, isin guards,
pruning declaration, opaque-inner rejection, nested rebind, and
end-to-end violation rows."""

import pyarrow as pa
import pytest

from pyschema_ray.constraints import (ColumnCompare, Conditional,
                                      Custom, Range)


def test_guard_and_inner_null_policy():
    t = pa.table({
        "source": pa.array(["s0", "s0", "s1", None, "s0"], pa.string()),
        "n_tok": pa.array([100, 5000, 5000, 5000, None], pa.int64())})
    c = Conditional("source", "eq", "s0", Range("n_tok", 0, 2048))
    # row0 guard+inner ok; row1 guard matches, inner violated;
    # row2 guard misses (vacuous); row3 null guard NEVER matches;
    # row4 guard matches but inner null -> inner's null contract: valid
    assert c.mask(t).to_pylist() == [True, False, True, True, True]


def test_isin_guard_and_ordering_ops():
    t = pa.table({
        "lang": pa.array(["en", "fr", "de"], pa.string()),
        "n": pa.array([10, 10, 10], pa.int64())})
    c = Conditional("lang", "isin", ["en", "de"], Range("n", 0, 5))
    assert c.mask(t).to_pylist() == [False, True, False]
    t2 = pa.table({"x": pa.array([1, 7], pa.int64()),
                   "n": pa.array([9, 9], pa.int64())})
    assert Conditional("x", "ge", 5, Range("n", 0, 5)) \
        .mask(t2).to_pylist() == [True, False]


def test_pruning_declared_and_opaque_inner_rejected():
    c = Conditional("source", "eq", "s0", Range("n_tok", 0, 10))
    assert sorted(c.required_columns()) == ["n_tok", "source"]
    c2 = Conditional("a", "lt", 3, ColumnCompare("lo", "le", "hi"))
    assert sorted(c2.required_columns()) == ["a", "hi", "lo"]
    with pytest.raises(ValueError):
        Conditional("a", "eq", 1,
                    Custom("f", lambda t: pa.array([True])))
    # explicit columns= unlocks opaque inners
    ok = Conditional("a", "eq", 1,
                     Custom("f", lambda t: pa.array([True])),
                     columns=["b"])
    assert sorted(ok.required_columns()) == ["a", "b"]


def test_rebind_prefixes_guard_and_inner():
    c = Conditional("kind", "eq", "x", Range("n", 0, 5)) \
        .rebind("meta")
    assert c.column == "meta.kind"
    assert c.then.column == "meta.n"
    assert "meta.kind" in c.name and "range(meta.n)" in c.name
    t = pa.table({"meta": pa.array(
        [{"kind": "x", "n": 9}, {"kind": "y", "n": 9}],
        pa.struct([("kind", pa.string()), ("n", pa.int64())]))})
    assert c.mask(t).to_pylist() == [False, True]


def test_end_to_end_violation_rows():
    from pyschema_ray import Integer, Record, Text, no_auto_store
    from pyschema_ray.stages.validator import CompiledValidator

    @no_auto_store
    class Doc(Record):
        did = Text(nullable=False)
        source = Text()
        n_tok = Integer(size=8)
        _key_field = "did"
        _extra_constraints = [
            Conditional("source", "eq", "s0",
                        Range("n_tok", 0, 2048))]

    t = pa.table({
        "did": pa.array(["a", "b", "c", "d"], pa.string()),
        "source": pa.array(["s0", "s0", "s1", None], pa.string()),
        "n_tok": pa.array([10, 4096, 4096, 4096], pa.int64())})
    cv = CompiledValidator(Doc)
    cols = cv.read_columns()
    assert cols is not None and {"source", "n_tok"} <= set(cols)
    result = cv.validate_table(t, "p0")
    viol = result.filter(
        pa.compute.equal(result["kind"], "violation"))
    name = Conditional("source", "eq", "s0",
                       Range("n_tok", 0, 2048)).name
    bad = viol.filter(pa.compute.equal(viol["constraint"], name))
    assert bad["key"].to_pylist() == ["b"]
