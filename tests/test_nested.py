"""Nested (SubRecord) constraint validation: the vectorized dotted-path
checks must flag exactly the rows the reference-style row-at-a-time
``from_json_compatible`` descent rejects — including the
children-of-a-null-record skip."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pyschema_ray import (Integer, ParseError, Record, SubRecord, Text,
                          no_auto_store)
from pyschema_ray.stages.validator import CompiledValidator


@pytest.fixture(scope="module")
def schemas():
    @no_auto_store
    class Meta(Record):
        url = Text(nullable=False, regex=r"^https?://")
        score = Integer(size=8, min=0, max=100)

    @no_auto_store
    class Doc(Record):
        doc_id = Integer(size=8, nullable=False)
        meta = SubRecord(Meta, nullable=True)
        _key_field = "doc_id"

    return Meta, Doc


def _rows():
    return [
        {"doc_id": 1, "meta": {"url": "https://a", "score": 10}},   # ok
        {"doc_id": 2, "meta": {"url": "ftp://bad", "score": 10}},   # regex
        {"doc_id": 3, "meta": {"url": "https://c", "score": 999}},  # range
        {"doc_id": 4, "meta": None},                                # ok (nullable rec)
        {"doc_id": 5, "meta": {"url": None, "score": 5}},           # inner not_null
        {"doc_id": 6, "meta": {"url": "http://f", "score": None}},  # ok (score nullable)
    ]


def test_nested_constraints_match_row_path(schemas):
    Meta, Doc = schemas
    rows = _rows()

    # reference-style row path: which rows raise, and on what
    row_bad = {}
    for r in rows:
        try:
            Doc.from_json_compatible(r)
        except ParseError as e:
            row_bad[r["doc_id"]] = str(e)
    assert set(row_bad) == {2, 3, 5}

    # vectorized path over one Arrow batch
    meta_type = Doc._fields["meta"].arrow_type()
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "meta": pa.array([r["meta"] for r in rows], meta_type),
    })
    v = CompiledValidator(schema_cls=Doc)
    out = v(t)
    viol = out.filter(pc.equal(out["kind"], "violation"))
    got = {(k, c) for k, c in zip(viol["key"].to_pylist(),
                                  viol["constraint"].to_pylist())}
    assert got == {
        ("2", "regex(meta.url)"),
        ("3", "range(meta.score)"),
        ("5", "not_null(meta.url)"),
    }


def test_nested_columns_prune_to_top_level(schemas):
    _, Doc = schemas
    v = CompiledValidator(schema_cls=Doc)
    cols = v.read_columns()
    assert cols is not None
    assert set(cols) == {"doc_id", "meta"}


def test_nested_rebind_names(schemas):
    _, Doc = schemas
    names = [c.name for c in Doc.compiled_constraints()]
    assert "not_null(meta.url)" in names
    assert "range(meta.score)" in names
    assert "regex(meta.url)" in names


def test_missing_nested_field_skips_not_crashes(schemas):
    """A batch whose struct column lacks a declared inner field must
    not crash the nested constraints (the struct-type mismatch is the
    schema-conformance check's finding)."""
    _, Doc = schemas
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "meta": pa.array([{"url": "https://a"}, {"url": "ftp://b"}],
                         pa.struct([pa.field("url", pa.string())])),
    })
    v = CompiledValidator(schema_cls=Doc)
    out = v(t)
    viol = out.filter(pc.equal(out["kind"], "violation"))
    got = {(k, c) for k, c in zip(viol["key"].to_pylist(),
                                  viol["constraint"].to_pylist())}
    # url constraints still run (path present); score's skip silently;
    # the struct type mismatch surfaces as schema(meta)
    assert ("2", "regex(meta.url)") in got
    assert any(c == "schema(meta)" for _, c in got)
    assert not any("score" in c for _, c in got)
