"""Reference-semantics tests: field load/dump round-trips, ParseError
negatives, SchemaStore registration, Arrow schema compilation —
re-expressing the reference's test strategy (SURVEY.md §5.1: round-trip
construct -> dumps -> loads -> equality; negative tests assert
ParseError)."""

import datetime

import pyarrow as pa
import pytest

from pyschema_ray import (Boolean, Bytes, Date, DateTime, Enum, Float,
                          Integer, List, Map, ParseError, Record, SubRecord,
                          Text, ispyschema, no_auto_store, schema_store)


class Inner(Record):
    x = Integer(size=4)


class Everything(Record):
    t = Text(nullable=False)
    b = Bytes()
    i = Integer(size=8, min=0, max=100)
    f = Float()
    flag = Boolean()
    d = Date()
    dt = DateTime()
    e = Enum(["a", "b"])
    lst = List(Integer(size=4), element_min=0, element_max=10)
    m = Map(Float())
    sub = SubRecord(Inner)


def test_round_trip():
    rec = Everything.from_json_compatible({
        "t": "hello", "b": "aGk=", "i": 42, "f": 1.5, "flag": True,
        "d": "2026-01-02", "dt": "2026-01-02T03:04:05", "e": "a",
        "lst": [1, 2, 3], "m": {"k": 2.0}, "sub": {"x": 7},
    })
    assert rec.t == "hello"
    assert rec.b == b"hi"
    assert rec.d == datetime.date(2026, 1, 2)
    dumped = rec.to_json_compatible()
    rec2 = Everything.from_json_compatible(dumped)
    assert rec == rec2
    assert dumped["b"] == "aGk="
    assert dumped["d"] == "2026-01-02"


@pytest.mark.parametrize("payload", [
    {"t": None},                       # non-nullable null
    {"t": "x", "i": "notint"},         # type mismatch
    {"t": "x", "i": 101},              # > max
    {"t": "x", "e": "zzz"},            # enum domain
    {"t": "x", "lst": [1, 99]},        # element >= element_max
    {"t": "x", "unknown_field": 1},    # unknown field
    {"t": "x", "d": "not-a-date"},
    {"t": "x", "flag": "yes"},
])
def test_parse_errors(payload):
    with pytest.raises(ParseError):
        Everything.from_json_compatible(payload)


def test_defaults_and_missing_required():
    class WithDefault(Record):
        a = Text(nullable=False)
        b = Integer(default=7)

    r = WithDefault.from_json_compatible({"a": "x"})
    assert r.b == 7
    with pytest.raises(ParseError):
        WithDefault.from_json_compatible({"b": 1})


def test_schema_store_and_ispyschema():
    assert "Everything" in schema_store
    assert schema_store.get("Everything") is Everything
    assert ispyschema(Everything)
    assert not ispyschema(Record)
    with pytest.raises(KeyError):
        schema_store.get("NoSuchSchema")

    @no_auto_store
    class Hidden(Record):
        x = Text()

    assert "Hidden" not in schema_store


def test_to_arrow():
    s = Everything.to_arrow()
    assert s.field("t").type == pa.string()
    assert not s.field("t").nullable
    assert s.field("i").type == pa.int64()
    assert s.field("lst").type == pa.list_(pa.int32())
    assert s.field("sub").type == pa.struct([pa.field("x", pa.int32())])
    assert s.field("m").type == pa.map_(pa.string(), pa.float64())


def test_constraint_compilation_order_is_stable(sequences_schema):
    names = [c.name for c in sequences_schema.compiled_constraints()]
    assert names == [
        "not_null(doc_id)", "regex(doc_id)", "not_null(tokens)",
        "element_range(tokens)", "range(n_tok)",
        "length_eq(n_tok,tokens)", "not_null(source)",
    ]


def test_fingerprint_stable(sequences_schema):
    fp1 = sequences_schema.fingerprint()
    fp2 = sequences_schema.fingerprint()
    assert fp1 == fp2
    assert fp1["key_field"] == "doc_id"


def test_record_repr_and_unknown_kwargs():
    r = Inner(x=3)
    assert "x=3" in repr(r)
    with pytest.raises(ParseError):
        Inner(x=1, nope=2)


def test_jsonl_round_trip_into_pipeline(tmp_path):
    """dumps() lines -> read_jsonl -> CompiledValidator: the reference's
    wire format flows into the Dataset engine, with $schema verified +
    dropped and declared columns cast; a wrong $schema raises."""
    import pyarrow.compute as pc

    from pyschema_ray import Integer, Record, Text, no_auto_store
    from pyschema_ray.sources.jsonl import read_jsonl, write_jsonl_records

    @no_auto_store
    class Doc(Record):
        doc_id = Text(nullable=False, regex=r"^d-\d+$")
        n = Integer(size=8, min=0, max=100)
        _key_field = "doc_id"

    recs = [Doc(doc_id=f"d-{i}", n=i * 5) for i in range(20)]
    recs.append(Doc(doc_id="bad id", n=999))  # two violations
    p = str(tmp_path / "docs.jsonl")
    assert write_jsonl_records(recs, p) == 21

    import ray.data  # noqa: F401
    from pyschema_ray.stages.validator import CompiledValidator

    ds = read_jsonl(p, Doc)
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert "$schema" not in t.column_names
    assert t.schema.field("n").type == pa.int64()
    assert t.num_rows == 21

    out = CompiledValidator(Doc)(t)
    viol = out.filter(pc.equal(out["kind"], "violation"))
    assert sorted(viol["constraint"].to_pylist()) == \
        ["range(n)", "regex(doc_id)"]

    # wrong $schema rejected
    with open(p) as f:
        lines = f.read().replace('"Doc"', '"Other"')
    p2 = str(tmp_path / "other.jsonl")
    with open(p2, "w") as f:
        f.write(lines)
    import pytest as _pytest
    with _pytest.raises(Exception, match="Other"):
        pa.concat_tables(read_jsonl(p2, Doc)
                         .iter_batches(batch_format="pyarrow"))
