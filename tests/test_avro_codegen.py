"""record_from_avro (R15 parity: avro schema document -> Record class)
and Field.mixin (R12 parity: method injection into field types)."""
import json

import pytest

from pyschema_ray import (Boolean, Bytes, Date, DateTime, Enum, Field,
                          Float, Integer, List, Map, Record, SubRecord,
                          Text, get_avro_schema_dict,
                          get_avro_schema_string, no_auto_store,
                          record_from_avro)
from pyschema_ray.schema import _jsonschema_type


@no_auto_store
class FullMatrix(Record):
    _schema_name = "FullMatrixR5"
    name = Text(nullable=False)
    blob = Bytes(nullable=False)
    flag = Boolean(nullable=False)
    small = Integer(size=4, nullable=False)
    big = Integer(size=8)
    ratio32 = Float(size=4, nullable=False)
    ratio64 = Float()
    born = Date(nullable=False)
    seen = DateTime()
    color = Enum(["red", "green"], nullable=False)
    tags = List(Text())
    scores = Map(Integer(size=8))


def test_avro_round_trip_full_matrix():
    s = get_avro_schema_string(FullMatrix)
    cls = record_from_avro(s, name="FullMatrixR5RT")
    d = get_avro_schema_dict(cls)
    want = get_avro_schema_dict(FullMatrix)
    # names differ by construction; everything else must round-trip.
    # enum fragment names derive from the FIELD name, so they match.
    d["name"] = want["name"]
    assert d == want


def test_avro_nested_record_and_named_reference():
    doc = {
        "type": "record", "name": "OuterR5",
        "fields": [
            {"name": "inner", "type": {
                "type": "record", "name": "InnerR5",
                "fields": [{"name": "v", "type": "long"}]}},
            {"name": "inner_again", "type": ["null", "InnerR5"]},
        ],
    }
    cls = record_from_avro(json.dumps(doc))
    f1 = cls._fields["inner"]
    f2 = cls._fields["inner_again"]
    assert isinstance(f1, SubRecord) and not f1.nullable
    assert isinstance(f2, SubRecord) and f2.nullable
    assert f2.record_cls is f1.record_cls  # named ref resolves
    assert f1.record_cls._fields["v"].size == 8
    # re-export dedups the second occurrence by name (reference trick)
    out = get_avro_schema_dict(cls)
    assert out["fields"][1]["type"] == ["null", "InnerR5"]


def test_avro_rejects_multitype_union_and_nonrecord():
    with pytest.raises(ValueError, match="union"):
        record_from_avro({"type": "record", "name": "X", "fields": [
            {"name": "u", "type": ["string", "long"]}]})
    with pytest.raises(ValueError, match="record"):
        record_from_avro({"type": "enum", "name": "E",
                          "symbols": ["a"]})


def test_record_from_avro_loads_rows():
    cls = record_from_avro({
        "type": "record", "name": "RowsR5", "fields": [
            {"name": "k", "type": "long"},
            {"name": "t", "type": ["null", "string"]}]})
    r = cls.from_json_compatible({"k": 5, "t": None})
    assert r.k == 5 and r.t is None


def test_field_mixin_injects_methods():
    @no_auto_store
    class Rec(Record):
        _schema_name = "MixinRecR5"
        a = Text(nullable=False)

    class Extra:
        def shout(self):
            return f"{type(self).__name__}!"

    Field.mixin(Extra)
    assert Rec._fields["a"].shout() == "Text!"
    assert Integer().shout() == "Integer!"

    # decorator form on a SUBTYPE only
    @Text.mixin
    class TextOnly:
        def is_texty(self):
            return True

    assert Text().is_texty()
    assert not hasattr(Integer(), "is_texty")


def test_mixin_installed_exporters_match_module_functions():
    from pyschema_ray.schema import _avro_type
    f = FullMatrix._fields["tags"]
    assert f.avro_type() == _avro_type(f, set())
    assert f.jsonschema_type() == _jsonschema_type(f)
    g = FullMatrix._fields["big"]
    assert g.avro_type() == ["null", "long"]
    assert g.jsonschema_type() == {"type": "integer"}
