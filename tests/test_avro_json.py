"""R14 — Avro-JSON value serialization: union-wrapped nullables,
epoch-encoded logical types, latin-1 bytes; golden encodings plus a
round-trip per field type (mirrors SURVEY §5.1's golden-test style for
the reference's pyschema_extensions/avro.py dumps/loads)."""

import datetime as dt
import json

import pytest

from pyschema_ray import (Boolean, Bytes, Date, DateTime, Enum, Float,
                          Integer, List, Map, ParseError, Record, SubRecord,
                          Text, avro_dumps, avro_loads, from_avro_json,
                          no_auto_store, to_avro_json)


@no_auto_store
class Inner(Record):
    tag = Text(nullable=False)


@no_auto_store
class Everything(Record):
    # distinct registry name: tests/test_schema.py auto-registers its
    # own "Everything"; without this, class creation here would
    # overwrite that entry and no_auto_store would then DELETE it
    # whenever this module imports second (explicit-file-order runs)
    _schema_name = "EverythingAvroJson"
    name = Text(nullable=False)
    nick = Text()                       # nullable -> union-wrapped
    n = Integer(size=4, nullable=False)
    big = Integer(size=8)
    ratio = Float(size=8)
    short_ratio = Float(size=4)
    ok = Boolean()
    blob = Bytes()
    day = Date()
    when = DateTime()
    color = Enum(["red", "blue"])
    tags = List(Text(nullable=False))
    counts = Map(Integer(size=8, nullable=False))
    sub = SubRecord(Inner)
    _key_field = "name"


def _sample() -> Everything:
    return Everything(
        name="a", nick="b", n=3, big=1 << 40, ratio=0.5, short_ratio=2.0,
        ok=True, blob=b"\x00\xff!", day=dt.date(2020, 3, 1),
        when=dt.datetime(2021, 6, 2, 12, 30, 0, 250),
        color="red", tags=["x", "y"], counts={"k": 7},
        sub=Inner(tag="t"))


def test_golden_union_wrapping():
    enc = to_avro_json(_sample())
    assert enc["name"] == "a"                     # non-nullable: bare
    assert enc["nick"] == {"string": "b"}         # nullable: wrapped
    assert enc["n"] == 3
    assert enc["big"] == {"long": 1 << 40}
    assert enc["ratio"] == {"double": 0.5}
    assert enc["short_ratio"] == {"float": 2.0}
    assert enc["ok"] == {"boolean": True}
    assert enc["blob"] == {"bytes": "\x00\xff!"}  # latin-1, not base64
    assert enc["day"] == {"int": (dt.date(2020, 3, 1)
                                  - dt.date(1970, 1, 1)).days}
    us = int((dt.datetime(2021, 6, 2, 12, 30, 0, 250)
              - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    assert enc["when"] == {"long": us}
    assert enc["color"] == {"color_enum": "red"}
    assert enc["tags"] == ["x", "y"]              # List nullable=False
    assert enc["counts"] == {"map": {"k": 7}}
    assert enc["sub"] == {"Inner": {"tag": "t"}}


def test_nulls_stay_bare():
    r = Everything(name="a", n=1, tags=[])
    enc = to_avro_json(r)
    assert enc["nick"] is None
    assert enc["blob"] is None
    assert enc["sub"] is None


def test_round_trip_all_types():
    r = _sample()
    line = avro_dumps(r)
    json.loads(line)  # valid JSON
    back = avro_loads(line, Everything)
    assert back == r
    assert back.blob == b"\x00\xff!"
    assert back.when == r.when
    assert back.sub == Inner(tag="t")


def test_round_trip_with_nulls():
    r = Everything(name="a", n=1, tags=[])
    assert avro_loads(avro_dumps(r), Everything) == r


def test_wrong_union_branch_rejected():
    enc = to_avro_json(_sample())
    enc["big"] = {"int": 5}  # declared branch is "long"
    with pytest.raises(ParseError, match="union branch"):
        from_avro_json(Everything, enc)


def test_unwrapped_nullable_rejected():
    enc = to_avro_json(_sample())
    enc["nick"] = "bare"  # nullable values must be union-wrapped
    with pytest.raises(ParseError, match="union-wrapped"):
        from_avro_json(Everything, enc)


def test_decoded_values_are_validated():
    enc = to_avro_json(_sample())
    enc["color"] = {"color_enum": "green"}  # not in the enum domain
    with pytest.raises(ParseError, match="enum"):
        from_avro_json(Everything, enc)


def test_branch_names_match_emitted_avro_schema():
    """The union branch keys must agree with the types declared by
    get_avro_schema_dict, or a real Avro JSON decoder would reject the
    payload."""
    from pyschema_ray import get_avro_schema_dict
    from pyschema_ray.avro_json import _branch_name

    schema = get_avro_schema_dict(Everything)
    by_name = {f["name"]: f["type"] for f in schema["fields"]}
    for n, f in Everything._fields.items():
        if not f.nullable:
            continue
        declared = by_name[n]
        assert isinstance(declared, list) and declared[0] == "null"
        t = declared[1]
        if isinstance(t, dict):
            t = t.get("name") or t.get("type")
        assert _branch_name(f) == t, n


# -- property-based round-trip ------------------------------------------------

from hypothesis import given, settings, strategies as st


def _maybe(s):
    return st.one_of(st.none(), s)


@settings(max_examples=60, deadline=None)
@given(
    name=st.text(min_size=1, max_size=20),
    nick=_maybe(st.text(max_size=20)),
    n=st.integers(-2**31, 2**31 - 1),
    big=_maybe(st.integers(-2**63, 2**63 - 1)),
    ratio=_maybe(st.floats(allow_nan=False, allow_infinity=False,
                           width=64)),
    ok=_maybe(st.booleans()),
    blob=_maybe(st.binary(max_size=64)),
    day=_maybe(st.dates(min_value=dt.date(1900, 1, 1),
                        max_value=dt.date(2200, 1, 1))),
    when=_maybe(st.datetimes(min_value=dt.datetime(1900, 1, 1),
                             max_value=dt.datetime(2200, 1, 1))),
    color=_maybe(st.sampled_from(["red", "blue"])),
    tags=st.lists(st.text(max_size=10), max_size=5),
    counts=_maybe(st.dictionaries(st.text(max_size=8),
                                  st.integers(-2**40, 2**40), max_size=4)),
)
def test_avro_json_round_trip_property(name, nick, n, big, ratio, ok, blob,
                                       day, when, color, tags, counts):
    """Any valid Everything record round-trips through the Avro-JSON
    line exactly (microsecond datetime granularity, arbitrary bytes via
    latin-1, full int64 range un-mangled by the union wrapping)."""
    r = Everything(name=name, nick=nick, n=n, big=big, ratio=ratio,
                   short_ratio=None, ok=ok, blob=blob, day=day, when=when,
                   color=color, tags=tags, counts=counts,
                   sub=Inner(tag="t"))
    back = avro_loads(avro_dumps(r), Everything)
    assert back == r


def test_datetime_microseconds_exact_far_future():
    """Regression: float total_seconds() lost microseconds past ~2107;
    encoding must be integer-exact across the whole range."""
    for when in (dt.datetime(2107, 1, 17, 17, 36, 55, 433211),
                 dt.datetime(2199, 12, 31, 23, 59, 59, 999999),
                 dt.datetime(1900, 1, 1, 0, 0, 0, 1)):
        r = Everything(name="a", n=1, tags=[], when=when)
        assert avro_loads(avro_dumps(r), Everything).when == when
