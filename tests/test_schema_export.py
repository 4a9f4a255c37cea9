"""dumps/loads with $schema resolution (reference core.py semantics),
avro + JSON-Schema export, from-Arrow inverse construction, and the
E2 schema-conformance violation path."""

import pyarrow as pa
import pytest

from pyschema_ray import (Integer, List, ParseError, Record, Text, dumps,
                          get_avro_schema_dict, get_json_schema, loads,
                          record_from_arrow, schema_store)
from pyschema_ray.stages.validator import CompiledValidator


class Song(Record):
    title = Text(nullable=False)
    plays = Integer(size=8)
    tags = List(Text())


def test_dumps_loads_round_trip_via_store():
    s = Song.from_json_compatible({"title": "x", "plays": 3,
                                   "tags": ["a", "b"]})
    line = dumps(s)
    assert '"$schema": "Song"' in line
    back = loads(line)  # resolved from the global store by $schema
    assert back == s
    assert back.tags == ["a", "b"]


def test_loads_explicit_schema_and_errors():
    line = dumps(Song.from_json_compatible({"title": "y", "tags": []}))
    back = loads(line, schema=Song)
    assert back.title == "y"
    with pytest.raises(ParseError):
        # List is nullable=False by default (reference semantics)
        Song.from_json_compatible({"title": "y"})
    with pytest.raises(ParseError):
        loads("not json")
    with pytest.raises(ParseError):
        loads('{"title": "z", "tags": []}')  # no $schema, no schema=
    with pytest.raises(ParseError):
        loads('{"$schema": "NoSuchSchema", "title": "z"}')


def test_avro_schema_dict():
    d = get_avro_schema_dict(Song)
    assert d["type"] == "record" and d["name"] == "Song"
    by_name = {f["name"]: f["type"] for f in d["fields"]}
    assert by_name["title"] == "string"  # not nullable -> no union
    assert by_name["plays"] == ["null", "long"]
    assert by_name["tags"] == {"type": "array",
                               "items": ["null", "string"]}


def test_json_schema():
    j = get_json_schema(Song)
    assert j["title"] == "Song"
    assert j["required"] == ["title", "tags"]  # List nullable=False default
    assert j["properties"]["plays"]["type"] == "integer"
    assert j["properties"]["tags"]["type"] == "array"


def test_record_from_arrow_round_trip():
    arrow = pa.schema([
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("score", pa.float64()),
    ])
    cls = record_from_arrow(arrow, name="FromParquet", key_field="doc_id")
    assert cls.key_field() == "doc_id"
    back = cls.to_arrow()
    assert back.field("doc_id").type == pa.string()
    assert not back.field("doc_id").nullable
    assert back.field("tokens").type == pa.list_(pa.int32())
    assert back.field("score").type == pa.float64()
    assert "FromParquet" in schema_store
    r = cls.from_json_compatible({"doc_id": "d1", "tokens": [1, 2],
                                  "n_tok": 2, "score": 0.5})
    assert r.doc_id == "d1"


def test_schema_conformance_violations():
    """E2: missing column and un-castable type produce frozen
    schema(col) violation rows keyed '<schema>'."""

    class Strict(Record):
        a = Text(nullable=False)
        b = Integer(size=4)
        _key_field = "a"

    import pyarrow.compute as _pc

    def viol_rows(t):
        return t.filter(_pc.equal(t["kind"], "violation")).to_pylist()

    v = CompiledValidator(Strict)
    # missing column b
    viol = viol_rows(v(pa.table({"a": pa.array(["x", "y"])})))
    assert [r["constraint"] for r in viol] == ["schema(b)"]
    assert viol[0]["key"] == "<schema>"
    assert viol[0]["detail"] == "column missing"
    # un-castable type for b (string), castable int64->int32 for ok case
    viol2 = viol_rows(v(pa.table({"a": pa.array(["x"]),
                                  "b": pa.array(["notint"])})))
    assert [r["constraint"] for r in viol2] == ["schema(b)"]
    viol3 = viol_rows(v(pa.table({"a": pa.array(["x"]),
                                  "b": pa.array([1], pa.int64())})))
    assert viol3 == []  # int64 -> int32 is castable: conforms


def test_postgres_ddl():
    """R18 — postgres DDL generation from a Record class."""
    from pyschema_ray import (Boolean, Bytes, Date, DateTime, Enum, Float,
                              Integer, List, Map, Record, SubRecord, Text,
                              get_postgres_ddl, no_auto_store)

    @no_auto_store
    class Part(Record):
        tag = Text(nullable=False)

    @no_auto_store
    class Item(Record):
        item_id = Text(nullable=False, unique=True)
        qty = Integer(size=4, min=0, max=100, nullable=False)
        big = Integer(size=8)
        price = Float(size=8)
        ratio = Float(size=4)
        ok = Boolean()
        blob = Bytes()
        day = Date()
        ts = DateTime()
        color = Enum(["red", "blue"])
        tags = List(Text(nullable=False))
        attrs = Map(Text(nullable=False))
        part = SubRecord(Part)
        _key_field = "item_id"

    ddl = get_postgres_ddl(Item)
    assert ddl.startswith("CREATE TABLE item (")
    assert "item_id TEXT NOT NULL PRIMARY KEY" in ddl
    assert "qty INTEGER NOT NULL CHECK (qty >= 0 AND qty <= 100)" in ddl
    assert "big BIGINT" in ddl
    assert "price DOUBLE PRECISION" in ddl
    assert "ratio REAL" in ddl
    assert "ok BOOLEAN" in ddl
    assert "blob BYTEA" in ddl
    assert "day DATE" in ddl
    assert "ts TIMESTAMP" in ddl
    assert "color TEXT CHECK (color IN ('blue', 'red'))" in ddl
    assert "tags TEXT[]" in ddl
    assert "attrs JSONB" in ddl
    assert "part JSONB" in ddl
    assert ddl.rstrip().endswith(");")
    # DuckDB speaks enough postgres DDL to parse most of this — use it
    # as a syntax sanity check with the postgres-specific bits adapted
    import duckdb
    con = duckdb.connect()
    safe = ddl.replace("BYTEA", "BLOB").replace("JSONB", "JSON") \
              .replace("TEXT[]", "TEXT[]")
    con.execute(safe)
    cols = {r[0] for r in con.execute(
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name = 'item'").fetchall()}
    assert cols == set(Item._fields)


def test_postgres_ddl_quoting():
    """Regression: enum values containing quotes must be ''-escaped and
    reserved-word / non-bare identifiers must be quoted."""
    from pyschema_ray import Enum, Integer, Record, Text, get_postgres_ddl, \
        no_auto_store

    @no_auto_store
    class Tricky(Record):
        user = Text(nullable=False)          # reserved word
        order = Integer(size=8)              # reserved word
        MixedCase = Text()                   # not bare-safe
        mood = Enum(["ok", "it's fine"])
        _key_field = "user"

    ddl = get_postgres_ddl(Tricky)
    assert '"user" TEXT NOT NULL' in ddl
    assert '"order" BIGINT' in ddl
    assert '"MixedCase" TEXT' in ddl
    assert "CHECK (mood IN ('it''s fine', 'ok'))" in ddl
    import duckdb
    duckdb.connect().execute(ddl)  # parses
