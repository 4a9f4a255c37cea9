"""Avro-JSON value serialization (R14 — the analog of the reference's
``pyschema_extensions/avro.py`` dumps/loads).

Avro's JSON encoding differs from plain JSON in one structural way:
values of a union type are wrapped in a single-key object naming the
branch, so a nullable string field holding ``"x"`` encodes as
``{"string": "x"}`` (and ``null`` stays bare ``null``).  Branch keys
are the Avro type names: primitive names for primitives, ``"array"`` /
``"map"`` for unnamed complex types, and the full name for named types
(records, enums).  Value-level conventions follow the Avro spec:

* Date   -> int   (days since epoch; logicalType ``date``)
* DateTime -> long (microseconds since epoch, naive == UTC;
  logicalType ``timestamp-micros``)
* Bytes  -> string via latin-1 (each byte maps to the code point —
  the Avro JSON-encoding rule, NOT base64 as in the plain-JSON path)

Round-trips with the Avro schemas emitted by
:func:`pyschema_ray.schema.get_avro_schema_dict` (branch names match
what that schema declares for each union).
"""

from __future__ import annotations

import datetime as _dt
import json as _json
from typing import Any

from .schema import ParseError, Record

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def _branch_name(f) -> str:
    """Avro union-branch key for a field's non-null type — must agree
    with the type emitted by schema.get_avro_schema_dict."""
    tname = type(f).__name__
    if tname == "Integer":
        return "int" if f.size == 4 else "long"
    if tname == "Float":
        return "float" if f.size == 4 else "double"
    if tname == "Enum":
        return f"{f.name}_enum"
    if tname == "List":
        return "array"
    if tname == "Map":
        return "map"
    if tname == "SubRecord":
        return f.record_cls._schema_name
    return {"Text": "string", "Bytes": "bytes", "Boolean": "boolean",
            "Date": "int", "DateTime": "long"}.get(tname, "string")


def _encode(f, v: Any) -> Any:
    tname = type(f).__name__
    if tname == "Date":
        return (v - _EPOCH_DATE).days
    if tname == "DateTime":
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        # integer arithmetic — total_seconds() goes through float64 and
        # loses sub-microsecond precision past ~2^52 µs (year ~2107)
        d = v - _EPOCH_DT
        return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
    if tname == "Bytes":
        return v.decode("latin-1")
    if tname == "List":
        return [_wrap(f.subtype, x) for x in v]
    if tname == "Map":
        return {str(k): _wrap(f.value_type, x) for k, x in v.items()}
    if tname == "SubRecord":
        return to_avro_json(v)
    return v


def _wrap(f, v: Any) -> Any:
    """Encode one value, union-wrapping when the field is nullable."""
    if v is None:
        return None
    enc = _encode(f, v)
    return {_branch_name(f): enc} if f.nullable else enc


def _decode(f, v: Any) -> Any:
    tname = type(f).__name__
    if tname == "Date":
        return _EPOCH_DATE + _dt.timedelta(days=int(v))
    if tname == "DateTime":
        return _EPOCH_DT + _dt.timedelta(microseconds=int(v))
    if tname == "Bytes":
        return v.encode("latin-1")
    if tname == "List":
        return [_unwrap(f.subtype, x) for x in v]
    if tname == "Map":
        return {str(k): _unwrap(f.value_type, x) for k, x in v.items()}
    if tname == "SubRecord":
        return from_avro_json(f.record_cls, v)
    return v


def _unwrap(f, v: Any) -> Any:
    if v is None:
        if not f.nullable:
            raise ParseError(f"{f.name}: null not allowed")
        return None
    if f.nullable:
        if not isinstance(v, dict) or len(v) != 1:
            raise ParseError(
                f"{f.name}: expected union-wrapped value, got {v!r}")
        (branch, inner), = v.items()
        expect = _branch_name(f)
        if branch != expect:
            raise ParseError(
                f"{f.name}: union branch {branch!r} != {expect!r}")
        return _decode(f, inner)
    return _decode(f, v)


def to_avro_json(record: Record) -> dict:
    """Validated Record -> Avro-JSON-encoded dict (union-wrapped
    nullables)."""
    return {n: _wrap(f, getattr(record, n))
            for n, f in record._fields.items()}


def from_avro_json(cls: type[Record], dct: dict) -> Record:
    """Avro-JSON dict -> validated Record (every decoded value is
    re-validated through its field's ``load``, mirroring
    ``Record.from_json_compatible`` defaulting semantics)."""
    if not isinstance(dct, dict):
        raise ParseError(f"not an avro record object: {dct!r}")
    unknown = set(dct) - set(cls._fields)
    if unknown:
        raise ParseError(f"unknown fields: {sorted(unknown)}")
    from .schema import _MISSING

    vals = {}
    for n, f in cls._fields.items():
        if n in dct:
            vals[n] = f.load(_unwrap(f, dct[n]))
        elif f.default is not _MISSING:
            vals[n] = f.default
        elif not f.nullable:
            raise ParseError(f"missing required field {n!r}")
        else:
            vals[n] = None
    rec = cls.__new__(cls)
    for k, v in vals.items():
        setattr(rec, k, v)
    return rec


def avro_dumps(record: Record) -> str:
    """Record -> Avro-JSON line.  Unlike :func:`pyschema_ray.dumps`
    there is no ``$schema`` injection: Avro data always travels with
    its schema, so ``avro_loads`` takes the Record class explicitly."""
    return _json.dumps(to_avro_json(record))


def avro_loads(s: str, schema: type[Record]) -> Record:
    try:
        dct = _json.loads(s)
    except ValueError as e:
        raise ParseError(f"invalid JSON: {e}") from e
    return from_avro_json(schema, dct)
