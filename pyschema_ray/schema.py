"""Declarative, pyschema-style schema definitions compiled to Arrow.

A schema is a Python class whose class-level attributes are ``Field``
instances; a metaclass harvests them (in declaration order) into
``_fields`` and auto-registers the class in a global ``SchemaStore`` —
the same declaration surface as the reference's ``Record`` /
``PySchema`` metaclass / ``SchemaStore`` (reference semantics:
pyschema/core.py — class-attr harvesting, ordered ``_fields``,
``_schema_name``, auto-registration, ``no_auto_store`` opt-out).

Unlike the reference, a schema here compiles to TWO artifacts:

* ``to_arrow()`` — a ``pyarrow.Schema`` (the reference's analog is the
  avro schema emitted by pyschema_extensions/avro.py), and
* ``compiled_constraints()`` — an ordered list of vectorized
  :class:`~pyschema_ray.constraints.Constraint` objects evaluated over
  whole Arrow record batches (the reference validates value-at-a-time in
  ``Field.load``; we keep that row-at-a-time path too — see
  :meth:`Field.load` — because the test oracle uses it).

Field types mirror pyschema/types.py: Text, Bytes, Integer, Float,
Boolean, Date, DateTime, Enum, List, Map, SubRecord.  Each field both
(a) validates one value (``load``) / serializes one value (``dump``)
exactly like the reference, and (b) contributes vectorized constraints.
"""

from __future__ import annotations

import base64
import datetime as _dt
import re
from typing import Any, Callable, Iterable

import pyarrow as pa


class ParseError(Exception):
    """Raised by the row-at-a-time ``Field.load`` path on invalid input.

    Mirrors the reference's ParseError (pyschema/core.py).  The
    vectorized engine path never raises this mid-pipeline — violations
    are emitted as data rows instead.
    """


_MISSING = object()


class Field:
    """Base field descriptor.

    Parameters shared by all field types:

    nullable:     may the value be null (default True, like the reference
                  scalar fields).
    default:      value used when the field is absent at load time.
    description:  free-form doc string carried into the schema fingerprint.
    """

    # class-level counter preserves declaration order even on Pythons
    # where class bodies are not ordered dicts (they are, but the
    # reference used an explicit counter; keep it for stable sorting).
    _creation_counter = 0

    def __init__(self, nullable: bool = True, default: Any = _MISSING,
                 description: str | None = None, unique: bool = False,
                 references: tuple[str, str] | None = None):
        self.nullable = nullable
        self.default = default
        self.description = description
        self.unique = unique            # global uniqueness (E6 stage)
        self.references = references    # (dim_name, dim_column) (E7 stage)
        self.name: str | None = None  # set by the metaclass
        Field._creation_counter += 1
        self._order = Field._creation_counter

    # ---- row-at-a-time path (reference semantics; used by the oracle) ----
    def load(self, obj: Any) -> Any:
        """Parse + validate one JSON-compatible value; raise ParseError."""
        if obj is None:
            if not self.nullable:
                raise ParseError(f"{self.name}: null not allowed")
            return None
        return self._load(obj)

    def dump(self, obj: Any) -> Any:
        """One validated value -> JSON-compatible value."""
        if obj is None:
            return None
        return self._dump(obj)

    def _load(self, obj: Any) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def _dump(self, obj: Any) -> Any:
        return obj

    # ---- vectorized path ----
    def arrow_type(self) -> pa.DataType:  # pragma: no cover - abstract
        raise NotImplementedError

    def constraints(self) -> list:
        """Per-field vectorized constraints (beyond nullability/type)."""
        from . import constraints as C
        out: list = []
        if not self.nullable:
            out.append(C.NotNull(self.name))
        return out

    def fingerprint(self) -> dict:
        """JSON-compatible description used in the checkpoint manifest."""
        return {
            "name": self.name,
            "type": type(self).__name__,
            "arrow": str(self.arrow_type()),
            "nullable": self.nullable,
        }

    @classmethod
    def mixin(cls, mixin_cls: type | None = None):
        """Extension hook (R12 — the analog of the reference's
        ``pyschema/core.py`` ``Field.mixin``): inject every public
        attribute of ``mixin_cls`` into THIS field type (and, through
        inheritance, its subclasses unless they override).  Usable as
        a plain call ``Text.mixin(MyMethods)`` or as a decorator::

            @Field.mixin
            class AvroMethods:
                def avro_type(self): ...

        This is how exporter extensions attach per-field methods the
        way the reference's avro/jsonschema extensions do upstream.
        Returns ``mixin_cls`` so decorator stacking works.
        """
        def apply(m: type) -> type:
            for attr, val in vars(m).items():
                if attr.startswith("__") and attr.endswith("__"):
                    continue
                setattr(cls, attr, val)
            return m
        return apply(mixin_cls) if mixin_cls is not None else apply


class Text(Field):
    """Unicode string.  Extra constraints: ``regex``, ``min_length``,
    ``max_length``, ``in_set`` (value domain), ``unique`` (global),
    ``references`` ((dim_name, column) referential check against a
    broadcast dimension table)."""

    def __init__(self, regex: str | None = None, min_length: int | None = None,
                 max_length: int | None = None, in_set: Iterable[str] | None = None,
                 **kw):
        super().__init__(**kw)
        self.regex = regex
        self._regex_c = re.compile(regex) if regex else None
        self.min_length = min_length
        self.max_length = max_length
        self.in_set = frozenset(in_set) if in_set is not None else None

    def _load(self, obj):
        if not isinstance(obj, str):
            raise ParseError(f"{self.name}: not text: {obj!r}")
        if self._regex_c is not None and not self._regex_c.search(obj):
            raise ParseError(f"{self.name}: regex mismatch: {obj!r}")
        if self.min_length is not None and len(obj) < self.min_length:
            raise ParseError(f"{self.name}: too short")
        if self.max_length is not None and len(obj) > self.max_length:
            raise ParseError(f"{self.name}: too long")
        if self.in_set is not None and obj not in self.in_set:
            raise ParseError(f"{self.name}: not in domain: {obj!r}")
        return obj

    def arrow_type(self):
        return pa.string()

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        if self.regex:
            out.append(C.Regex(self.name, self.regex))
        if self.min_length is not None or self.max_length is not None:
            out.append(C.Utf8Length(self.name, self.min_length, self.max_length))
        if self.in_set is not None:
            out.append(C.InSet(self.name, sorted(self.in_set)))
        return out


class Bytes(Field):
    """Binary; base64 in JSON dumps (reference: pyschema/types.py Bytes)."""

    def _load(self, obj):
        if isinstance(obj, bytes):
            return obj
        if isinstance(obj, str):
            try:
                return base64.b64decode(obj)
            except Exception as e:  # noqa: BLE001
                raise ParseError(f"{self.name}: bad base64") from e
        raise ParseError(f"{self.name}: not bytes: {obj!r}")

    def _dump(self, obj):
        return base64.b64encode(obj).decode("ascii")

    def arrow_type(self):
        return pa.binary()


class Integer(Field):
    """Integer; ``size`` in bytes selects int32 vs int64 (the reference
    uses size to pick avro int vs long).  Extra constraints: ``min`` /
    ``max`` inclusive bounds, ``equals_length_of`` (value must equal the
    list length of another column — the n_tok == len(tokens) invariant)."""

    def __init__(self, size: int = 8, min: int | None = None,  # noqa: A002
                 max: int | None = None,  # noqa: A002
                 equals_length_of: str | None = None, **kw):
        super().__init__(**kw)
        if size not in (4, 8):
            raise ValueError("Integer size must be 4 or 8 bytes")
        self.size = size
        self.min = min
        self.max = max
        self.equals_length_of = equals_length_of

    def _load(self, obj):
        if isinstance(obj, bool) or not isinstance(obj, int):
            raise ParseError(f"{self.name}: not an integer: {obj!r}")
        if self.min is not None and obj < self.min:
            raise ParseError(f"{self.name}: {obj} < min {self.min}")
        if self.max is not None and obj > self.max:
            raise ParseError(f"{self.name}: {obj} > max {self.max}")
        return obj

    def arrow_type(self):
        return pa.int32() if self.size == 4 else pa.int64()

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        if self.min is not None or self.max is not None:
            out.append(C.Range(self.name, self.min, self.max))
        if self.equals_length_of:
            out.append(C.LengthEquals(self.name, self.equals_length_of))
        return out


class Float(Field):
    def __init__(self, size: int = 8, min: float | None = None,  # noqa: A002
                 max: float | None = None, **kw):  # noqa: A002
        super().__init__(**kw)
        if size not in (4, 8):
            raise ValueError("Float size must be 4 or 8 bytes")
        self.size = size
        self.min = min
        self.max = max

    def _load(self, obj):
        if isinstance(obj, bool) or not isinstance(obj, (int, float)):
            raise ParseError(f"{self.name}: not a float: {obj!r}")
        v = float(obj)
        if self.min is not None and v < self.min:
            raise ParseError(f"{self.name}: {v} < min {self.min}")
        if self.max is not None and v > self.max:
            raise ParseError(f"{self.name}: {v} > max {self.max}")
        return v

    def arrow_type(self):
        return pa.float32() if self.size == 4 else pa.float64()

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        if self.min is not None or self.max is not None:
            out.append(C.Range(self.name, self.min, self.max))
        return out


class Boolean(Field):
    def _load(self, obj):
        if not isinstance(obj, bool):
            raise ParseError(f"{self.name}: not a bool: {obj!r}")
        return obj

    def arrow_type(self):
        return pa.bool_()


class Date(Field):
    """date <-> ISO 'YYYY-MM-DD' (reference: pyschema/types.py Date)."""

    def _load(self, obj):
        if isinstance(obj, _dt.date) and not isinstance(obj, _dt.datetime):
            return obj
        if isinstance(obj, str):
            try:
                return _dt.date.fromisoformat(obj)
            except ValueError as e:
                raise ParseError(f"{self.name}: bad date {obj!r}") from e
        raise ParseError(f"{self.name}: not a date: {obj!r}")

    def _dump(self, obj):
        return obj.isoformat()

    def arrow_type(self):
        return pa.date32()


class DateTime(Field):
    def _load(self, obj):
        if isinstance(obj, _dt.datetime):
            return obj
        if isinstance(obj, str):
            try:
                return _dt.datetime.fromisoformat(obj)
            except ValueError as e:
                raise ParseError(f"{self.name}: bad datetime {obj!r}") from e
        raise ParseError(f"{self.name}: not a datetime: {obj!r}")

    def _dump(self, obj):
        return obj.isoformat()

    def arrow_type(self):
        return pa.timestamp("us")


class Enum(Field):
    """String with a closed value domain (reference: Enum(values))."""

    def __init__(self, values: Iterable[str], **kw):
        super().__init__(**kw)
        self.values = frozenset(values)

    def _load(self, obj):
        if not isinstance(obj, str) or obj not in self.values:
            raise ParseError(f"{self.name}: not in enum: {obj!r}")
        return obj

    def arrow_type(self):
        return pa.string()

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        out.append(C.InSet(self.name, sorted(self.values)))
        return out


class List(Field):
    """Homogeneous list.  Matches the reference's List(subtype); like the
    reference, ``nullable=False`` by default for lists.  Extra
    constraints: ``element_min``/``element_max`` (closed-open range
    [min, max) over every element — the token-id in [0, vocab) check),
    ``min_items``/``max_items``."""

    def __init__(self, subtype: Field, nullable: bool = False,
                 element_min: int | float | None = None,
                 element_max: int | float | None = None,
                 min_items: int | None = None, max_items: int | None = None,
                 **kw):
        super().__init__(nullable=nullable, **kw)
        self.subtype = subtype
        self.element_min = element_min
        self.element_max = element_max
        self.min_items = min_items
        self.max_items = max_items

    def _load(self, obj):
        if not isinstance(obj, (list, tuple)):
            raise ParseError(f"{self.name}: not a list: {obj!r}")
        self.subtype.name = self.subtype.name or f"{self.name}[]"
        out = [self.subtype.load(v) for v in obj]
        if self.min_items is not None and len(out) < self.min_items:
            raise ParseError(f"{self.name}: too few items")
        if self.max_items is not None and len(out) > self.max_items:
            raise ParseError(f"{self.name}: too many items")
        for v in out:
            if v is None:
                continue
            if self.element_min is not None and v < self.element_min:
                raise ParseError(f"{self.name}: element {v} < {self.element_min}")
            if self.element_max is not None and v >= self.element_max:
                raise ParseError(f"{self.name}: element {v} >= {self.element_max}")
        return list(out)

    def _dump(self, obj):
        return [self.subtype.dump(v) for v in obj]

    def arrow_type(self):
        return pa.list_(self.subtype.arrow_type())

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        if self.element_min is not None or self.element_max is not None:
            out.append(C.ElementRange(self.name, self.element_min, self.element_max))
        if self.min_items is not None or self.max_items is not None:
            out.append(C.ListLength(self.name, self.min_items, self.max_items))
        return out


class Map(Field):
    """String-keyed map (reference: Map(value_type)).  Extra
    constraints: ``required_keys`` (every map must contain them) and
    ``value_min``/``value_max`` (numeric half-open range over the map
    VALUES) — enforced identically by the row path (``_load`` raises
    ParseError) and the vectorized path (MapRequiredKeys /
    MapValueRange over the flattened map children)."""

    def __init__(self, value_type: Field, required_keys=None,
                 value_min=None, value_max=None, **kw):
        super().__init__(**kw)
        self.value_type = value_type
        self.required_keys = sorted(required_keys) if required_keys else None
        self.value_min = value_min
        self.value_max = value_max

    def _load(self, obj):
        if not isinstance(obj, dict):
            raise ParseError(f"{self.name}: not a map: {obj!r}")
        self.value_type.name = self.value_type.name or f"{self.name}{{}}"
        out = {str(k): self.value_type.load(v) for k, v in obj.items()}
        if self.required_keys:
            missing = [k for k in self.required_keys if k not in out]
            if missing:
                raise ParseError(f"{self.name}: missing required "
                                 f"key(s) {missing}")
        if self.value_min is not None or self.value_max is not None:
            for k, v in out.items():
                if v is None:
                    continue
                if (self.value_min is not None and v < self.value_min) or \
                        (self.value_max is not None and v >= self.value_max):
                    raise ParseError(
                        f"{self.name}: value for {k!r} outside "
                        f"[{self.value_min}, {self.value_max})")
        return out

    def _dump(self, obj):
        return {k: self.value_type.dump(v) for k, v in obj.items()}

    def arrow_type(self):
        return pa.map_(pa.string(), self.value_type.arrow_type())

    def constraints(self):
        from . import constraints as C
        out = super().constraints()
        if self.required_keys:
            out.append(C.MapRequiredKeys(self.name, self.required_keys))
        if self.value_min is not None or self.value_max is not None:
            out.append(C.MapValueRange(self.name, self.value_min,
                                       self.value_max))
        return out


class SubRecord(Field):
    """Nested record (reference: SubRecord(RecordClass)) -> Arrow struct."""

    def __init__(self, record_cls: type["Record"], **kw):
        super().__init__(**kw)
        self.record_cls = record_cls

    def _load(self, obj):
        if isinstance(obj, self.record_cls):
            return obj  # already-validated record passes through
        if not isinstance(obj, dict):
            raise ParseError(f"{self.name}: not a record: {obj!r}")
        return self.record_cls.from_json_compatible(obj)

    def _dump(self, obj):
        return obj.to_json_compatible()

    def arrow_type(self):
        return pa.struct([pa.field(n, f.arrow_type(), nullable=f.nullable)
                          for n, f in self.record_cls._fields.items()])

    def constraints(self):
        """Own nullability plus the nested record's field constraints,
        hoisted to dotted paths (``parent.child``) — the vectorized
        analog of the reference's recursive ``from_json_compatible``
        descent (children of a NULL record are skipped on both paths).
        Nested ``unique``/``references`` declarations are not hoisted
        (global checks stay top-level by design)."""
        out = super().constraints()
        for f in self.record_cls._fields.values():
            out.extend(c.rebind(self.name) for c in f.constraints())
        return out


# ---------------------------------------------------------------------------
# SchemaStore + Record metaclass
# ---------------------------------------------------------------------------

class SchemaStore:
    """name -> Record-class registry (reference: pyschema/core.py
    SchemaStore; classes auto-register at definition time)."""

    def __init__(self):
        self._schemas: dict[str, type[Record]] = {}

    def add_record(self, cls: type["Record"]) -> None:
        self._schemas[cls._schema_name] = cls

    def get(self, name: str) -> type["Record"]:
        try:
            return self._schemas[name]
        except KeyError:
            raise KeyError(f"schema not in store: {name!r}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._schemas


#: module-level default store, like the reference's auto-registry.
schema_store = SchemaStore()


def no_auto_store(cls: type["Record"]) -> type["Record"]:
    """Decorator: opt a Record class out of auto-registration
    (reference: pyschema/core.py no_auto_store)."""
    if cls._schema_name in schema_store._schemas and \
            schema_store._schemas[cls._schema_name] is cls:
        del schema_store._schemas[cls._schema_name]
    return cls


class PySchemaMeta(type):
    """Harvest Field class attributes into ordered ``_fields``; set
    ``_schema_name``; auto-register (reference: the PySchema metaclass)."""

    def __new__(mcs, name, bases, ns):
        fields: dict[str, Field] = {}
        for base in bases:  # inherit parent fields first (subclass schemas)
            fields.update(getattr(base, "_fields", {}))
        own = [(k, v) for k, v in ns.items() if isinstance(v, Field)]
        own.sort(key=lambda kv: kv[1]._order)
        for k, v in own:
            v.name = k
            fields[k] = v
        ns["_fields"] = fields
        ns.setdefault("_schema_name", name)
        cls = super().__new__(mcs, name, bases, ns)
        if name != "Record":
            schema_store.add_record(cls)
        return cls


class Record(metaclass=PySchemaMeta):
    """Base schema class.  Subclass and declare Field attributes.

    Class-level config attributes (optional):

    _key_field:   name of the column identifying a row in violation
                  reports (e.g. ``"doc_id"``).  Defaults to the first
                  declared field.
    _extra_constraints: list of additional Constraint objects (custom
                  validators — the analog of pyschema custom validators).
    """

    _fields: dict[str, Field] = {}
    _key_field: str | None = None
    _extra_constraints: list = []

    # ---- row-at-a-time construction (reference Record semantics) ----
    def __init__(self, **kwargs):
        for name, field in self._fields.items():
            if name in kwargs:
                setattr(self, name, kwargs.pop(name))
            elif field.default is not _MISSING:
                setattr(self, name, field.default)
            else:
                setattr(self, name, None)
        if kwargs:
            raise ParseError(f"unknown fields: {sorted(kwargs)}")

    def __eq__(self, other):
        return (isinstance(other, Record)
                and self._schema_name == other._schema_name
                and all(getattr(self, n) == getattr(other, n)
                        for n in self._fields))

    def __repr__(self):
        body = ", ".join(f"{n}={getattr(self, n)!r}" for n in self._fields)
        return f"{self._schema_name}({body})"

    def to_json_compatible(self) -> dict:
        return {n: f.dump(getattr(self, n)) for n, f in self._fields.items()}

    @classmethod
    def from_json_compatible(cls, dct: dict) -> "Record":
        unknown = set(dct) - set(cls._fields)
        if unknown:
            raise ParseError(f"unknown fields: {sorted(unknown)}")
        vals = {}
        for n, f in cls._fields.items():
            if n in dct:
                vals[n] = f.load(dct[n])
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

    # ---- compiled / engine path ----
    @classmethod
    def key_field(cls) -> str:
        return cls._key_field or next(iter(cls._fields))

    @classmethod
    def to_arrow(cls) -> pa.Schema:
        return pa.schema([pa.field(n, f.arrow_type(), nullable=f.nullable)
                          for n, f in cls._fields.items()])

    @classmethod
    def compiled_constraints(cls) -> list:
        """Ordered vectorized constraints.  Order is frozen: declaration
        order of fields, then per-field constraint order, then
        ``_extra_constraints`` — violation-row parity depends on this."""
        out: list = []
        for f in cls._fields.values():
            out.extend(f.constraints())
        out.extend(cls._extra_constraints)
        return out

    @classmethod
    def unique_fields(cls) -> list[str]:
        return [n for n, f in cls._fields.items()
                if getattr(f, "unique", False)]

    @classmethod
    def referential_fields(cls) -> dict[str, tuple[str, str]]:
        return {n: f.references for n, f in cls._fields.items()
                if getattr(f, "references", None)}

    @classmethod
    def fingerprint(cls) -> dict:
        """Stable JSON description of the schema, embedded in the
        checkpoint manifest for lineage (analog of the reference's avro
        schema string, pyschema_extensions/avro.py get_schema_string)."""
        return {
            "name": cls._schema_name,
            "key_field": cls.key_field(),
            "fields": [f.fingerprint() for f in cls._fields.values()],
            # name AND detail: the detail string carries the constraint
            # PARAMETERS (range bounds, regex pattern, ...).  Hashing
            # names alone let e.g. a Range bounds change keep the same
            # schema_hash, so a resume would silently skip shards
            # validated under different bounds — verdict-unsound.
            "constraints": [{"name": c.name, "detail": c.detail}
                            for c in cls.compiled_constraints()],
        }


def ispyschema(obj) -> bool:
    """Reference: pyschema/core.py ispyschema."""
    return isinstance(obj, type) and issubclass(obj, Record) and obj is not Record


# ---------------------------------------------------------------------------
# record serialization with $schema injection (reference: pyschema/core.py
# dumps/loads — JSON line <-> registry-resolved validated record)
# ---------------------------------------------------------------------------

SCHEMA_FIELD_NAME = "$schema"


def dumps(record: Record) -> str:
    """Record -> JSON line, injecting the schema name under ``$schema``
    so ``loads`` can resolve the class from the store."""
    import json as _json

    dct = record.to_json_compatible()
    dct[SCHEMA_FIELD_NAME] = record._schema_name
    return _json.dumps(dct)


def loads(s: str, record_store: SchemaStore | None = None,
          schema: type[Record] | None = None) -> Record:
    """JSON line -> validated Record.  Resolution order mirrors the
    reference: explicit ``schema`` arg wins, else the ``$schema`` field
    is looked up in ``record_store`` (default: the global store);
    missing both raises ParseError."""
    import json as _json

    try:
        dct = _json.loads(s)
    except ValueError as e:
        raise ParseError(f"invalid JSON: {e}") from e
    if not isinstance(dct, dict):
        raise ParseError("JSON line is not an object")
    name = dct.pop(SCHEMA_FIELD_NAME, None)
    if schema is None:
        if name is None:
            raise ParseError("no $schema field and no schema= given")
        store = record_store or schema_store
        try:
            schema = store.get(name)
        except KeyError as e:
            raise ParseError(str(e)) from e
    return schema.from_json_compatible(dct)


# ---------------------------------------------------------------------------
# schema export / import (reference: pyschema_extensions/avro.py
# get_schema_dict/get_schema_string, jsonschema.py, avro_to_pyschema.py)
# ---------------------------------------------------------------------------

_AVRO_PRIMITIVES = {
    "Text": "string", "Bytes": "bytes", "Boolean": "boolean",
    "Date": {"type": "int", "logicalType": "date"},
    "DateTime": {"type": "long", "logicalType": "timestamp-micros"},
}


def _avro_type(f: Field, state: set) -> Any:
    tname = type(f).__name__
    if tname == "Integer":
        t = "int" if f.size == 4 else "long"
    elif tname == "Float":
        t = "float" if f.size == 4 else "double"
    elif tname == "Enum":
        t = {"type": "enum", "name": f"{f.name}_enum",
             "symbols": sorted(f.values)}
    elif tname == "List":
        t = {"type": "array", "items": _avro_type(f.subtype, state)}
    elif tname == "Map":
        t = {"type": "map", "values": _avro_type(f.value_type, state)}
    elif tname == "SubRecord":
        # state set avoids re-defining an already-emitted subrecord
        # (same trick as the reference's avro mixin)
        rname = f.record_cls._schema_name
        if rname in state:
            t = rname
        else:
            state.add(rname)
            t = get_avro_schema_dict(f.record_cls, state)
    else:
        t = _AVRO_PRIMITIVES.get(tname, "string")
    if f.nullable:
        return ["null", t]
    return t


def get_avro_schema_dict(cls: type[Record], _state: set | None = None) -> dict:
    """Avro record schema (plain dict) for a Record class — the analog
    of the reference's ``avro.get_schema_dict``."""
    state = _state if _state is not None else {cls._schema_name}
    return {
        "type": "record",
        "name": cls._schema_name,
        "fields": [{"name": n, "type": _avro_type(f, state)}
                   for n, f in cls._fields.items()],
    }


def get_avro_schema_string(cls: type[Record]) -> str:
    import json as _json

    return _json.dumps(get_avro_schema_dict(cls), indent=2)


_JSONSCHEMA_TYPES = {
    "Text": {"type": "string"}, "Bytes": {"type": "string",
                                          "contentEncoding": "base64"},
    "Integer": {"type": "integer"}, "Float": {"type": "number"},
    "Boolean": {"type": "boolean"},
    "Date": {"type": "string", "format": "date"},
    "DateTime": {"type": "string", "format": "date-time"},
}


def _jsonschema_type(f: Field) -> dict:
    tname = type(f).__name__
    if tname == "Enum":
        t: dict = {"type": "string", "enum": sorted(f.values)}
    elif tname == "List":
        t = {"type": "array", "items": _jsonschema_type(f.subtype)}
    elif tname == "Map":
        t = {"type": "object",
             "additionalProperties": _jsonschema_type(f.value_type)}
    elif tname == "SubRecord":
        t = get_json_schema(f.record_cls)
    else:
        t = dict(_JSONSCHEMA_TYPES.get(tname, {"type": "string"}))
    if tname == "Integer":
        if f.min is not None:
            t["minimum"] = f.min
        if f.max is not None:
            t["maximum"] = f.max
    if tname == "Text" and f.regex:
        t["pattern"] = f.regex
    return t


def get_json_schema(cls: type[Record]) -> dict:
    """JSON-Schema document for a Record class (reference:
    pyschema_extensions/jsonschema.py)."""
    required = [n for n, f in cls._fields.items() if not f.nullable]
    out = {
        "type": "object",
        "title": cls._schema_name,
        "properties": {n: _jsonschema_type(f)
                       for n, f in cls._fields.items()},
        "additionalProperties": False,
    }
    if required:
        out["required"] = required
    return out


_POSTGRES_TYPES = {
    "Text": "TEXT", "Bytes": "BYTEA", "Boolean": "BOOLEAN",
    "Date": "DATE", "DateTime": "TIMESTAMP",
}


def _postgres_type(f: Field) -> str:
    tname = type(f).__name__
    if tname == "Integer":
        return "INTEGER" if f.size == 4 else "BIGINT"
    if tname == "Float":
        return "REAL" if f.size == 4 else "DOUBLE PRECISION"
    if tname == "Enum":
        return "TEXT"
    if tname == "List":
        inner = _postgres_type(f.subtype)
        # postgres arrays only for scalar element types; nested
        # lists/records fall back to JSONB
        return f"{inner}[]" if "[" not in inner and inner != "JSONB" \
            else "JSONB"
    if tname in ("Map", "SubRecord"):
        return "JSONB"
    return _POSTGRES_TYPES.get(tname, "TEXT")


_PG_BARE_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")
_PG_RESERVED = frozenset("""
    all and any array as asc between case cast check collate column
    constraint create cross current_date current_time default desc
    distinct do else end except false for foreign from full grant group
    having in inner intersect into is join leading left like limit
    localtime natural not null offset on only or order outer primary
    references right select session_user some table then to trailing
    true union unique user using when where with
""".split())


def _pg_ident(name: str) -> str:
    if _PG_BARE_IDENT.match(name) and name not in _PG_RESERVED:
        return name
    return '"' + name.replace('"', '""') + '"'


def _pg_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def get_postgres_ddl(cls: type[Record], table_name: str | None = None) -> str:
    """CREATE TABLE statement for a Record class (R18 — the analog of
    the reference's pyschema_extensions/postgres.py type mapping).
    Declared semantics carry over where Postgres can express them:
    NOT NULL for non-nullable fields, PRIMARY KEY on the key field when
    it is non-nullable+unique, UNIQUE for ``unique=True`` fields, CHECK
    constraints for Enum domains and Integer ranges.  Identifiers are
    quoted when not bare-safe (reserved words, mixed case) and string
    literals are '' -escaped."""
    table = _pg_ident(table_name or cls._schema_name.lower())
    cols = []
    for n, f in cls._fields.items():
        ident = _pg_ident(n)
        parts = [ident, _postgres_type(f)]
        if not f.nullable:
            parts.append("NOT NULL")
        if n == cls.key_field() and not f.nullable and f.unique:
            parts.append("PRIMARY KEY")
        elif f.unique:
            parts.append("UNIQUE")
        tname = type(f).__name__
        if tname == "Enum":
            vals = ", ".join(_pg_str(v) for v in sorted(f.values))
            parts.append(f"CHECK ({ident} IN ({vals}))")
        elif tname == "Integer" and (f.min is not None or f.max is not None):
            checks = []
            if f.min is not None:
                checks.append(f"{ident} >= {f.min}")
            if f.max is not None:
                checks.append(f"{ident} <= {f.max}")
            parts.append(f"CHECK ({' AND '.join(checks)})")
        cols.append("    " + " ".join(parts))
    body = ",\n".join(cols)
    return f"CREATE TABLE {table} (\n{body}\n);"


def record_from_arrow(schema: pa.Schema, name: str = "Inferred",
                      key_field: str | None = None) -> type[Record]:
    """Inverse constructor: build a Record class from a pyarrow.Schema
    (the analog of the reference's avro_to_pyschema codegen — here the
    class is built directly instead of emitting source text)."""
    ns: dict[str, Any] = {"_schema_name": name}
    if key_field:
        ns["_key_field"] = key_field
    for f in schema:
        ns[f.name] = _field_from_arrow(f.type, f.nullable)
    return PySchemaMeta(name, (Record,), ns)


def _field_from_arrow(t: pa.DataType, nullable: bool) -> Field:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return Text(nullable=nullable)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return Bytes(nullable=nullable)
    if pa.types.is_integer(t):
        return Integer(size=4 if t.bit_width <= 32 else 8,
                       nullable=nullable)
    if pa.types.is_floating(t):
        return Float(size=4 if t == pa.float32() else 8, nullable=nullable)
    if pa.types.is_boolean(t):
        return Boolean(nullable=nullable)
    if pa.types.is_date(t):
        return Date(nullable=nullable)
    if pa.types.is_timestamp(t):
        return DateTime(nullable=nullable)
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return List(_field_from_arrow(t.value_type, True),
                    nullable=nullable)
    if pa.types.is_map(t):
        return Map(_field_from_arrow(t.item_type, True), nullable=nullable)
    if pa.types.is_struct(t):
        sub = record_from_arrow(pa.schema(list(t)), name="InferredStruct")
        return SubRecord(sub, nullable=nullable)
    return Text(nullable=nullable)  # conservative fallback


def record_from_avro(schema: str | dict,
                     name: str | None = None) -> type[Record]:
    """Build a Record class from an avro record schema document — the
    analog of the reference's ``pyschema_extensions/avro_to_pyschema``
    codegen; like :func:`record_from_arrow` the class is constructed
    directly instead of emitting source text.  Round-trips
    :func:`get_avro_schema_dict` over its full type matrix: primitives
    (string/bytes/boolean/int/long/float/double), date and
    timestamp-micros/millis logical types, enum, array, map, nested
    records, and named-type references to already-parsed
    records/enums.  ``["null", T]`` unions map to ``nullable=True``;
    any other multi-type union raises (same limitation as the
    upstream codegen)."""
    import json as _json

    if isinstance(schema, str):
        schema = _json.loads(schema)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return _record_from_avro_dict(schema, {}, override_name=name)


def _record_from_avro_dict(d: dict, named: dict,
                           override_name: str | None = None) -> type[Record]:
    rname = override_name or d.get("name", "Inferred")
    ns: dict[str, Any] = {"_schema_name": rname}
    for fd in d.get("fields", []):
        ns[fd["name"]] = _field_from_avro(fd["type"], named)
    cls = PySchemaMeta(rname, (Record,), ns)
    named[d.get("name", rname)] = cls
    return cls


def _field_from_avro(t: Any, named: dict, nullable: bool = False) -> Field:
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported avro union: {t!r}")
        return _field_from_avro(branches[0], named,
                                nullable=len(branches) != len(t))
    if isinstance(t, str):
        if t in named:  # named-type reference (record or enum)
            ref = named[t]
            if isinstance(ref, type):
                return SubRecord(ref, nullable=nullable)
            return Enum(ref, nullable=nullable)
        maker = {
            "string": lambda: Text(nullable=nullable),
            "bytes": lambda: Bytes(nullable=nullable),
            "boolean": lambda: Boolean(nullable=nullable),
            "int": lambda: Integer(size=4, nullable=nullable),
            "long": lambda: Integer(size=8, nullable=nullable),
            "float": lambda: Float(size=4, nullable=nullable),
            "double": lambda: Float(size=8, nullable=nullable),
        }.get(t)
        if maker is None:
            raise ValueError(f"unknown avro type: {t!r}")
        return maker()
    if isinstance(t, dict):
        tt = t.get("type")
        lt = t.get("logicalType")
        if lt == "date" and tt == "int":
            return Date(nullable=nullable)
        if lt in ("timestamp-micros", "timestamp-millis") and tt == "long":
            return DateTime(nullable=nullable)
        if tt == "enum":
            symbols = tuple(t["symbols"])
            if t.get("name"):
                named[t["name"]] = symbols
            return Enum(symbols, nullable=nullable)
        if tt == "array":
            # element nullability is carried by the items type itself
            # (a ["null", T] union), so no default is imposed here
            return List(_field_from_avro(t["items"], named),
                        nullable=nullable)
        if tt == "map":
            return Map(_field_from_avro(t["values"], named),
                       nullable=nullable)
        if tt == "record":
            return SubRecord(_record_from_avro_dict(t, named),
                             nullable=nullable)
        # wrapped primitive, e.g. {"type": "string"}
        return _field_from_avro(tt, named, nullable=nullable)
    raise ValueError(f"unparseable avro type: {t!r}")


# ---------------------------------------------------------------------------
# mixin-installed exporter methods (R12 usage parity): the module
# functions above remain the primary API; these mirror how the
# reference's avro/jsonschema extensions attach per-field/per-record
# methods via Field.mixin when their module is imported.
# ---------------------------------------------------------------------------

@Field.mixin
class _FieldExportMethods:
    def avro_type(self, _state: set | None = None):
        """This field's avro schema fragment (mixin-installed)."""
        return _avro_type(self, _state if _state is not None else set())

    def jsonschema_type(self) -> dict:
        """This field's JSON-Schema fragment (mixin-installed)."""
        return _jsonschema_type(self)
