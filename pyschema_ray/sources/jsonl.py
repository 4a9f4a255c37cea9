"""JSON-lines source/sink — the reference's native wire format
(pyschema records travel as ``dumps()`` lines with an injected
``$schema`` field; see schema.py R8/R9).

The reader bridges that format into the Dataset world: Ray's
``read_json`` parses lines in parallel, the ``$schema`` column (if
present) is checked against the expected schema name and dropped, and
the remaining columns are cast to the Record's declared Arrow types so
the standard CompiledValidator / pipeline stages apply unchanged.
Uncastable or unknown-typed columns are left as-is — schema
conformance violations are the VALIDATOR's job, not the reader's
(mirroring how the parquet path works)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SCHEMA_FIELD_NAME, Record


def read_jsonl(paths, schema_cls: type[Record] | None = None):
    """Read ``dumps()``-style JSON lines into a Dataset.  With
    ``schema_cls``, rows claiming a DIFFERENT ``$schema`` name raise
    (mixed-schema files need per-name routing, not silent coercion),
    the ``$schema`` column is dropped, and declared columns are cast to
    their Arrow types where the cast is clean."""
    import ray.data

    ds = ray.data.read_json(paths)
    if schema_cls is None:
        return ds

    expected_name = schema_cls._schema_name
    arrow = schema_cls.to_arrow()

    def conform(t: pa.Table) -> pa.Table:
        if SCHEMA_FIELD_NAME in t.column_names:
            names = t[SCHEMA_FIELD_NAME]
            bad = pc.any(pc.invert(pc.equal(
                pc.fill_null(names, expected_name), expected_name)))
            if bad.as_py():
                seen = set(names.to_pylist()) - {expected_name, None}
                raise ValueError(
                    f"jsonl rows claim $schema {sorted(seen)} but "
                    f"{expected_name!r} was expected")
            t = t.drop_columns([SCHEMA_FIELD_NAME])
        return cast_columns(t, arrow)

    return ds.map_batches(conform, batch_format="pyarrow")


def cast_columns(t: pa.Table, arrow: pa.Schema) -> pa.Table:
    """Best-effort cast of declared columns to their Record Arrow
    types; structurally incompatible or invalid casts are left as-is
    (schema conformance violations are the validator's job)."""
    for f in arrow:
        if f.name not in t.column_names:
            continue
        idx = t.schema.get_field_index(f.name)
        if t.schema.field(idx).type == f.type:
            continue
        try:
            t = t.set_column(idx, f.name, pc.cast(t[f.name], f.type))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            # ArrowInvalid: bad values; ArrowNotImplementedError /
            # ArrowTypeError: structurally incompatible casts (JSON
            # object where Integer declared, string where List
            # declared).  All defer to the validator's schema check.
            pass
    return t


def write_jsonl_records(records, path: str) -> int:
    """Driver-side convenience sink: validated Records -> one
    ``dumps()`` line each (with ``$schema``), write-then-rename.
    Returns the row count.  For dataset-scale output use
    ``Dataset.write_json`` on the pipeline output instead."""
    import os

    from ..schema import dumps

    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w") as f:
        for r in records:
            f.write(dumps(r) + "\n")
            n += 1
    os.replace(tmp, path)
    return n
