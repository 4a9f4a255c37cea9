"""pyschema_ray — a from-scratch, Ray-Data-native schema + constraint
validation and data-processing engine with the capabilities of
spotify/pyschema, rebuilt for 10^12-row Parquet corpora.

Public surface:

* ``schema``       — pyschema-style declarative Record/Field classes
* ``constraints``  — vectorized constraint DSL + plugin registry
* ``sketches``     — mergeable t-digest / HyperLogLog / histograms
* ``stages``       — Ray Data batch stages (validator, stats, unique,
                     drift)
* ``pipelines``    — end-to-end resumable validation pipeline
* ``state``        — checkpoint manifest with per-partition lineage
* ``sources``      — parquet discovery + deterministic synth corpus
* ``functions``    — training-data ops: dedup, similarity, text, multimodal

Never calls ``ray.init()`` — the host (driver, test fixture, bench)
owns the Ray session.
"""

from . import _raypatch
from .avro_json import (avro_dumps, avro_loads, from_avro_json,
                        to_avro_json)

_raypatch.install()
from .schema import (Boolean, Bytes, Date, DateTime, Enum, Field, Float,
                     Integer, List, Map, ParseError, Record, SchemaStore,
                     SubRecord, Text, dumps, get_avro_schema_dict,
                     get_avro_schema_string, get_json_schema, ispyschema,
                     get_postgres_ddl, loads, no_auto_store,
                     record_from_arrow, record_from_avro, schema_store)

__all__ = [
    "Boolean", "Bytes", "Date", "DateTime", "Enum", "Field", "Float",
    "Integer", "List", "Map", "ParseError", "Record", "SchemaStore",
    "SubRecord", "Text", "avro_dumps", "avro_loads", "dumps",
    "from_avro_json", "get_avro_schema_dict", "get_avro_schema_string",
    "get_json_schema", "get_postgres_ddl", "ispyschema", "loads",
    "no_auto_store",
    "record_from_arrow", "record_from_avro", "schema_store",
    "to_avro_json",
]

__version__ = "0.1.0"
