"""SQLite source/sink — the database-ingest family (Sqoop-style
range-partitioned reads re-expressed on Ray Data; stdlib ``sqlite3``,
no new dependency).

- **Source** (:func:`read_sqlite`): the classic partitioned-ingest
  shape every JDBC importer uses — ONE driver-side metadata query
  fetches min/max of an integer partition column, the key range
  splits into ``n_partitions`` half-open slices, and each slice
  becomes one Ray task running ``SELECT ... WHERE pcol >= lo AND
  pcol < hi`` (inclusive upper on the last).  Work scales with
  partitions; the driver reads two integers.  Skewed key ranges get
  skewed tasks — exactly the JDBC behavior — so the partition column
  should be a dense surrogate key (documented, as Sqoop documents
  ``--split-by``).
- **Sink** (:func:`write_sqlite`): SQLite is a single-writer format,
  so blocks funnel through ONE writer actor in arrival order (the
  honest contract: a multi-GB corpus belongs in parquet; this sink
  exists for the export-to-operational-store edge, bounded outputs).
  Rows insert via executemany on Python-native values.

Typed round-trip: INTEGER/REAL/TEXT/BLOB map to
int64/float64/string/binary; timestamps are stored as ISO-8601 TEXT
and restored by the caller's schema cast (SQLite has no native
timestamp — documented, matching its affinity rules).
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

__all__ = ["write_sqlite", "read_sqlite"]

_PA_TO_SQL = {
    pa.int64(): "INTEGER", pa.int32(): "INTEGER",
    pa.float64(): "REAL", pa.float32(): "REAL",
    pa.string(): "TEXT", pa.large_string(): "TEXT",
    pa.binary(): "BLOB", pa.bool_(): "INTEGER",
}


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "TEXT"
    return _PA_TO_SQL.get(t, "TEXT")


def write_sqlite(ds, path: str, table: str):
    """Write a Dataset into ONE SQLite file via a single writer actor
    (SQLite's writer lock makes fan-out writes a lie; this sink is
    for bounded exports).  Returns (path, n_rows)."""
    import ray

    schema = pa.schema(ds.schema().base_schema)

    @ray.remote
    class Writer:
        def __init__(self, path, table, schema_ser):
            sch = pa.ipc.read_schema(pa.py_buffer(schema_ser))
            self.con = sqlite3.connect(path)
            self.table = table
            self.cols = sch.names
            self.ts_cols = {f.name for f in sch
                            if pa.types.is_timestamp(f.type)}
            defs = ", ".join(
                f'"{f.name}" {_sql_type(f.type)}' for f in sch)
            self.con.execute(f'CREATE TABLE "{table}" ({defs})')
            self.n = 0

        def write(self, t: pa.Table) -> int:
            cols = []
            for name in self.cols:
                c = t[name]
                if name in self.ts_cols:
                    c = pa.compute.strftime(c, "%Y-%m-%dT%H:%M:%S.%f")
                cols.append(c.to_pylist())
            rows = list(zip(*cols)) if cols else []
            ph = ", ".join("?" for _ in self.cols)
            self.con.executemany(
                f'INSERT INTO "{self.table}" VALUES ({ph})', rows)
            self.n += t.num_rows
            return self.n

        def close(self) -> int:
            self.con.commit()
            self.con.close()
            return self.n

    if os.path.exists(path):
        os.remove(path)
    w = Writer.remote(path, table, schema.serialize().to_pybytes())
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            ray.get(w.write.remote(b))
    n = ray.get(w.close.remote())
    return path, n


def read_sqlite(path: str, table: str, partition_col: str,
                n_partitions: int = 8,
                columns: list[str] | None = None):
    """Range-partitioned parallel read of a SQLite table: one
    metadata query for (min, max) of ``partition_col`` (must be
    integer-typed and non-null), then one Ray task per key slice.
    -> ray.data.Dataset."""
    import ray
    import ray.data

    con = sqlite3.connect(path)
    row = con.execute(
        f'SELECT min("{partition_col}"), max("{partition_col}"), '
        f'count(*) FROM "{table}"').fetchone()
    con.close()
    lo, hi, n_rows = row
    if n_rows == 0 or lo is None:
        return ray.data.from_items([])
    # declared column types -> pinned Arrow schema (an empty slice
    # must still carry typed columns — the schema-less-empty-block
    # failure mode this repo memorialized in round 4)
    con = sqlite3.connect(path)
    info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    con.close()
    decl_map = {"INTEGER": pa.int64(), "REAL": pa.float64(),
                "TEXT": pa.string(), "BLOB": pa.binary()}
    decls = {name: decl_map.get((decl or "").upper(), pa.string())
             for (_c, name, decl, *_r) in info}
    names = [c for c in (columns or list(decls))]
    out_schema = pa.schema([(n, decls[n]) for n in names])
    sel = ", ".join(f'"{c}"' for c in names)
    bounds = np.unique(np.linspace(lo, hi + 1, n_partitions + 1)
                       .astype(np.int64))
    slices = [{"lo": int(bounds[i]), "hi": int(bounds[i + 1])}
              for i in range(len(bounds) - 1)]

    def fetch(df) -> pa.Table:
        out = []
        for r in df.itertuples(index=False):
            con = sqlite3.connect(path)
            cur = con.execute(
                f'SELECT {sel} FROM "{table}" '
                f'WHERE "{partition_col}" >= ? '
                f'AND "{partition_col}" < ?', (int(r.lo), int(r.hi)))
            rows = cur.fetchall()
            con.close()
            if rows:
                cols = list(zip(*rows))
                out.append(pa.table(
                    {n: pa.array(list(c), type=out_schema.field(n).type)
                     for n, c in zip(names, cols)}))
        if not out:
            return out_schema.empty_table()
        return pa.concat_tables(out)

    return ray.data.from_items(slices).map_batches(
        fetch, batch_size=1, batch_format="pandas")
