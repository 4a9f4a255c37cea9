"""ORC source/sink on ``pyarrow.orc`` — the columnar warehouse
interchange format next to Parquet (reference capability analog:
pyschema's serialization surface, re-expressed for column stores;
public upstream layout per SURVEY.md §2.1, mount empty this round).

Ray Data 2.49 ships no ORC reader, so this module follows the repo's
avro_io shape exactly:

- **Sink**: one ``.orc`` part file per input block, written by
  STATELESS tasks (no actor pool, no driver funnel — the write fans
  out with the block count at any scale).  Part names are
  content-hashed (head + tail slices + row count, the avro sink's
  collision rule) and published atomically via write-then-rename, the
  resumable-output contract shared with the manifest sink.
- **Source**: parallel over STRIPES — stage 1 flat_maps each file
  into (path, stripe) descriptors from driver-side metadata reads
  (bytes read ~ footer per file); stage 2 decodes one stripe per
  descriptor row with ``ORCFile.read_stripe(i, columns)`` so column
  pruning happens at the read.  A 100 TB corpus of 64 MB stripes is
  ~1.6 M descriptor rows — trivially small — while decode work
  spreads over every core.
"""

from __future__ import annotations

import os

import pyarrow as pa

__all__ = ["write_orc", "read_orc"]


def _content_tag(t: pa.Table) -> str:
    """Content-hash part tag: head + tail IPC slices + row count —
    two distinct blocks sharing a prefix must not collide on one
    path (the avro sink's rule)."""
    import hashlib

    def ipc_bytes(tab: pa.Table) -> bytes:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, tab.schema) as w:
            w.write_table(tab)
        return sink.getvalue().to_pybytes()

    h = hashlib.md5(ipc_bytes(t.slice(0, min(t.num_rows, 1024))))
    if t.num_rows > 1024:
        h.update(ipc_bytes(t.slice(t.num_rows - 1024)))
    h.update(str(t.num_rows).encode())
    return h.hexdigest()[:16]


class OrcBatchWriter:
    """Stateless per-block ORC part writer (runs as tasks)."""

    def __init__(self, out_dir: str, stripe_size: int | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.stripe_size = stripe_size

    def __call__(self, t: pa.Table) -> pa.Table:
        from pyarrow import orc

        os.makedirs(self.out_dir, exist_ok=True)  # idempotent per node
        tag = _content_tag(t)
        path = os.path.join(self.out_dir, f"part-{tag}.orc")
        if not os.path.exists(path):  # resumable: skip finished parts
            tmp = path + ".tmp"
            kw = {}
            if self.stripe_size is not None:
                kw["stripe_size"] = self.stripe_size
            orc.write_table(t, tmp, **kw)
            os.replace(tmp, path)  # atomic publish
        return pa.table({
            "path": pa.array([path], pa.string()),
            "rows": pa.array([t.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64())})


def write_orc(ds, out_dir: str, stripe_size: int | None = None):
    """Dataset -> directory of ``.orc`` part files; returns the
    manifest Dataset(path, rows, bytes)."""
    return ds.map_batches(OrcBatchWriter(out_dir, stripe_size),
                          batch_format="pyarrow")


def read_orc(paths, columns: list[str] | None = None,
             schema_cls=None):
    """``.orc`` files/dirs -> Dataset, parallel over STRIPES, with
    column pruning pushed into ``read_stripe``.  ``schema_cls``
    applies the same Record-typed conformance as read_jsonl /
    read_avro."""
    import ray.data
    from pyarrow import orc

    if isinstance(paths, str):
        paths = [paths]
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(os.path.join(p, f) for f in os.listdir(p)
                            if f.endswith(".orc"))
        elif os.path.exists(p):
            files.append(p)
        else:
            raise FileNotFoundError(p)
    if not files:
        raise FileNotFoundError(f"no .orc files in {paths}")

    def descriptors(row):
        path = row["path"]
        f = orc.ORCFile(path)
        return [{"path": path, "stripe": i}
                for i in range(f.nstripes)]

    def decode(t: pa.Table) -> pa.Table:
        out = []
        for row in t.to_pylist():
            f = orc.ORCFile(row["path"])
            rb = f.read_stripe(row["stripe"], columns=columns)
            out.append(pa.Table.from_batches([rb]))
        if not out:
            # dtype-pinned empty branch (schema-less empty RefBundle
            # discipline — SCALE.md §11)
            return pa.table({"path": pa.array([], pa.string())})
        return pa.concat_tables(out)

    ds = ray.data.from_items([{"path": f} for f in files])
    out = ds.flat_map(descriptors).map_batches(decode,
                                               batch_format="pyarrow")
    if schema_cls is not None:
        from .jsonl import cast_columns

        arrow = schema_cls.to_arrow()
        out = out.map_batches(lambda t: cast_columns(t, arrow),
                              batch_format="pyarrow")
    return out
