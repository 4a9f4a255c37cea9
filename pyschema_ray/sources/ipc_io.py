"""Arrow IPC / Feather-v2 source/sink — the zero-copy interchange
format for Arrow-native pipelines (model-training data loaders and
feature stores commonly hand off Arrow IPC files).

Same shape as the repo's orc_io/avro_io sources:

- **Sink**: one ``.arrow`` (IPC file format) part per input block,
  written by STATELESS tasks with content-hashed names, atomic
  write-then-rename, and finished parts skipped on rerun — the
  resumable-output contract.
- **Source**: parallel over RECORD BATCHES — stage 1 flat_maps each
  file into (path, batch index) descriptors from the IPC footer
  (driver-side metadata read); stage 2 reads exactly one record
  batch per descriptor via ``ipc.open_file().get_batch(i)`` (the
  file format is seekable by design, so a batch read touches only
  its own bytes + footer).  Column pruning is applied after the
  batch gather (IPC batch reads are already zero-copy off mmap).
"""

from __future__ import annotations

import os

import pyarrow as pa

__all__ = ["write_ipc", "read_ipc"]


def _content_tag(t: pa.Table) -> str:
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


class IpcBatchWriter:
    """Stateless per-block IPC-file part writer (runs as tasks)."""

    def __init__(self, out_dir: str, max_chunksize: int | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.max_chunksize = max_chunksize

    def __call__(self, t: pa.Table) -> pa.Table:
        os.makedirs(self.out_dir, exist_ok=True)  # idempotent per node
        tag = _content_tag(t)
        path = os.path.join(self.out_dir, f"part-{tag}.arrow")
        if not os.path.exists(path):  # resumable: skip finished parts
            tmp = path + ".tmp"
            with pa.OSFile(tmp, "wb") as f, \
                    pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t, max_chunksize=self.max_chunksize)
            os.replace(tmp, path)  # atomic publish
        return pa.table({
            "path": pa.array([path], pa.string()),
            "rows": pa.array([t.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64())})


def write_ipc(ds, out_dir: str, max_chunksize: int | None = None):
    """Dataset -> directory of ``.arrow`` IPC-file parts; returns the
    manifest Dataset(path, rows, bytes)."""
    return ds.map_batches(IpcBatchWriter(out_dir, max_chunksize),
                          batch_format="pyarrow")


def read_ipc(paths, columns: list[str] | None = None,
             schema_cls=None):
    """``.arrow``/``.feather`` files/dirs -> Dataset, parallel over
    record batches."""
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(os.path.join(p, f) for f in os.listdir(p)
                            if f.endswith((".arrow", ".feather")))
        elif os.path.exists(p):
            files.append(p)
        else:
            raise FileNotFoundError(p)
    if not files:
        raise FileNotFoundError(f"no .arrow/.feather files in {paths}")

    def descriptors(row):
        path = row["path"]
        n = pa.ipc.open_file(path).num_record_batches
        return [{"path": path, "batch": i} for i in range(n)]

    def decode(t: pa.Table) -> pa.Table:
        out = []
        for row in t.to_pylist():
            # open_file(path) manages the source; the returned batch's
            # buffers keep it alive (no explicit close that would
            # invalidate zero-copy views)
            rb = pa.ipc.open_file(row["path"]).get_batch(row["batch"])
            tab = pa.Table.from_batches([rb])
            if columns is not None:
                tab = tab.select(columns)
            out.append(tab)
        if not out:
            # dtype-pinned empty branch (SCALE.md §11 discipline)
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
