"""Corpus cleaning: write a validated copy of the input with violating
rows removed.

One task per input file (fused, resumable): stream row groups through
the compiled validator, keep only rows that violate NO row-level
constraint, write the file's clean rows to ``<out_dir>/<basename>``
via write-tmp-then-rename (idempotent under retries; a crashed run
skips finished files on re-submission).  Global checks (uniqueness)
are row-preserving decisions, so they are applied afterwards by key
via an optional drop-list.

The per-row ``tokens`` arrays pass through untouched (zero-copy column
filter) — the round-trip invariant (tests: clean output rows are
byte-equal to their input rows).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.validator import CompiledValidator


class FileCleaner:
    """map_batches(callable, batch_size=1) over a table of file paths:
    {'path', 'out'} -> one cleaned parquet per input file; returns a
    (path, rows_in, rows_kept) summary row per file."""

    def __init__(self, drop_keys: list | None = None, batch_rows: int = 8192,
                 **validator_kwargs):
        self.validator = CompiledValidator(**validator_kwargs)
        self.batch_rows = batch_rows
        self.key_field = self.validator.key_field
        self.drop_keys = (pa.array(sorted(set(drop_keys)))
                          if drop_keys else None)

    def _clean_table(self, tbl: pa.Table) -> pa.Table:
        keep = None
        for c in self.validator.constraints:
            if getattr(c, "severity", "error") == "warning":
                continue  # observe-only rules never drop rows
            try:
                mask = pc.fill_null(c.mask(tbl), False)
            except TypeError:   # global constraints (Unique) skip here
                continue
            keep = mask if keep is None else pc.and_(keep, mask)
        if self.drop_keys is not None and self.key_field in tbl.column_names:
            not_dropped = pc.invert(pc.is_in(tbl[self.key_field],
                                             value_set=self.drop_keys))
            keep = not_dropped if keep is None else pc.and_(keep, not_dropped)
        return tbl if keep is None else tbl.filter(keep)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rows_out = {"path": [], "rows_in": [], "rows_kept": []}
        for path, out in zip(batch["path"].to_pylist(),
                             batch["out"].to_pylist()):
            if os.path.exists(out):   # resume: already cleaned
                meta = pq.ParquetFile(out).metadata
                rows_out["path"].append(path)
                rows_out["rows_in"].append(-1)
                rows_out["rows_kept"].append(meta.num_rows)
                continue
            pf = pq.ParquetFile(path)
            tmp = out + ".tmp"
            writer = None
            n_in = n_kept = 0
            try:
                for rb in pf.iter_batches(batch_size=self.batch_rows):
                    tbl = pa.Table.from_batches([rb])
                    n_in += tbl.num_rows
                    clean = self._clean_table(tbl)
                    n_kept += clean.num_rows
                    if writer is None:
                        writer = pq.ParquetWriter(tmp, clean.schema)
                    writer.write_table(clean)
                if writer is None:  # zero-row input: still produce output
                    pq.write_table(pf.schema_arrow.empty_table(), tmp)
            finally:
                if writer is not None:
                    writer.close()
            os.replace(tmp, out)
            rows_out["path"].append(path)
            rows_out["rows_in"].append(n_in)
            rows_out["rows_kept"].append(n_kept)
        return pa.table({
            "path": pa.array(rows_out["path"], pa.string()),
            "rows_in": pa.array(rows_out["rows_in"], pa.int64()),
            "rows_kept": pa.array(rows_out["rows_kept"], pa.int64()),
        })


def write_validated(files: list[str], out_dir: str, schema_cls,
                    ref_sets: dict | None = None,
                    extra_constraints: list | None = None,
                    drop_keys: list | None = None,
                    batch_rows: int = 8192) -> dict:
    """Clean every input file into ``out_dir`` (mirroring the input's
    directory layout relative to its common root, so same-named files
    in different subdirectories cannot overwrite each other) and
    return {'rows_in', 'rows_kept', 'files'}.  ``drop_keys``: keys to
    remove regardless (e.g. duplicate ids from the uniqueness pass)."""
    import ray.data

    from .validate import _lineage_id, _lineage_root

    os.makedirs(out_dir, exist_ok=True)
    root = _lineage_root(files)
    items = []
    for f in files:
        out = os.path.join(out_dir, _lineage_id(f, root))
        os.makedirs(os.path.dirname(out), exist_ok=True)
        items.append({"path": f, "out": out})
    cleaner = FileCleaner(drop_keys=drop_keys, batch_rows=batch_rows,
                          schema_cls=schema_cls, ref_sets=ref_sets or {},
                          extra_constraints=extra_constraints or [])
    ds = ray.data.from_items(items)
    summary = ds.map_batches(cleaner, batch_format="pyarrow", batch_size=1)
    rows_in = rows_kept = 0
    n_files = 0
    for b in summary.iter_batches(batch_format="pyarrow", batch_size=None):
        for r_in, r_kept in zip(b["rows_in"].to_pylist(),
                                b["rows_kept"].to_pylist()):
            if r_in >= 0:
                rows_in += r_in
            rows_kept += r_kept
            n_files += 1
    return {"rows_in": rows_in, "rows_kept": rows_kept, "files": n_files}
