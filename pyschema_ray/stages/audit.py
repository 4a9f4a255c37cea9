"""Parquet footer-integrity audit.

The validator's reads prune row groups on footer min/max statistics
(pipelines/validate.py pushes predicates into the scan), so corrupt or
stale footer stats make a pushdown read silently skip live rows.
:func:`footer_stats_audit` is the check that catches this BEFORE it
bites: per (file, row group, column) it compares the footer's declared
min / max / null_count with aggregates computed from the data itself.

Scale shape: the driver touches ONLY footers (O(files) metadata reads,
no data); each (file, row group) becomes one Ray task that reads just
its own row group with column pruning and emits one row per audited
column — embarrassingly parallel, zero exchanges, output bounded by
files x row_groups x columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def footer_stats_audit(paths: list[str], columns: list[str]):
    """Audit footer statistics of NUMERIC ``columns`` across parquet
    ``paths``.  Min/max travel as float64 (exact for integer
    magnitudes < 2^53); ``stats_ok`` is the per-row verdict
    (declared == actual for min, max and null count; a NON-EMPTY
    column chunk whose footer lacks min/max stats is reported with
    null declared values and ``stats_ok=false`` — absent stats defeat
    pruning just like wrong ones — while an all-null chunk is ok with
    absent stats, there being nothing to prune against).

    -> Dataset(file, row_group, column, declared_min, declared_max,
       declared_nulls, actual_min, actual_max, actual_nulls,
       stats_ok).
    """
    import pyarrow.parquet as pq
    import ray.data

    items = []
    for path in paths:
        md = pq.ParquetFile(path).metadata
        name_to_idx = {md.schema.column(i).path: i
                       for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            for col in columns:
                ci = name_to_idx[col]
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    dmin = dmax = dnul = None
                else:
                    dmin, dmax = float(st.min), float(st.max)
                    dnul = (int(st.null_count)
                            if st.null_count is not None else None)
                items.append({"path": path, "rg": rg, "col": col,
                              "dmin": dmin, "dmax": dmax,
                              "dnul": dnul})

    out_schema = pa.schema([
        ("file", pa.string()), ("row_group", pa.int64()),
        ("column", pa.string()),
        ("declared_min", pa.float64()), ("declared_max", pa.float64()),
        ("declared_nulls", pa.int64()),
        ("actual_min", pa.float64()), ("actual_max", pa.float64()),
        ("actual_nulls", pa.int64()), ("stats_ok", pa.bool_())])

    def audit(df) -> pa.Table:
        rows = {n: [] for n in out_schema.names}
        for r in df.itertuples(index=False):
            path, rg, col = r.path, int(r.rg), r.col
            dmin = None if r.dmin is None or r.dmin != r.dmin else float(r.dmin)
            dmax = None if r.dmax is None or r.dmax != r.dmax else float(r.dmax)
            dnul = (None if r.dnul is None
                    or (isinstance(r.dnul, float) and r.dnul != r.dnul)
                    else int(r.dnul))
            c = pq.ParquetFile(path).read_row_group(rg,
                                                    columns=[col])[col]
            nulls = c.null_count
            valid = c.drop_null()
            if len(valid):
                mm = pc.min_max(valid)
                amin = float(mm["min"].as_py())
                amax = float(mm["max"].as_py())
                ok = (dmin is not None and dmin == amin
                      and dmax == amax
                      and (dnul is None or dnul == nulls))
            else:
                amin = amax = None
                ok = dmin is None and dnul in (None, nulls)
            rows["file"].append(path)
            rows["row_group"].append(rg)
            rows["column"].append(col)
            rows["declared_min"].append(dmin)
            rows["declared_max"].append(dmax)
            rows["declared_nulls"].append(dnul)
            rows["actual_min"].append(amin)
            rows["actual_max"].append(amax)
            rows["actual_nulls"].append(int(nulls))
            rows["stats_ok"].append(bool(ok))
        return pa.table({n: pa.array(rows[n], out_schema.field(n).type)
                         for n in out_schema.names})

    return ray.data.from_items(items).map_batches(
        audit, batch_size=8, batch_format="pandas")


def rowgroup_pruning_report(paths: list[str], column: str,
                            lo: float | None = None,
                            hi: float | None = None) -> pa.Table:
    """Predicate-pushdown effectiveness audit, METADATA ONLY: per
    (file, row group), the footer min/max of ``column`` and whether a
    pushdown read with predicate ``lo <= column <= hi`` (either bound
    optional) could SKIP the row group entirely — min > hi or
    max < lo, with absent stats never skippable (the conservative
    rule every engine applies).  At 100 TB this plans a scan over
    millions of row groups from O(files) footer reads, zero data I/O;
    the driver-side loop is over footers, not rows.

    Verifiable against DuckDB's ``parquet_metadata()`` (the same
    footer through an independent reader) — see
    tests/test_planner.py.

    -> pa.Table(file, row_group, num_rows, stat_min, stat_max,
       has_stats, prunable).
    """
    import os

    import pyarrow.parquet as pq

    rows = {k: [] for k in ("file", "row_group", "num_rows",
                            "stat_min", "stat_max", "has_stats",
                            "prunable")}
    for path in paths:
        md = pq.ParquetFile(path).metadata
        name_to_idx = {md.schema.column(i).path: i
                       for i in range(md.num_columns)}
        ci = name_to_idx[column]
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            st = rgm.column(ci).statistics
            has = bool(st is not None and st.has_min_max)
            smin = float(st.min) if has else None
            smax = float(st.max) if has else None
            prunable = has and ((hi is not None and smin > hi)
                                or (lo is not None and smax < lo))
            rows["file"].append(os.path.basename(path))
            rows["row_group"].append(rg)
            rows["num_rows"].append(rgm.num_rows)
            rows["stat_min"].append(smin)
            rows["stat_max"].append(smax)
            rows["has_stats"].append(has)
            rows["prunable"].append(bool(prunable))
    return pa.table({
        "file": pa.array(rows["file"], pa.string()),
        "row_group": pa.array(rows["row_group"], pa.int64()),
        "num_rows": pa.array(rows["num_rows"], pa.int64()),
        "stat_min": pa.array(rows["stat_min"], pa.float64()),
        "stat_max": pa.array(rows["stat_max"], pa.float64()),
        "has_stats": pa.array(rows["has_stats"], pa.bool_()),
        "prunable": pa.array(rows["prunable"], pa.bool_()),
    })


def compaction_plan(paths: list[str],
                    target_bytes: int = 256 << 20) -> pa.Table:
    """Small-file/row-group compaction plan, METADATA ONLY: walk row
    groups in (file, row_group) order and assign each to an output
    bucket by cumulative compressed size —
    ``bucket = floor(cum_bytes_before / target_bytes)`` — the
    deterministic first-fit that keeps input order (so downstream
    lineage stays contiguous) and caps every output file at roughly
    ``target_bytes`` (one row group may straddle; no row group is
    split).  The plan is O(row groups) driver work from footers
    alone; the compaction itself is then an embarrassingly parallel
    per-bucket read->write with NO exchange, and a failed run resumes
    per bucket.

    Deterministic and independently checkable: DuckDB's
    parquet_metadata() + a window cumsum reproduces the assignment
    bit-for-bit (tests/test_planner.py).

    -> pa.Table(bucket, n_rowgroups, n_rows, bytes) one row per
       output bucket, plus per-row-group detail columns when
       ``detail=True`` is wanted via :func:`compaction_assignments`.
    """
    a = compaction_assignments(paths, target_bytes)
    g = a.group_by("bucket").aggregate([
        ("row_group", "count"), ("num_rows", "sum"), ("bytes", "sum")])
    g = g.rename_columns(["bucket", "n_rowgroups", "n_rows", "bytes"])
    return pa.table({
        "bucket": pc.cast(g["bucket"], pa.int64()),
        "n_rowgroups": pc.cast(g["n_rowgroups"], pa.int64()),
        "n_rows": pc.cast(g["n_rows"], pa.int64()),
        "bytes": pc.cast(g["bytes"], pa.int64()),
    }).sort_by("bucket")


def compaction_assignments(paths: list[str],
                           target_bytes: int) -> pa.Table:
    """Per-row-group bucket assignment for :func:`compaction_plan`:
    (file, row_group, num_rows, bytes, bucket) in input order."""
    import os

    import pyarrow.parquet as pq

    files, rgs, nrows, sizes = [], [], [], []
    for path in paths:
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            files.append(os.path.basename(path))
            rgs.append(rg)
            nrows.append(rgm.num_rows)
            sizes.append(sum(rgm.column(c).total_compressed_size
                             for c in range(rgm.num_columns)))
    import numpy as np
    b = np.asarray(sizes, np.int64)
    cum_before = np.cumsum(b) - b
    bucket = cum_before // np.int64(target_bytes)
    return pa.table({
        "file": pa.array(files, pa.string()),
        "row_group": pa.array(rgs, pa.int64()),
        "num_rows": pa.array(nrows, pa.int64()),
        "bytes": pa.array(b, pa.int64()),
        "bucket": pa.array(bucket, pa.int64()),
    })
