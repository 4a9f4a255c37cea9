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
