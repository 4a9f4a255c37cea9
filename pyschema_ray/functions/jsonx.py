"""Vectorized JSON field extraction over string columns.

Event streams commonly carry a semi-structured ``props`` JSON string
column; pulling one scalar field out of it should not mean a Python
``json.loads`` per row.  For flat scalar fields the extraction is a
single RE2 ``pc.extract_regex`` kernel pass — zero-copy Arrow in, no
row loop — with the documented contract that the regex path handles
FLAT fields only (no nested objects shadowing the key); the SQL
oracle (``regexp_extract``) states the same contract, keeping both
sides bit-identical.

``json_field_stats`` composes the kernel with a per-batch groupby
combiner and one bounded final aggregation — the 100-TB shape: the
exchange carries (group, count, sum) partials, never rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_json_int(col, key: str):
    """Int64 value of flat JSON field ``key`` in each string of
    ``col``; null where the field is absent, non-integer, or the
    input is null.  One RE2 pass (no per-row parse)."""
    # extract_regex requires a NAMED capture group
    pat = '"' + key + '"\\s*:\\s*(?P<v>-?\\d+)'
    m = pc.extract_regex(pc.fill_null(col, ""), pat)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())


def json_int_field_batch(t: pa.Table, col: str, key: str,
                         out_col: str | None = None) -> pa.Table:
    """Batch kernel: append extracted int64 field as ``out_col``
    (default ``key``)."""
    return t.append_column(out_col or key, extract_json_int(t[col], key))


def json_field_stats(ds, json_col: str, key: str, group_col: str):
    """-> Dataset(group_col, n_with_field, sum_field): per-group count
    and int64 sum of a flat JSON integer field.  Per-batch combiner
    (extract + local groupby) then ONE bounded groupby over group
    partials."""

    def partial(t: pa.Table) -> pa.Table:
        v = extract_json_int(t[json_col], key)
        g = pa.table({group_col: pc.fill_null(
            pc.cast(t[group_col], pa.string()), "[NULL]"),
            "v": v})
        g = g.filter(pc.is_valid(g["v"]))
        agg = g.group_by([group_col]).aggregate(
            [([], "count_all"), ("v", "sum")])
        agg = agg.select([group_col, "count_all", "v_sum"]) \
            .rename_columns([group_col, "n_with_field", "sum_field"])
        return agg

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col]).aggregate(
            [("n_with_field", "sum"), ("sum_field", "sum")])
        g = g.select([group_col, "n_with_field_sum", "sum_field_sum"]) \
            .rename_columns([group_col, "n_with_field", "sum_field"])
        for c in ("n_with_field", "sum_field"):
            g = g.set_column(g.schema.get_field_index(c), c,
                             pc.cast(g[c], pa.int64()))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(total, batch_format="pyarrow")
