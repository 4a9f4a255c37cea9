"""Exact global uniqueness via groupby-aggregate hash shuffle (E6).

The only all-to-all exchange in the validation suite.  Scale rules
applied here (SURVEY.md §4.2, §7):

* project to the key column FIRST — the shuffle never moves the fat
  ``tokens`` column;
* pre-aggregate inside ``map_batches`` (per-batch ``value_counts``) so
  the shuffle input is (distinct-keys-per-batch, count) pairs, not raw
  rows — a classic combiner;
* the groupby key (``doc_id``-like, near-unique) hash-distributes
  uniformly, so no skew handling is needed; never group by the skewed
  ``source`` column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..constraints import Unique


def _batch_counts(key: str):
    def fn(t: pa.Table) -> pa.Table:
        # null keys are handled by not_null(key); Ray's sort-based
        # groupby cannot order null keys, so drop them here
        t = t.filter(pc.is_valid(t[key]))
        counts = t.group_by(key).aggregate([(key, "count")])
        return counts.rename_columns([key, "cnt"])
    return fn


def duplicate_keys(ds, key: str):
    """-> Dataset(key, dup_count) with dup_count >= 2.  ``ds`` may be the
    full table; only ``key`` survives to the shuffle."""
    import ray.data  # noqa: F401

    pre = (ds.select_columns([key])
             .map_batches(_batch_counts(key), batch_format="pyarrow"))
    agg = pre.groupby(key).sum("cnt")
    agg = agg.map_batches(
        lambda t: t.rename_columns([key, "dup_count"]).filter(
            pc.greater(t["sum(cnt)"], 1)),
        batch_format="pyarrow")
    return agg


def uniqueness_violations(ds, key: str) -> pa.Table:
    """Materialize duplicate keys as frozen violation rows
    (key, partition_id='<global>', constraint, detail).  The duplicate
    set is assumed small relative to the input (defect-rate sized); for
    a pathological all-duplicates input, stream ``duplicate_keys``
    to parquet instead."""
    c = Unique(key)
    dups = duplicate_keys(ds, key)
    parts = []
    for batch in dups.iter_batches(batch_format="pyarrow", batch_size=65536):
        keys = pc.cast(batch[key], pa.string())
        n = len(keys)
        parts.append(pa.table({
            "key": keys,
            "partition_id": pa.array(["<global>"] * n, pa.string()),
            "constraint": pa.array([c.name] * n, pa.string()),
            "detail": pa.array([c.detail] * n, pa.string()),
        }))
    if not parts:
        return pa.table({
            "key": pa.array([], pa.string()),
            "partition_id": pa.array([], pa.string()),
            "constraint": pa.array([], pa.string()),
            "detail": pa.array([], pa.string()),
        })
    return pa.concat_tables(parts)
