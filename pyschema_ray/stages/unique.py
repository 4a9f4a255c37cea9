"""Exact global uniqueness (E6) — bucketed groupby-aggregate hash
shuffle.

Naive ``groupby(key).count()`` shuffles on the raw (near-unique) string
key, which makes Ray's sort-based shuffle order the full key set — slow
and memory-hungry at 10^12 keys.  Instead:

1. per-batch combiner (``map_batches``): drop null keys (they're
   covered by ``not_null``), pre-aggregate duplicate keys within the
   batch, and attach ``bucket = siphash64(key) % num_buckets`` — an
   *integer* shuffle key;
2. ``groupby("bucket")`` — the all-to-all exchange now sorts a small
   integer column; identical keys always share a bucket;
3. ``map_groups`` per bucket: a C++ Arrow ``group_by`` finds keys with
   total count > 1 inside the bucket.

Scale rules: the shuffle moves only (key, bucket, cnt) — never the fat
``tokens`` column; bucket count defaults to 4x cluster CPUs (set
``num_buckets`` ~ 4x total cores on a real cluster so each bucket is a
task); the key hash is uniform, so buckets are balanced regardless of
data skew.  Bucketing is by hash but dup detection compares the real
keys, so hash collisions cannot create false duplicates (at 10^12 keys
64-bit collisions WOULD occur).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constraints import Unique
from ..sketches import hash_strings, mix64


def _default_buckets() -> int:
    from ..sketches import default_exchange_shards
    return default_exchange_shards()


def _bucketize(key: str, num_buckets: int, pre_aggregate: bool):
    def fn(t: pa.Table) -> pa.Table:
        # null keys are handled by not_null(key); also Ray's sort-based
        # groupby cannot order null keys
        t = t.filter(pc.is_valid(t[key]))
        h = hash_strings(pc.cast(t[key], pa.string()))
        pre = pa.table({
            key: t[key],
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })
        if not pre_aggregate:
            return pre
        g = pre.group_by(["bucket", key]).aggregate([(key, "count")])
        return g.rename_columns(["bucket", key, "cnt"])
    return fn


def _find_dups(key: str, pre_aggregated: bool):
    def fn(t: pa.Table) -> pa.Table:
        if pre_aggregated:
            g = t.group_by(key).aggregate([("cnt", "sum")])
        else:
            g = t.group_by(key).aggregate([(key, "count")])
        g = g.rename_columns([key, "dup_count"])
        return g.filter(pc.greater(g["dup_count"], 1))
    return fn


def duplicate_keys_from_files(files: list[str], key: str,
                              num_buckets: int | None = None,
                              pre_aggregate: bool = False):
    """Fused variant: each task reads ONLY the key column of its file
    (column-pruned parquet read inside the task — the decoded key data
    never transits the object store unaggregated); then the bucket
    groupby as in :func:`duplicate_keys`.

    ``pre_aggregate``: run a per-file combiner (group_by count) before
    the shuffle.  Leave OFF for near-unique keys — the combiner's
    group_by costs more CPU than the un-collapsed shuffle saves
    (measured 2.3x at 32M unique-ish ids); turn ON for corpora with
    heavy within-file duplication, where it shrinks the exchange."""
    import pyarrow.parquet as pq

    import ray.data

    nb = num_buckets or _default_buckets()
    bucketize = _bucketize(key, nb, pre_aggregate)

    def per_file(batch: pa.Table) -> pa.Table:
        outs = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=[key])
            outs.append(bucketize(t))
        return outs[0] if len(outs) == 1 else pa.concat_tables(outs)

    ds = ray.data.from_items([{"path": f} for f in files])
    pre = ds.map_batches(per_file, batch_format="pyarrow", batch_size=1)
    return pre.groupby("bucket").map_groups(
        _find_dups(key, pre_aggregate), batch_format="pyarrow")


def duplicate_composite_keys(ds, keys: list[str],
                             num_buckets: int | None = None):
    """-> Dataset(*keys, dup_count >= 2): exact uniqueness over a
    COMPOSITE key in one pass — the multi-column analog of
    :func:`duplicate_keys`.  The bucket is a mix of every component's
    hash (identical tuples always co-bucket); dup detection compares
    the real column values with a C++ Arrow multi-key ``group_by``
    inside the bucket, so cross-column hash collisions cannot create
    false duplicates.  Rows with ANY null component are dropped (they
    belong to not_null, and Ray's sort shuffle cannot order nulls)."""
    keys = list(keys)
    nb = num_buckets or _default_buckets()

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select(keys)
        mask = None
        for k in keys:
            v = pc.is_valid(t[k])
            mask = v if mask is None else pc.and_(mask, v)
        t = t.filter(mask)
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for i, k in enumerate(keys):
            h = mix64(h ^ hash_strings(pc.cast(t[k], pa.string())), i)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def find(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(keys[0], "count")])
        g = g.select(keys + [f"{keys[0]}_count"]) \
             .rename_columns(keys + ["dup_count"])
        return g.filter(pc.greater(g["dup_count"], 1))

    return ds.select_columns(keys) \
             .map_batches(bucketize, batch_format="pyarrow") \
             .groupby("bucket").map_groups(find, batch_format="pyarrow")


def duplicate_keys(ds, key: str, num_buckets: int | None = None,
                   pre_aggregate: bool = True):
    """-> Dataset(key, dup_count) with dup_count >= 2.  ``ds`` may be
    the full table; only (key, bucket[, cnt]) survives to the shuffle."""
    nb = num_buckets or _default_buckets()
    pre = (ds.select_columns([key])
             .map_batches(_bucketize(key, nb, pre_aggregate),
                          batch_format="pyarrow"))
    return pre.groupby("bucket").map_groups(
        _find_dups(key, pre_aggregate), batch_format="pyarrow")


def _violation_rows(key: str):
    c = Unique(key)

    def fn(t: pa.Table) -> pa.Table:
        keys = pc.cast(t[key], pa.string())
        n = len(keys)
        return pa.table({
            "key": keys,
            "partition_id": pa.array(["<global>"] * n, pa.string()),
            "constraint": pa.array([c.name] * n, pa.string()),
            "detail": pa.array([c.detail] * n, pa.string()),
        })
    return fn


def _atomic_write_violations(viol, n: int, out_dir: str) -> None:
    """Worker-written parquet sink with write-then-rename idempotence."""
    import os
    import shutil

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if n:
        viol.write_parquet(tmp)
    else:
        os.makedirs(tmp, exist_ok=True)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)


def stream_uniqueness_violations(ds_or_files, key: str, out_dir: str,
                                 num_buckets: int | None = None) -> int:
    """Write duplicate-key violation rows as partitioned parquet
    directly from Ray workers (write-then-rename, idempotent) and
    return only the count.  This is the DEFAULT pipeline path: unlike
    :func:`uniqueness_violations` it never pulls the duplicate keys to
    the driver, so a pathological all-duplicates corpus stays bounded
    (blocks live in the object store, which may spill)."""
    if isinstance(ds_or_files, (list, tuple)):
        dups = duplicate_keys_from_files(list(ds_or_files), key, num_buckets)
    else:
        dups = duplicate_keys(ds_or_files, key, num_buckets)
    viol = dups.map_batches(_violation_rows(key),
                            batch_format="pyarrow").materialize()
    n = viol.count()
    _atomic_write_violations(viol, n, out_dir)
    return n


def _multi_bucketize(cols: list[str], nb: int):
    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for ci, col in enumerate(cols):
            keys = pc.cast(t[col], pa.string())
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            keys = keys.filter(pc.is_valid(keys))
            h = mix64(hash_strings(keys), ci)
            parts.append(pa.table({
                "tag": pa.array(np.full(len(keys), ci, np.int32),
                                pa.int32()),
                "key": keys,
                "bucket": pa.array((h % np.uint64(nb)).astype(np.int64)),
            }))
        return pa.concat_tables(parts)
    return fn


def _multi_find(t: pa.Table) -> pa.Table:
    g = t.group_by(["tag", "key"]).aggregate([("key", "count")])
    g = g.select(["tag", "key", "key_count"]) \
         .rename_columns(["tag", "key", "dup_count"])
    return g.filter(pc.greater(g["dup_count"], 1))


def stream_uniqueness_violations_multi(ds_or_files, cols: list[str],
                                       out_dirs: dict,
                                       num_buckets: int | None = None
                                       ) -> dict:
    """Single-pass uniqueness for MULTIPLE declared-unique columns: the
    input is read ONCE (fused column-pruned file reads, or one
    projected Dataset) and every column's keys ride the same bucket
    exchange as tagged rows; per bucket one multi-key Arrow group_by
    finds each column's duplicates.  Halves-or-better the scan cost of
    a schema with several ``unique=True`` fields versus one pass per
    column.  ``out_dirs`` maps column -> violation sink directory;
    returns {column: duplicate_row_count}."""
    import ray.data

    cols = list(cols)
    nb = num_buckets or _default_buckets()
    bucketize = _multi_bucketize(cols, nb)

    if isinstance(ds_or_files, (list, tuple)):
        import pyarrow.parquet as pq

        files = list(ds_or_files)

        def per_file(batch: pa.Table) -> pa.Table:
            outs = []
            for path in batch["path"].to_pylist():
                outs.append(bucketize(pq.read_table(path, columns=cols)))
            return outs[0] if len(outs) == 1 else pa.concat_tables(outs)

        pre = ray.data.from_items([{"path": f} for f in files]) \
            .map_batches(per_file, batch_format="pyarrow", batch_size=1)
    else:
        pre = ds_or_files.map_batches(bucketize, batch_format="pyarrow")

    dups = pre.groupby("bucket").map_groups(_multi_find,
                                            batch_format="pyarrow")
    mat = dups.materialize()
    counts: dict = {}
    for ci, col in enumerate(cols):
        def pick(t: pa.Table, ci=ci, col=col) -> pa.Table:
            s = t.filter(pc.equal(t["tag"], ci))
            return pa.table({col: s["key"]})

        viol = mat.map_batches(pick, batch_format="pyarrow") \
                  .map_batches(_violation_rows(col),
                               batch_format="pyarrow").materialize()
        n = viol.count()
        _atomic_write_violations(viol, n, out_dirs[col])
        counts[col] = n
    return counts


def uniqueness_violations(ds_or_files, key: str,
                          num_buckets: int | None = None) -> pa.Table:
    """Materialize duplicate keys as frozen violation rows
    (key, partition_id='<global>', constraint, detail).  Accepts a
    Dataset or a list of parquet paths (fused, column-pruned reads).
    The duplicate set is assumed small relative to the input
    (defect-rate sized); for a pathological all-duplicates input,
    stream ``duplicate_keys`` to parquet instead."""
    if isinstance(ds_or_files, (list, tuple)):
        dups = duplicate_keys_from_files(list(ds_or_files), key, num_buckets)
    else:
        dups = duplicate_keys(ds_or_files, key, num_buckets)
    rows = _violation_rows(key)
    parts = [rows(batch) for batch
             in dups.iter_batches(batch_format="pyarrow", batch_size=None)
             if batch.num_rows]
    if not parts:
        return pa.table({
            "key": pa.array([], pa.string()),
            "partition_id": pa.array([], pa.string()),
            "constraint": pa.array([], pa.string()),
            "detail": pa.array([], pa.string()),
        })
    return pa.concat_tables(parts)
