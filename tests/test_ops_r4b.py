"""Round-4 batch 2: running windows, JSON extraction, label
centroids, deterministic splits."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _ts(*seconds):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.array([base + np.timedelta64(int(s * 1_000_000), "us")
                     for s in seconds], pa.timestamp("us"))


# ------------------------------------------------------ grouped_running

def test_grouped_running_resets_per_key():
    from pyschema_ray.functions.ordered import grouped_running

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": _ts(0, 10, 20, 0, 5),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "value": pa.array([1.5, 2.0, None, 10.0, -0.25], pa.float64())})
    out = _tbl(grouped_running(ray.data.from_arrow(t), num_shards=3)) \
        .sort_by("event_id").to_pandas()
    assert out.row_number.tolist() == [1, 2, 3, 1, 2]
    # null contributes 0; milli-units, half-away-from-zero rounding
    assert out.running_millis.tolist() == [1500, 3500, 3500,
                                           10000, 9750]


def test_grouped_running_tie_order_by_event_id():
    from pyschema_ray.functions.ordered import grouped_running

    t = pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": _ts(3, 3),
        "event_id": pa.array([20, 10], pa.int64()),
        "value": pa.array([1.0, 2.0], pa.float64())})
    out = _tbl(grouped_running(ray.data.from_arrow(t), num_shards=2)) \
        .sort_by("event_id").to_pandas()
    # event 10 sorts first at equal ts
    assert dict(zip(out.event_id, out.row_number)) == {10: 1, 20: 2}
    assert dict(zip(out.event_id, out.running_millis)) == \
        {10: 2000, 20: 3000}


# ------------------------------------------------------ json extraction

def test_extract_json_int_edges():
    from pyschema_ray.functions.jsonx import extract_json_int

    col = pa.chunked_array([pa.array(
        ['{"k": 42}', '{"k":-7, "j": 1}', '{"j": 5}', None,
         'not json', '{"k": "str"}'])])
    got = extract_json_int(col, "k").to_pylist()
    assert got == [42, -7, None, None, None, None]


def test_json_field_stats_groups():
    from pyschema_ray.functions.jsonx import json_field_stats

    t = pa.table({
        "props": ['{"k": 1}', '{"k": 2}', '{"x": 9}', '{"k": 5}'],
        "etype": ["a", "a", "a", None]})
    out = _tbl(json_field_stats(
        ray.data.from_arrow(t).repartition(2), "props", "k", "etype")) \
        .to_pandas()
    got = {r.etype: (r.n_with_field, r.sum_field)
           for r in out.itertuples()}
    assert got == {"a": (2, 3), "[NULL]": (1, 5)}


# ------------------------------------------------------ label centroids

def test_label_centroids_ragged_and_exact():
    from pyschema_ray.functions.similarity import label_centroids

    t = pa.table({
        "label": pa.array([0, 0, 1, None], pa.int32()),
        "embedding": pa.array(
            [[1.0, 3.0], [3.0, 5.0], [2.0, 2.0, 8.0], None],
            pa.list_(pa.float32()))})
    out = _tbl(label_centroids(ray.data.from_arrow(t).repartition(2))) \
        .sort_by([("label", "ascending"), ("dim", "ascending")]) \
        .to_pandas()
    rows = [(r.label, r.dim, r.mean_val, r.n_vectors)
            for r in out.itertuples()]
    assert rows == [(0, 1, 2.0, 2), (0, 2, 4.0, 2),
                    (1, 1, 2.0, 1), (1, 2, 2.0, 1), (1, 3, 8.0, 1)]


# -------------------------------------------------------------- splits

def test_split_assign_deterministic_and_partition_invariant():
    from pyschema_ray.functions.sample import knuth_bucket, \
        split_assign_batch

    keys = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(keys, pa.int64())})
    lab1 = split_assign_batch(t)["split"].to_pylist()
    # same keys split across two batches -> identical labels
    lab2 = split_assign_batch(t.slice(0, 500))["split"].to_pylist() \
        + split_assign_batch(t.slice(500))["split"].to_pylist()
    assert lab1 == lab2
    # roughly 80/10/10
    from collections import Counter
    c = Counter(lab1)
    assert 700 < c["train"] < 880 and c["val"] + c["test"] < 300
    # boundary semantics: bucket == floor(0.8 * 2^32) goes to val
    cut = int(0.8 * (1 << 32))
    h = knuth_bucket(keys)
    at = np.flatnonzero(h < cut)
    assert all(lab1[i] == "train" for i in at[:50])


def test_split_assign_null_key_last_bucket():
    from pyschema_ray.functions.sample import split_assign_batch

    t = pa.table({"doc_id": pa.array([1, None], pa.int64())})
    lab = split_assign_batch(t)["split"].to_pylist()
    assert lab[1] == "test"


def test_split_stats_totals():
    from pyschema_ray.functions.sample import split_stats

    t = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64), pa.int64()),
        "n_chars": pa.array(np.full(300, 10, np.int64), pa.int64())})
    out = _tbl(split_stats(ray.data.from_arrow(t).repartition(3))) \
        .to_pandas()
    assert out.n_rows.sum() == 300
    assert out.total_weight.sum() == 3000
    assert (out.total_weight == out.n_rows * 10).all()
