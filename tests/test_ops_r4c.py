"""Round-4 batch 3: grouped mode, funnels, per-group deterministic
samples, pivoted counts."""

import numpy as np
import pyarrow as pa

import ray


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _ts(*seconds):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.array([base + np.timedelta64(int(s * 1_000_000), "us")
                     for s in seconds], pa.timestamp("us"))


def test_grouped_mode_tie_breaks_lexically():
    from pyschema_ray.functions.analytics import grouped_mode

    t = pa.table({
        "src": ["a", "a", "a", "a", "b", None],
        "lang": ["fr", "en", "en", "fr", None, "zz"]})
    out = _tbl(grouped_mode(ray.data.from_arrow(t).repartition(3),
                            "src", "lang", num_shards=2)).to_pandas()
    got = {r.src: (r.mode_val, r.n_occurrences)
           for r in out.itertuples()}
    # en/fr tie at 2 in group a -> lexically smallest wins
    assert got["a"] == ("en", 2)
    assert got["b"] == ("[NULL]", 1)
    assert got["[NULL]"] == ("zz", 1)


def test_funnel_strict_order_and_prefixes():
    from pyschema_ray.functions.analytics import funnel_counts

    # u1 completes all 3; u2 view only; u3 click BEFORE view (not
    # counted past step 1); u4 view & purchase but no click
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3, 4, 4], pa.int64()),
        "event_type": ["view", "click", "purchase", "view",
                       "click", "view", "view", "purchase"],
        "ts": _ts(0, 10, 20, 0, 0, 10, 0, 10)})
    out = _tbl(funnel_counts(
        ray.data.from_arrow(t).repartition(3),
        steps=["view", "click", "purchase"], num_shards=3)).to_pandas()
    row = out.iloc[0]
    assert (row.completed_1, row.completed_2, row.completed_3) \
        == (4, 1, 1)


def test_funnel_equal_ts_not_strictly_increasing():
    from pyschema_ray.functions.analytics import funnel_counts

    t = pa.table({
        "user_id": pa.array([9, 9], pa.int64()),
        "event_type": ["view", "click"],
        "ts": _ts(5, 5)})
    out = _tbl(funnel_counts(ray.data.from_arrow(t),
                             steps=["view", "click"],
                             num_shards=2)).to_pandas().iloc[0]
    assert (out.completed_1, out.completed_2) == (1, 0)


def test_grouped_sample_partition_invariant():
    from pyschema_ray.functions.sample import grouped_sample

    t = pa.table({
        "src": pa.array(["a"] * 50 + ["b"] * 50),
        "doc_id": pa.array(np.arange(100, dtype=np.int64), pa.int64())})
    a = _tbl(grouped_sample(ray.data.from_arrow(t).repartition(2),
                            "src", "doc_id", k=4, num_shards=3)) \
        .sort_by([("src", "ascending"), ("doc_id", "ascending")])
    b = _tbl(grouped_sample(ray.data.from_arrow(t).repartition(7),
                            "src", "doc_id", k=4, num_shards=5)) \
        .sort_by([("src", "ascending"), ("doc_id", "ascending")])
    assert a.equals(b)
    import collections
    c = collections.Counter(a["src"].to_pylist())
    assert c == {"a": 4, "b": 4}


def test_pivot_counts_other_fold_and_null():
    from pyschema_ray.functions.analytics import pivot_counts

    t = pa.table({
        "grp": ["x", "x", "x", "y", None],
        "cat": ["p", "q", "weird", "p", None]})
    out = _tbl(pivot_counts(ray.data.from_arrow(t).repartition(2),
                            "grp", "cat", categories=["p", "q"])) \
        .to_pandas().set_index("grp")
    assert out.loc["x"].tolist() == [1, 1, 1]
    assert out.loc["y"].tolist() == [1, 0, 0]
    assert out.loc["[NULL]"].tolist() == [0, 0, 1]
