"""sliding_window_ndv (functions/windows.py): exact distinct-unit
counts per overlapping window — parity against a brute-force Python
reference, null handling, and shard-count invariance."""

import numpy as np
import pyarrow as pa

import ray

from pyschema_ray.functions.windows import sliding_window_ndv


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _expected(rows, window_s, slide_s):
    k = window_s // slide_s
    seen = {}
    for key, unit, epoch in rows:
        if key is None or unit is None or epoch is None:
            continue
        base = (epoch // slide_s) * slide_s
        for i in range(k):
            seen.setdefault((key, base - i * slide_s), set()).add(unit)
    return {g: len(u) for g, u in seen.items()}


def _events(rows):
    ts = pa.array(
        [None if e is None else e * 1_000_000 for _, _, e in rows],
        pa.int64()).cast(pa.timestamp("us"))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": ts,
    })).repartition(3)


ROWS = [
    ("click", 1, 100), ("click", 1, 200),        # same user, same window
    ("click", 2, 3700), ("click", 1, 3700),      # next slide, overlap
    ("view", 1, 100), ("view", 1, 7300),
    ("click", 3, 100), (None, 4, 100),           # null key ignored
    ("click", None, 100),                        # null unit ignored
    ("click", 5, None),                          # null ts ignored
    ("click", 1, 10_000), ("click", 2, 10_000),
]


def test_matches_python_reference():
    got_t = _tbl(sliding_window_ndv(_events(ROWS), window_s=7200,
                                    slide_s=3600, num_shards=4))
    got = {(r["event_type"], r["window_start"]): r["ndv"]
           for r in got_t.to_pylist()}
    assert got == _expected(ROWS, 7200, 3600)


def test_shard_count_invariance():
    a = _tbl(sliding_window_ndv(_events(ROWS), num_shards=1))
    b = _tbl(sliding_window_ndv(_events(ROWS), num_shards=16))
    ka = sorted(map(tuple, a.to_pydict().values() and zip(
        a["event_type"].to_pylist(), a["window_start"].to_pylist(),
        a["ndv"].to_pylist())))
    kb = sorted(zip(b["event_type"].to_pylist(),
                    b["window_start"].to_pylist(),
                    b["ndv"].to_pylist()))
    assert ka == kb


def test_window_equal_slide_is_tumbling():
    got_t = _tbl(sliding_window_ndv(_events(ROWS), window_s=3600,
                                    slide_s=3600, num_shards=4))
    got = {(r["event_type"], r["window_start"]): r["ndv"]
           for r in got_t.to_pylist()}
    assert got == _expected(ROWS, 3600, 3600)


def test_rejects_non_multiple():
    import pytest
    with pytest.raises(ValueError):
        sliding_window_ndv(_events(ROWS), window_s=5000, slide_s=3600)
