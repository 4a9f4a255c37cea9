"""ORC source/sink: round-trip, stripe parallelism, column pruning,
resumable part skip."""

import os

import pyarrow as pa
import pytest

import ray

from pyschema_ray.sources.orc_io import read_orc, write_orc


def _tbl(ds):
    parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                        batch_size=None) if b.num_rows]
    return pa.concat_tables(parts) if parts else None


def _docs(n=300):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"words number {i}" for i in range(n)],
                         pa.string()),
        "score": pa.array([i * 0.5 for i in range(n)], pa.float64())})


def test_orc_roundtrip_multiblock(tmp_path):
    t = _docs()
    ds = ray.data.from_arrow(t).repartition(4)
    manifest = _tbl(write_orc(ds, str(tmp_path)))
    assert manifest["rows"].to_pylist() and \
        sum(manifest["rows"].to_pylist()) == 300
    assert len(manifest) == len(set(manifest["path"].to_pylist()))
    back = _tbl(read_orc(str(tmp_path))).sort_by("doc_id")
    assert back.select(["doc_id", "text", "score"]).equals(
        t.select(["doc_id", "text", "score"]))


def test_orc_column_pruning(tmp_path):
    ds = ray.data.from_arrow(_docs(50))
    _tbl(write_orc(ds, str(tmp_path)))
    back = _tbl(read_orc(str(tmp_path), columns=["doc_id"]))
    assert back.column_names == ["doc_id"]
    assert sorted(back["doc_id"].to_pylist()) == list(range(50))


def test_orc_stripe_parallel_read(tmp_path):
    # tiny stripe size forces multiple stripes per file; the reader
    # must reassemble them all exactly once
    t = _docs(2000)
    _tbl(write_orc(ray.data.from_arrow(t), str(tmp_path),
                   stripe_size=4096))
    from pyarrow import orc
    f = [x for x in os.listdir(tmp_path) if x.endswith(".orc")]
    assert len(f) >= 1
    assert orc.ORCFile(os.path.join(tmp_path, f[0])).nstripes > 1
    back = _tbl(read_orc(str(tmp_path))).sort_by("doc_id")
    assert back["doc_id"].to_pylist() == list(range(2000))


def test_orc_resumable_part_skip(tmp_path):
    ds = ray.data.from_arrow(_docs(40))
    m1 = _tbl(write_orc(ds, str(tmp_path)))
    path = m1["path"].to_pylist()[0]
    mtime = os.path.getmtime(path)
    m2 = _tbl(write_orc(ds, str(tmp_path)))  # same content -> same tag
    assert os.path.getmtime(path) == mtime   # not rewritten
    assert sorted(m2["path"].to_pylist()) == \
        sorted(m1["path"].to_pylist())


def test_orc_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_orc(str(tmp_path / "nope_dir_without_orc"))
