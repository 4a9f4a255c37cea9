"""Arrow IPC source/sink: round-trip, batch parallelism, pruning,
resumable part skip."""

import os

import pyarrow as pa
import pytest

import ray

from pyschema_ray.sources.ipc_io import read_ipc, write_ipc


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


def test_ipc_roundtrip_multiblock(tmp_path):
    t = _docs()
    manifest = _tbl(write_ipc(ray.data.from_arrow(t).repartition(4),
                              str(tmp_path)))
    assert sum(manifest["rows"].to_pylist()) == 300
    back = _tbl(read_ipc(str(tmp_path))).sort_by("doc_id")
    assert back.select(["doc_id", "text", "score"]).equals(
        t.select(["doc_id", "text", "score"]))


def test_ipc_batch_parallel_read_and_pruning(tmp_path):
    t = _docs(1000)
    _tbl(write_ipc(ray.data.from_arrow(t), str(tmp_path),
                   max_chunksize=100))
    f = [x for x in os.listdir(tmp_path) if x.endswith(".arrow")]
    assert pa.ipc.open_file(
        os.path.join(tmp_path, f[0])).num_record_batches == 10
    back = _tbl(read_ipc(str(tmp_path), columns=["doc_id"]))
    assert back.column_names == ["doc_id"]
    assert sorted(back["doc_id"].to_pylist()) == list(range(1000))


def test_ipc_resumable_part_skip(tmp_path):
    ds = ray.data.from_arrow(_docs(40))
    m1 = _tbl(write_ipc(ds, str(tmp_path)))
    path = m1["path"].to_pylist()[0]
    mtime = os.path.getmtime(path)
    m2 = _tbl(write_ipc(ds, str(tmp_path)))
    assert os.path.getmtime(path) == mtime
    assert sorted(m2["path"].to_pylist()) == \
        sorted(m1["path"].to_pylist())


def test_ipc_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_ipc(str(tmp_path / "nope"))
