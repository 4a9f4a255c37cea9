"""Property-based round-trip testing of the Avro codec
(sources/avro_io.py) with hypothesis: arbitrary tables over the
supported type matrix — any combination of nulls, empty strings,
unicode, extreme integers/floats, empty and long lists — must
round-trip value-exactly through encode_avro_block/decode_avro_block
and through the container file with both codecs."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pyschema_ray.sources.avro_io import (arrow_schema_for_avro,
                                          avro_schema_for_arrow,
                                          read_avro_file,
                                          write_avro_table)

_text = st.text(max_size=40)
_i64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
_i32 = st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1)
_f64 = st.floats(allow_nan=False, width=64)
_f32 = st.floats(allow_nan=False, width=32)


def _col(strategy, typ, nullable=True):
    elem = st.one_of(st.none(), strategy) if nullable else strategy
    return elem, typ


_COLUMNS = {
    "s": _col(_text, pa.string()),
    "i": _col(_i64, pa.int64()),
    "i32": _col(_i32, pa.int32()),
    "f": _col(_f64, pa.float64()),
    "f32": _col(_f32, pa.float32()),
    "b": _col(st.booleans(), pa.bool_()),
    "raw": _col(st.binary(max_size=20), pa.binary()),
    "li": _col(st.lists(_i32, max_size=8), pa.list_(pa.int32())),
    "lf": _col(st.lists(_f64, max_size=5), pa.list_(pa.float64())),
}


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    cols = {}
    for name, (elem, typ) in _COLUMNS.items():
        vals = draw(st.lists(elem, min_size=n, max_size=n))
        cols[name] = pa.array(vals, typ)
    return pa.table(cols)


@settings(max_examples=60, deadline=None)
@given(t=tables(), codec=st.sampled_from(["deflate", "null"]),
       block_rows=st.integers(min_value=1, max_value=7))
def test_container_roundtrip_property(tmp_path_factory, t, codec,
                                      block_rows):
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    write_avro_table(t, path, codec=codec, block_rows=block_rows)
    back = read_avro_file(path)
    assert back.schema == arrow_schema_for_avro(
        avro_schema_for_arrow(t.schema))
    assert back.num_rows == t.num_rows
    for col in t.column_names:
        assert back[col].to_pylist() == t[col].to_pylist(), col
