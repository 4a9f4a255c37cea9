"""Map-type constraints: vectorized MapRequiredKeys / MapValueRange
must agree slot-for-slot with the row-path Map._load enforcement."""

import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray import Integer, Map, Record, no_auto_store
from pyschema_ray.constraints import MapRequiredKeys, MapValueRange
from pyschema_ray.schema import ParseError

MAPS = [
    {"a": 1, "b": 2},          # ok
    {"a": 5},                  # missing 'b'
    {"a": 1, "b": 99},         # value out of range
    None,                      # null map (NotNull's job, both valid here)
    {},                        # empty: missing both keys
    {"a": 1, "b": None},       # null value: skipped by range
]
MAP_TYPE = pa.map_(pa.string(), pa.int64())


def _table():
    return pa.table({"props": pa.array(MAPS, MAP_TYPE)})


def test_map_required_keys_mask():
    m = MapRequiredKeys("props", ["a", "b"]).mask(_table())
    assert m.to_pylist() == [True, False, True, True, False, True]


def test_map_value_range_mask():
    m = MapValueRange("props", 0, 50).mask(_table())
    assert m.to_pylist() == [True, True, False, True, True, True]


def test_map_mask_on_sliced_batch():
    """The .values-rebase rule: masks over a SLICED map column must
    not read other rows' children."""
    t = _table().slice(2, 3)  # rows 2..4
    assert MapRequiredKeys("props", ["a", "b"]).mask(t).to_pylist() == \
        [True, True, False]
    assert MapValueRange("props", 0, 50).mask(t).to_pylist() == \
        [False, True, True]


def test_row_path_parity():
    @no_auto_store
    class Rec(Record):
        props = Map(Integer(size=8), required_keys=["a", "b"],
                    value_min=0, value_max=50)

    # vectorized verdict per row (non-null rows only; row path loads
    # one record at a time)
    req = MapRequiredKeys("props", ["a", "b"]).mask(_table()).to_pylist()
    rng = MapValueRange("props", 0, 50).mask(_table()).to_pylist()
    for i, mp in enumerate(MAPS):
        if mp is None:
            continue
        row_ok = True
        try:
            Rec._fields["props"].load(mp)
        except ParseError:
            row_ok = False
        assert row_ok == (req[i] and rng[i]), (i, mp)


def test_map_constraints_in_field_constraint_list():
    @no_auto_store
    class Rec(Record):
        props = Map(Integer(size=8), required_keys=["k"], value_min=1)

    names = sorted(c.name for c in Rec._fields["props"].constraints())
    assert "map_required_keys(props)" in names
    assert "map_value_range(props)" in names


def test_map_constraints_empty_and_chunked():
    t = pa.table({"props": pa.chunked_array([
        pa.array(MAPS[:3], MAP_TYPE), pa.array(MAPS[3:], MAP_TYPE)])})
    assert MapRequiredKeys("props", ["a"]).mask(t).to_pylist() == \
        [True, True, True, True, False, True]
    empty = pa.table({"props": pa.array([], MAP_TYPE)})
    assert MapRequiredKeys("props", ["a"]).mask(empty).to_pylist() == []
    assert MapValueRange("props", 0, 1).mask(empty).to_pylist() == []


def test_map_violations_query_survives_null_props(tmp_path):
    """Regression: the null-props branch used MapArray.from_arrays's
    mask kwarg, which pyarrow 16 rejects; null maps are now encoded
    via null offsets."""
    import shutil

    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf"
    d.mkdir()
    for f in ("events.parquet",):
        t = pq.read_table(f"{src}/{f}")
        props = t["props"].to_pylist()
        props[0] = None  # inject a null props row
        props[1] = "{}"  # and a json object without 'k'
        t = t.set_column(t.schema.get_field_index("props"), "props",
                         pa.array(props, pa.string()))
        pq.write_table(t, str(d / f))
    out = entrymod.queries()["map_violations_events"](str(d))
    # row 1 ({} without k) must surface as a required-keys violation;
    # the null row must not crash and not violate
    ids = t["event_id"].to_pylist()
    viol = dict(zip(out["event_id"].to_pylist(),
                    out["constraint"].to_pylist()))
    assert viol.get(ids[1]) == "map_required_keys(props_map)"
    assert ids[0] not in viol
