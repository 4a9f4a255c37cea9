"""Property-based tests (hypothesis): the vectorized constraint masks
must agree with a naive per-row oracle on ARBITRARY inputs (nulls,
empties, extremes), serialization must round-trip, and sketch merges
must be associative regardless of how the data is split."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pyschema_ray import constraints as C
from pyschema_ray.sketches import GroupedHistogram, TDigest

# keep examples small and the suite fast; Ray isn't needed here
SETTINGS = dict(max_examples=60, deadline=None)

maybe_int = st.one_of(st.none(), st.integers(-100, 200))
maybe_text = st.one_of(st.none(),
                       st.text(alphabet="abc-019", max_size=8))
maybe_list = st.one_of(st.none(),
                       st.lists(st.one_of(st.none(),
                                          st.integers(-5, 25)),
                                max_size=6))


@given(st.lists(maybe_int, max_size=30))
@settings(**SETTINGS)
def test_range_mask_matches_oracle(values):
    t = pa.table({"x": pa.array(values, pa.int64())})
    mask = C.Range("x", 0, 100).mask(t)
    got = pa.chunked_array([mask]).combine_chunks().to_pylist() \
        if isinstance(mask, pa.ChunkedArray) else mask.to_pylist()
    want = [True if v is None else (0 <= v <= 100) for v in values]
    assert got == want


@given(st.lists(maybe_text, max_size=30))
@settings(**SETTINGS)
def test_not_null_and_regex_match_oracle(values):
    import re

    t = pa.table({"s": pa.array(values, pa.string())})
    nn = C.NotNull("s").mask(t).to_pylist()
    assert nn == [v is not None for v in values]
    rx = C.Regex("s", r"^a").mask(t)
    rx = rx.to_pylist() if not isinstance(rx, pa.ChunkedArray) \
        else rx.combine_chunks().to_pylist()
    want = [True if v is None else bool(re.search(r"^a", v))
            for v in values]
    assert rx == want


@given(st.lists(maybe_list, max_size=25))
@settings(**SETTINGS)
def test_element_range_matches_oracle(lists):
    t = pa.table({"lst": pa.array(lists, pa.list_(pa.int64()))})
    mask = C.ElementRange("lst", 0, 20).mask(t)
    got = mask.to_pylist() if not isinstance(mask, pa.ChunkedArray) \
        else mask.combine_chunks().to_pylist()
    want = []
    for row in lists:
        if row is None:
            want.append(True)
        else:
            want.append(all(v is None or 0 <= v < 20 for v in row))
    assert got == want


@given(st.lists(maybe_list, max_size=20), st.lists(maybe_int, max_size=20))
@settings(**SETTINGS)
def test_length_equals_matches_oracle(lists, ns):
    n = min(len(lists), len(ns))
    lists, ns = lists[:n], ns[:n]
    t = pa.table({"lst": pa.array(lists, pa.list_(pa.int64())),
                  "n": pa.array(ns, pa.int64())})
    mask = C.LengthEquals("n", "lst").mask(t)
    got = mask.to_pylist() if not isinstance(mask, pa.ChunkedArray) \
        else mask.combine_chunks().to_pylist()
    want = [True if (row is None or k is None) else (k == len(row))
            for row, k in zip(lists, ns)]
    assert got == want


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=400),
       st.integers(2, 5))
@settings(**SETTINGS)
def test_tdigest_split_invariance(values, n_splits):
    arr = np.asarray(values)
    whole = TDigest(100).add(arr)
    parts = np.array_split(arr, n_splits)
    merged = TDigest(100)
    for p in parts:
        merged.merge(TDigest(100).add(p))
    assert merged.count == whole.count == len(values)
    assert merged.min == whole.min and merged.max == whole.max
    lo, hi = float(arr.min()), float(arr.max())
    for q in (0.25, 0.5, 0.75):
        a, b = merged.quantile(q), whole.quantile(q)
        tol = max((hi - lo) * 0.15, 1e-9)
        assert abs(a - b) <= tol, (q, a, b)
        assert lo - 1e-9 <= a <= hi + 1e-9


@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.floats(0, 100, allow_nan=False)),
                max_size=200),
       st.integers(1, 4))
@settings(**SETTINGS)
def test_histogram_split_invariance(pairs, n_splits):
    keys = np.asarray([k for k, _ in pairs], dtype=object)
    vals = np.asarray([v for _, v in pairs])
    whole = GroupedHistogram(0, 100, 8).add(keys, vals)
    merged = GroupedHistogram(0, 100, 8)
    for idx in np.array_split(np.arange(len(pairs)), n_splits):
        merged.merge(GroupedHistogram(0, 100, 8)
                     .add(keys[idx], vals[idx]))
    assert set(merged.groups) == set(whole.groups)
    for g in whole.groups:
        np.testing.assert_array_equal(merged.groups[g], whole.groups[g])


@given(st.dictionaries(
    st.sampled_from(["t", "i", "f", "b"]),
    st.one_of(st.none(), st.text(max_size=5), st.integers(-50, 50),
              st.floats(-10, 10, allow_nan=False), st.booleans()),
    max_size=4))
@settings(**SETTINGS)
def test_record_load_never_crashes_and_round_trips_valid(payload):
    """Either from_json_compatible raises ParseError (invalid) or the
    record round-trips exactly — never any other exception."""
    from pyschema_ray import (Boolean, Float, Integer, ParseError, Record,
                              Text, no_auto_store)

    @no_auto_store
    class R(Record):
        t = Text()
        i = Integer()
        f = Float()
        b = Boolean()

    try:
        rec = R.from_json_compatible(payload)
    except ParseError:
        return
    back = R.from_json_compatible(rec.to_json_compatible())
    assert back == rec
