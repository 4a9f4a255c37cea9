"""Round-5g moment-family extensions: grouped_skew_kurt (exact 3rd/
4th-moment stats from integer power sums) and spearman_corr (rank
transform + Pearson over doubled average ranks, joint-histogram
combiner)."""

import math

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.analytics import (grouped_skew_kurt,
                                              spearman_corr)


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _np_skew_kurt(x: np.ndarray) -> tuple[float, float]:
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    return m3 / m2 ** 1.5, m4 / m2 ** 2 - 3.0


def test_skew_kurt_matches_numpy():
    rng = np.random.default_rng(7)
    xa = rng.integers(1, 50, 400)
    xb = np.concatenate([rng.integers(1, 10, 300),
                         rng.integers(40, 50, 60)])  # skewed
    t = pa.table({
        "g": pa.array(["a"] * len(xa) + ["b"] * len(xb)),
        "x": pa.array(np.concatenate([xa, xb]).astype(np.float64)),
    })
    out = grouped_skew_kurt(_ds(t, 5), "g", "x")
    assert out.column_names == ["g", "skewness", "kurtosis_excess"]
    rows = dict(zip(out["g"].to_pylist(),
                    zip(out["skewness"].to_pylist(),
                        out["kurtosis_excess"].to_pylist())))
    for name, arr in (("a", xa), ("b", xb)):
        sk, ku = _np_skew_kurt(arr.astype(np.float64))
        assert math.isclose(rows[name][0], sk, rel_tol=1e-12)
        assert math.isclose(rows[name][1], ku, rel_tol=1e-12)
    assert rows["b"][0] > rows["a"][0]  # injected right skew


def test_skew_kurt_constant_group_null():
    t = pa.table({"g": pa.array(["c"] * 5 + ["d"] * 3),
                  "x": pa.array([7.0] * 5 + [1.0, 2.0, 3.0])})
    out = grouped_skew_kurt(_ds(t, 2), "g", "x")
    rows = dict(zip(out["g"].to_pylist(),
                    out["skewness"].to_pylist()))
    assert rows["c"] is None
    assert rows["d"] is not None


def test_skew_kurt_null_rows_dropped():
    t = pa.table({"g": pa.array(["a", "a", None, "a", "a"]),
                  "x": pa.array([1.0, 2.0, 3.0, None, 4.0])})
    out = grouped_skew_kurt(_ds(t, 2), "g", "x")
    ref = grouped_skew_kurt(
        _ds(pa.table({"g": ["a"] * 3,
                      "x": [1.0, 2.0, 4.0]}), 1), "g", "x")
    assert out.equals(ref)


def test_spearman_monotone_is_one():
    x = np.arange(100, dtype=np.float64)
    t = pa.table({"x": pa.array(x), "y": pa.array(x ** 3)})
    out = spearman_corr(_ds(t, 4), "x", "y")
    assert math.isclose(out["spearman"][0].as_py(), 1.0)
    t2 = pa.table({"x": pa.array(x), "y": pa.array(-x)})
    assert math.isclose(
        spearman_corr(_ds(t2, 4), "x", "y")["spearman"][0].as_py(),
        -1.0)


def test_spearman_ties_match_scipy_formula():
    # hand-checked tied example: average-rank Pearson
    x = np.array([1, 1, 2, 3, 3, 3], np.float64)
    y = np.array([2, 1, 1, 3, 3, 2], np.float64)

    def avg_ranks(v):
        r = np.empty(len(v))
        for val in np.unique(v):
            sel = v == val
            lo = (v < val).sum()
            r[sel] = lo + (sel.sum() + 1) / 2.0
        return r

    rx, ry = avg_ranks(x), avg_ranks(y)
    expect = np.corrcoef(rx, ry)[0, 1]
    got = spearman_corr(
        _ds(pa.table({"x": x, "y": y}), 3), "x", "y") \
        ["spearman"][0].as_py()
    assert math.isclose(got, expect, rel_tol=1e-12)


def test_spearman_degenerate_and_nulls():
    t = pa.table({"x": pa.array([1.0, 1.0, 1.0]),
                  "y": pa.array([1.0, 2.0, 3.0])})
    assert spearman_corr(_ds(t, 1), "x", "y")["spearman"][0].as_py() \
        is None
    t2 = pa.table({"x": pa.array([1.0, None, 2.0, 3.0]),
                   "y": pa.array([1.0, 5.0, None, 3.0])})
    got = spearman_corr(_ds(t2, 2), "x", "y")["spearman"][0].as_py()
    ref = spearman_corr(
        _ds(pa.table({"x": [1.0, 3.0], "y": [1.0, 3.0]}), 1),
        "x", "y")["spearman"][0].as_py()
    assert math.isclose(got, ref)
