"""Property-based hardening for the round-5k operators: each
distributed result must equal a brute-force single-machine reference
on arbitrary generated inputs (skyline dominance, interval union,
rank statistics, CUSUM identity)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pyschema_ray.functions.analytics import _skyline_2d
from pyschema_ray.functions.layout import zorder_interleave


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=80))
def test_skyline_matches_brute_force(points):
    m = np.array([p[0] for p in points], np.int64)
    mx = np.array([p[1] for p in points], np.int64)
    sm, smx = _skyline_2d(m, mx)
    got = set(zip(sm.tolist(), smx.tolist()))
    want = set()
    pts = set(points)
    for a in pts:
        dominated = any(
            b[0] <= a[0] and b[1] >= a[1]
            and (b[0] < a[0] or b[1] > a[1]) for b in pts)
        if not dominated:
            want.add(a)
    assert got == want
    # frontier invariant: BOTH axes strictly ascending (a kept point
    # must strictly out-mx every cheaper survivor)
    assert all(sm[i] < sm[i + 1] for i in range(len(sm) - 1))
    assert all(smx[i] < smx[i + 1] for i in range(len(smx) - 1))


def _brute_union(intervals):
    total = 0
    islands = 0
    for s, e in sorted(intervals):
        if islands == 0 or s > cur_end:
            if islands:
                total += cur_end - cur_start
            islands += 1
            cur_start, cur_end = s, e
        else:
            cur_end = max(cur_end, e)
    if islands:
        total += cur_end - cur_start
    return islands, total


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 20)),
                min_size=1, max_size=40))
def test_interval_island_identity(iv):
    # the running-max island rule equals the classic sweep merge
    arr = sorted((s, s + d) for s, d in iv)
    starts = np.array([a[0] for a in arr], np.int64)
    ends = np.array([a[1] for a in arr], np.int64)
    cm = np.maximum.accumulate(ends)
    brk = np.ones(len(arr), bool)
    brk[1:] = starts[1:] > cm[:-1]
    isl_starts = np.flatnonzero(brk)
    isl_last = np.append(isl_starts[1:] - 1, len(arr) - 1)
    total = int((cm[isl_last] - starts[isl_starts]).sum())
    n_isl, want_total = _brute_union(arr)
    assert len(isl_starts) == n_isl
    assert total == want_total


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=0, max_size=60))
def test_cusum_identity_matches_recursion(ds):
    d = np.array(ds, np.int64)
    if len(d) == 0:
        return
    c = np.cumsum(d)
    s_vec = c - np.minimum(np.minimum.accumulate(c), 0)
    s = 0
    ref = []
    for x in ds:
        s = max(0, s + x)
        ref.append(s)
    assert s_vec.tolist() == ref


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 15), min_size=1, max_size=60),
       st.lists(st.integers(0, 15), min_size=1, max_size=60))
def test_rank_stats_match_brute_force(a, b):
    # doubled Mann-Whitney rank sum + KS numerator from the
    # distinct-count formulation vs direct midrank computation
    from pyschema_ray.functions.ranktests import _PARTIAL_SCHEMA  # noqa: F401
    qs = sorted(set(a) | set(b))
    n1 = {q: a.count(q) for q in qs}
    n2 = {q: b.count(q) for q in qs}
    N1, N2 = len(a), len(b)
    c1 = c2 = 0
    ks = 0
    r1_doubled = 0
    C = 0
    for q in qs:
        c1 += n1[q]
        c2 += n2[q]
        ks = max(ks, abs(c1 * N2 - c2 * N1))
        nv = n1[q] + n2[q]
        r1_doubled += n1[q] * (2 * C + nv + 1)
        C += nv
    # reference: midranks over the pooled sample
    pooled = sorted(a + b)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2  # midrank of the tie run
        i = j
    want_r1 = sum(ranks[x] for x in a)
    assert r1_doubled == round(2 * want_r1)
    # KS via ECDF sweep
    want_ks = 0
    for q in qs:
        f1 = sum(1 for x in a if x <= q)
        f2 = sum(1 for x in b if x <= q)
        want_ks = max(want_ks, abs(f1 * N2 - f2 * N1))
    assert ks == want_ks


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=0, max_size=50),
       st.lists(st.integers(0, 255), min_size=0, max_size=50))
def test_zorder_preserves_locality_order(xs, ys):
    n = min(len(xs), len(ys))
    x = np.array(xs[:n], np.int64)
    y = np.array(ys[:n], np.int64)
    z = zorder_interleave(x, y, 8)
    # de-interleave inverts exactly
    xi = np.zeros(n, np.int64)
    yi = np.zeros(n, np.int64)
    for i in range(8):
        xi |= ((z >> np.int64(2 * i)) & 1) << np.int64(i)
        yi |= ((z >> np.int64(2 * i + 1)) & 1) << np.int64(i)
    assert np.array_equal(xi, x)
    assert np.array_equal(yi, y)
