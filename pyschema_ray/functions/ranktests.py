"""Distributed two-sample rank statistics (KS + Mann-Whitney).

The drift checks in stages/drift.py compare binned histograms (KL /
PSI) — fast, but the bin edges are a modeling choice.  The two
classical NONPARAMETRIC two-sample tests need no bins:

* Kolmogorov-Smirnov D = max over values of |F1(v) - F2(v)|;
* Mann-Whitney rank-sum R1 = sum of (mid)ranks of group 1 in the
  combined ordering, from which U1 = R1 - n1(n1+1)/2.

Both are functions of the SORTED distinct-value counts, so the
Ray-Data shape is: quantize values to exact integer milli-units
(``round(v * scale)`` — the same SQL-reproducible contract as
functions/ordered.py), per-batch (q, n1, n2) count combiners, ONE
groupby exchange on the quantized value (bounded by the distinct
quantized domain, never the row count), then Ray's range-partitioned
sort over that distinct table and per-block scalar partials combined
on the driver with arbitrary-precision prefix offsets — the exact
machinery proven by the Gini query (`__ray_entry__` round-5j), reused
for two more order statistics.

Integer exactness: with N1, N2 the group totals and c1, c2 the
inclusive cumulative counts at a distinct value,

* KS numerator  a_v = c1_v * N2 - c2_v * N1  (D = max|a_v| / (N1*N2));
* doubled rank sum  2*R1 = sum_v n1_v * (2*C_v + n_v + 1)  where
  C_v = total count before v and n_v = n1_v + n2_v (mid-rank ties:
  each of the n_v tied rows gets rank C_v + (n_v+1)/2, so DOUBLING
  clears the half).

Every within-block product stays in int64 under the documented
contract |c| * max(N1, N2) < 2^63 (at 10^12 rows use scale to merge
values, or swap the int64 block vectors for the float64 path whose
2^-52 relative error is far below any test threshold); every
cross-block term is a Python int on O(blocks) partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _round_half_away

_PARTIAL_SCHEMA = pa.schema([
    ("n1", pa.int64()), ("n2", pa.int64()), ("min_q", pa.int64()),
    ("a_min", pa.string()), ("a_max", pa.string()),
    ("mwu_local", pa.string()),
])


def quantized_group_counts(ds, value_col: str, group_col: str,
                           g1: str, g2: str, scale: float = 1000.0):
    """Per distinct quantized value, the two groups' row counts:
    Dataset(q, n1, n2).  One groupby exchange bounded by the distinct
    quantized domain; rows with a null value or a group outside
    {g1, g2} are dropped (two-sample semantics)."""
    import ray.data.aggregate as A

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[value_col]),
                    pc.is_in(t[group_col], value_set=pa.array([g1, g2])))
        t = t.filter(m)
        v = t[value_col].to_numpy(zero_copy_only=False)
        q = _round_half_away(np.asarray(v, np.float64) * scale) \
            .astype(np.int64)
        is1 = pc.equal(t[group_col], g1).to_numpy(zero_copy_only=False)
        g = pa.table({
            "q": pa.array(q, pa.int64()),
            "n1": pa.array(is1.astype(np.int64), pa.int64()),
            "n2": pa.array((~is1).astype(np.int64), pa.int64()),
        }).group_by("q").aggregate([("n1", "sum"), ("n2", "sum")])
        return g.rename_columns(["q", "n1", "n2"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("q").aggregate(A.Sum("n1"), A.Sum("n2"))


def two_sample_rank_tests(ds, value_col: str, group_col: str,
                          g1: str, g2: str,
                          scale: float = 1000.0) -> pa.Table:
    """Exact KS numerator + doubled Mann-Whitney rank sum between the
    ``value_col`` distributions of groups ``g1`` and ``g2``.

    Returns a ONE-ROW pa.Table (n1, n2, ks_d_num, r1_doubled) of exact
    int64 ingredients: D = ks_d_num / (n1*n2) and
    U1 = (r1_doubled - 2*..)/2 are one division away and deliberately
    not materialized as floats (1-ulp float drift vs a SQL oracle —
    the geomean lesson).
    """
    counts = quantized_group_counts(ds, value_col, group_col, g1, g2,
                                    scale).materialize()

    tot = counts.sum(["sum(n1)", "sum(n2)"])
    n1_tot = int(tot["sum(sum(n1))"] or 0) if tot else 0
    n2_tot = int(tot["sum(sum(n2))"] or 0) if tot else 0
    if n1_tot == 0 and n2_tot == 0:
        return pa.table({"n1": pa.array([0], pa.int64()),
                         "n2": pa.array([0], pa.int64()),
                         "ks_d_num": pa.array([0], pa.int64()),
                         "r1_doubled": pa.array([0], pa.int64())})

    def block_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        # rows arrive q-sorted within the range-partitioned block
        n1 = pc.cast(t["sum(n1)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n2 = pc.cast(t["sum(n2)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        c1 = np.cumsum(n1)
        c2 = np.cumsum(n2)
        a = c1 * np.int64(n2_tot) - c2 * np.int64(n1_tot)
        cbefore = np.cumsum(n1 + n2) - (n1 + n2)  # local C, exclusive
        # 64k sub-chunks keep n1_v * 2C products honest in int64 even
        # for enormous blocks; cross-chunk C offsets are Python ints
        mwu = 0
        ch = 1 << 16
        for s in range(0, len(n1), ch):
            sl = slice(s, s + ch)
            rel = cbefore[sl] - cbefore[s]
            local = int(np.dot(n1[sl],
                               2 * rel + (n1[sl] + n2[sl]) + 1))
            mwu += local + 2 * int(cbefore[s]) * int(n1[sl].sum())
        return pa.table({
            "n1": pa.array([int(n1.sum())], pa.int64()),
            "n2": pa.array([int(n2.sum())], pa.int64()),
            "min_q": pa.array([int(q[0])], pa.int64()),
            "a_min": pa.array([str(int(a.min()))], pa.string()),
            "a_max": pa.array([str(int(a.max()))], pa.string()),
            "mwu_local": pa.array([str(mwu)], pa.string()),
        })

    parts_ds = counts.sort("q").map_batches(
        block_partial, batch_format="pyarrow", batch_size=None)
    parts = [b for b in parts_ds.iter_batches(batch_format="pyarrow",
                                              batch_size=None)
             if b.num_rows]
    parts = pa.concat_tables(parts) if parts \
        else _PARTIAL_SCHEMA.empty_table()
    parts = parts.sort_by([("min_q", "ascending")])

    ks_num = 0
    mwu_total = 0
    c1_pre = c2_pre = 0  # Python ints: no overflow across blocks
    for i in range(parts.num_rows):
        b_n1 = parts["n1"][i].as_py()
        b_n2 = parts["n2"][i].as_py()
        a_off = c1_pre * n2_tot - c2_pre * n1_tot
        ks_num = max(ks_num,
                     abs(a_off + int(parts["a_min"][i].as_py())),
                     abs(a_off + int(parts["a_max"][i].as_py())))
        mwu_total += int(parts["mwu_local"][i].as_py()) \
            + 2 * (c1_pre + c2_pre) * b_n1
        c1_pre += b_n1
        c2_pre += b_n2

    return pa.table({
        "n1": pa.array([n1_tot], pa.int64()),
        "n2": pa.array([n2_tot], pa.int64()),
        "ks_d_num": pa.array([ks_num], pa.int64()),
        "r1_doubled": pa.array([mwu_total], pa.int64()),
    })
