"""functions/layout.py: Morton interleave unit parity + the layout
payoff — a z-ordered file prunes row groups for predicates on BOTH
columns, a single-column sort only on one."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyschema_ray.functions.layout import (zorder_interleave,
                                           zorder_sql_expr)
from pyschema_ray.stages.audit import rowgroup_pruning_report


def _ref_interleave(x, y, bits=8):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_and_sql():
    import duckdb
    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, 500).astype(np.int64)
    y = rng.integers(0, 256, 500).astype(np.int64)
    z = zorder_interleave(x, y, 8)
    assert z.tolist() == [_ref_interleave(int(a), int(b))
                          for a, b in zip(x, y)]
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    expr = zorder_sql_expr("x", "y", 8)
    want = con.execute(f"SELECT ({expr}) FROM t").df().iloc[:, 0]
    assert z.tolist() == want.tolist()


def test_interleave_masks_high_bits():
    z = zorder_interleave(np.array([256 + 3]), np.array([512 + 5]), 8)
    assert z.tolist() == [_ref_interleave(3, 5)]


def test_zorder_layout_prunes_both_columns(tmp_path):
    # 2-D uniform grid; predicates are small squares in (x, y) space.
    # x-sorted layout: row groups span all y -> y-predicates prune 0.
    # z-sorted layout: row groups are z-contiguous tiles -> BOTH
    # columns' predicates prune most row groups.
    rng = np.random.default_rng(5)
    n = 8192
    x = rng.integers(0, 256, n).astype(np.int64)
    y = rng.integers(0, 256, n).astype(np.int64)
    z = zorder_interleave(x, y, 8)
    t = pa.table({"x": x, "y": y, "z": z})

    xs = t.sort_by([("x", "ascending")])
    zs = t.sort_by([("z", "ascending")])
    px, pz = tmp_path / "xsort.parquet", tmp_path / "zsort.parquet"
    pq.write_table(xs, px, row_group_size=512)
    pq.write_table(zs, pz, row_group_size=512)

    def prunable_frac(path, col, lo, hi):
        rep = rowgroup_pruning_report([str(path)], col, lo=lo, hi=hi) \
            .to_pandas()
        return rep["prunable"].mean()

    # narrow y-band predicate: x-sorted layout can prune nothing
    assert prunable_frac(px, "y", 100.0, 115.0) == 0.0
    # z-sorted layout prunes most row groups for BOTH axes
    assert prunable_frac(pz, "y", 100.0, 115.0) >= 0.5
    assert prunable_frac(pz, "x", 100.0, 115.0) >= 0.5
    # and stays competitive with the x-sort on x-predicates
    # (x-sort: 14/16 row groups prunable — two straddle the band)
    assert prunable_frac(px, "x", 100.0, 115.0) >= 0.8
