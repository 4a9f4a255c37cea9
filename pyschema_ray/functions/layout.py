"""Multi-column data layout: Morton (z-order) interleaving.

A corpus sorted on ONE column gives razor-sharp row-group min/max
stats on that column and useless ones on every other; interleaving
the bits of two columns (z = x0 y0 x1 y1 ...) before the layout sort
spreads locality across BOTH, so footer-stats pruning
(stages/audit.py::rowgroup_pruning_report) works for predicates on
either column.  The interleave is a handful of vectorized shift/mask
ops per batch — zero exchanges; the layout itself is one Ray sort on
the computed key.

The bit formula is elementary integer arithmetic, so a SQL oracle
reproduces it term-by-term (`__ray_entry__` generates the expression
from the same ``bits`` constant) — bit-exact cross-engine parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def zorder_interleave(x: np.ndarray, y: np.ndarray,
                      bits: int = 8) -> np.ndarray:
    """Morton-interleave the low ``bits`` of x (even positions) and y
    (odd positions) -> int64.  Values are masked to ``bits`` first
    (callers bucket wider domains down before interleaving)."""
    xm = np.asarray(x, np.int64) & np.int64((1 << bits) - 1)
    ym = np.asarray(y, np.int64) & np.int64((1 << bits) - 1)
    z = np.zeros(len(xm), np.int64)
    for i in range(bits):
        z |= ((xm >> np.int64(i)) & np.int64(1)) << np.int64(2 * i)
        z |= ((ym >> np.int64(i)) & np.int64(1)) << np.int64(2 * i + 1)
    return z


def zorder_sql_expr(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The DuckDB expression computing :func:`zorder_interleave`
    term-by-term — generated from the same constant so engine and
    oracle can never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def add_zorder_key(ds, x_col: str, y_col: str, bits: int = 8,
                   out_col: str = "zkey"):
    """Append the Morton key column (null on rows where either input
    is null — those sort last and keep their stats out of the
    interleave's contract)."""
    def f(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col])) \
            .to_numpy(zero_copy_only=False)
        x = np.asarray(pc.fill_null(pc.cast(t[x_col], pa.int64()), 0)
                       .to_numpy(zero_copy_only=False))
        y = np.asarray(pc.fill_null(pc.cast(t[y_col], pa.int64()), 0)
                       .to_numpy(zero_copy_only=False))
        z = zorder_interleave(x, y, bits)
        return t.append_column(out_col, pa.array(
            np.ma.masked_array(z, mask=~valid), pa.int64(),
            from_pandas=True))
    return ds.map_batches(f, batch_format="pyarrow")
