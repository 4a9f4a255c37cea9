"""Grouped analytics that avoid global sorts.

:func:`grouped_topk` — top-k rows per group WITHOUT sorting the whole
dataset: a per-batch partial top-k shrinks each block to <= k rows per
group seen in it, then groups co-locate on integer hash shards for the
final per-group head.  The shuffle carries at most k × groups × blocks
rows, never the corpus.  Ties break deterministically on the tiebreak
column so results are reproducible (and SQL-oracle-comparable against
a row_number() window)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _default_shards, _group_starts, _key_shards


def _arrow_group_head(t: pa.Table, group_col: str, order_col: str,
                      tiebreak_col: str, k: int,
                      descending: bool) -> pa.Table:
    """Per-group head-k of an Arrow table: one C++ sort_by, then a
    vectorized within-group rank over the contiguous group runs — no
    pandas round-trip in the hot path."""
    t = t.sort_by([
        (group_col, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (tiebreak_col, "ascending"),
    ])
    groups = t[group_col].to_numpy(zero_copy_only=False)
    starts, sizes = _group_starts(groups)
    rank = np.arange(len(groups)) - np.repeat(starts, sizes)
    return t.take(np.flatnonzero(rank < k))


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 tiebreak_col: str, descending: bool = True,
                 num_shards: int | None = None,
                 columns: list[str] | None = None):
    """-> Dataset of the top-``k`` rows per ``group_col`` value, ordered
    by ``order_col`` (desc by default), ties broken ascending on
    ``tiebreak_col``.  ``columns`` restricts the carried payload
    (default: group, order, tiebreak)."""
    num_shards = num_shards or _default_shards()
    keep = columns or [group_col, order_col, tiebreak_col]
    keep = list(dict.fromkeys([group_col, order_col, tiebreak_col] + keep))

    def partial(t: pa.Table) -> pa.Table:
        out = _arrow_group_head(t.select(keep), group_col, order_col,
                                tiebreak_col, k, descending)
        shard = _key_shards(out[group_col].to_numpy(zero_copy_only=False),
                            num_shards, 41)
        return out.append_column("gshard", pa.array(shard, pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        return _arrow_group_head(t, group_col, order_col, tiebreak_col,
                                 k, descending).drop_columns(["gshard"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(final, batch_format="pyarrow")
