"""Grouped analytics that avoid global sorts.

:func:`grouped_topk` — top-k rows per group WITHOUT sorting the whole
dataset: a per-batch partial top-k shrinks each block to <= k rows per
group seen in it, then groups co-locate on integer hash shards for the
final per-group head.  The shuffle carries at most k × groups × blocks
rows, never the corpus.  Ties break deterministically on the tiebreak
column so results are reproducible (and SQL-oracle-comparable against
a row_number() window)."""

from __future__ import annotations

import pyarrow as pa

from .dedup import _key_shards


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 tiebreak_col: str, descending: bool = True,
                 num_shards: int = 64, columns: list[str] | None = None):
    """-> Dataset of the top-``k`` rows per ``group_col`` value, ordered
    by ``order_col`` (desc by default), ties broken ascending on
    ``tiebreak_col``.  ``columns`` restricts the carried payload
    (default: group, order, tiebreak)."""
    import pandas as pd

    keep = columns or [group_col, order_col, tiebreak_col]
    keep = list(dict.fromkeys([group_col, order_col, tiebreak_col] + keep))

    def head(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, not descending, True], kind="stable") \
            .groupby(group_col, sort=False).head(k)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keep).to_pandas()
        out = head(df)
        out["gshard"] = _key_shards(out[group_col].to_numpy(),
                                    num_shards, 41)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        return head(df).drop(columns=["gshard"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(final, batch_format="pandas")
