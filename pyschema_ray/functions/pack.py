"""Sequence packing for LLM pretraining corpora.

Packs per-document token lists into fixed-length training sequences by
the standard concat-and-cut scheme: within each shard, documents are
concatenated (in deterministic key order) into one token stream that is
sliced into ``max_len`` windows, so utilization is 100% except the one
partial window per shard.  Per-window doc lineage (which doc_ids
contributed) is emitted for traceability.

Distribution shape: one integer-hash shard groupby (same pattern as the
dedup shuffles — bounded shard count, never a groupby on the raw key);
packing inside a shard is pure numpy (concatenate + searchsorted), no
per-token Python.  At 100 TB each shard's token stream must fit a
worker; size ``num_shards`` ≥ corpus_tokens × 4 bytes / worker_heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _default_shards, _key_shards


def pack_sequences(ds, tokens_col: str = "tokens", key_col: str = "doc_id",
                   max_len: int = 2048, num_shards: int | None = None,
                   pad_id: int | None = None):
    """-> Dataset(pack_id, tokens, n_tokens, n_docs, doc_ids).

    ``pack_id`` = "<shard>-<index>" (deterministic given the corpus).
    The final window of each shard is shorter than ``max_len`` unless
    ``pad_id`` is given, in which case it is right-padded to full
    length (n_tokens still reports the real token count).
    """
    import pandas as pd

    # cluster-proportional default; NOTE the memory rule in the module
    # docstring still applies — at extreme corpus/worker ratios pass
    # num_shards explicitly so each shard's token stream fits a worker
    num_shards = num_shards or _default_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.select([key_col, tokens_col]).append_column(
            "pshard", pa.array(_key_shards(keys, num_shards, 31), pa.int64()))

    def pack(df):
        df = df.sort_values(key_col, kind="stable")
        shard = int(df["pshard"].iloc[0])
        parts = [np.asarray(v, dtype=np.int64) if v is not None
                 else np.empty(0, np.int64) for v in df[tokens_col]]
        doc_lens = np.array([len(p) for p in parts], dtype=np.int64)
        stream = np.concatenate(parts) if parts else np.empty(0, np.int64)
        n = len(stream)
        if n == 0:
            # typed empty block — an untyped empty DataFrame would
            # infer null columns and fail unification with non-empty
            # shards' list<int64>/string blocks.  doc_ids element type
            # follows the corpus's actual key type (conversion only on
            # this rare branch, not the hot packing path).
            doc_keys = pa.Array.from_pandas(df[key_col])
            return pa.table({
                "pack_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int64())),
                "n_tokens": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.list_(doc_keys.type)),
            })
        doc_ends = np.cumsum(doc_lens)          # exclusive end per doc
        keys_np = df[key_col].to_numpy()
        starts = np.arange(0, n, max_len)
        out = {"pack_id": [], "tokens": [], "n_tokens": [], "n_docs": [],
               "doc_ids": []}
        for i, s in enumerate(starts):
            e = min(s + max_len, n)
            window = stream[s:e]
            real = e - s
            if pad_id is not None and real < max_len:
                window = np.concatenate(
                    [window, np.full(max_len - real, pad_id, np.int64)])
            # docs overlapping [s, e): first doc ending after s .. the
            # doc containing e-1
            d0 = int(np.searchsorted(doc_ends, s, side="right"))
            d1 = int(np.searchsorted(doc_ends, e - 1, side="right"))
            out["pack_id"].append(f"{shard}-{i}")
            out["tokens"].append(window)
            out["n_tokens"].append(real)
            out["n_docs"].append(d1 - d0 + 1)
            # .tolist(): numpy unicode arrays (string keys) are not
            # Arrow-convertible as object cells
            out["doc_ids"].append(keys_np[d0:d1 + 1].tolist())
        return pd.DataFrame(out)

    return ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(pack, batch_format="pandas")
