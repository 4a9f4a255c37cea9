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


def _list_array(values, elem_type: pa.DataType) -> pa.ListArray:
    """list<elem_type> array from a python list of sequences — one
    concatenate + one offsets array, no per-cell Arrow conversion."""
    offsets = np.zeros(len(values) + 1, np.int64)
    np.cumsum([len(v) for v in values], out=offsets[1:])
    if elem_type == pa.int64():
        flat = np.concatenate([np.asarray(v, np.int64) for v in values]) \
            if values else np.empty(0, np.int64)
        flat_arr = pa.array(flat, pa.int64())
    else:
        flat_arr = pa.array([x for v in values for x in v], elem_type)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    flat_arr)


def _pack_table(out: dict, key_type: pa.DataType, **extra) -> pa.Table:
    """Pack-window rows as an Arrow table with pinned schema (the
    sketches.pa_key_type rule: pandas/Arrow-mixed or value-inferred
    block schemas out of an exchange are the round-4 failure mode).
    ``extra`` maps column -> (values, type); list types assemble via
    :func:`_list_array`."""
    cols = {
        "pack_id": pa.array(out["pack_id"], pa.string()),
        "tokens": _list_array(out["tokens"], pa.int64()),
        "n_tokens": pa.array(
            np.asarray(out["n_tokens"], np.int64), pa.int64()),
        "n_docs": pa.array(np.asarray(out["n_docs"], np.int64),
                           pa.int64()),
        "doc_ids": _list_array(out["doc_ids"], key_type),
    }
    for name, (vals, typ) in extra.items():
        cols[name] = _list_array(vals, typ.value_type) \
            if pa.types.is_list(typ) else pa.array(vals, typ)
    return pa.table(cols)


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
        from ..sketches import pa_key_type
        kt = pa_key_type(df[key_col])
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
            # shards' list<int64>/string blocks.
            return pa.table({
                "pack_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int64())),
                "n_tokens": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.list_(kt)),
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
        return _pack_table(out, kt)

    return ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(pack, batch_format="pandas")


def pack_sequences_stitched(ds, tokens_col: str = "tokens",
                            key_col: str = "doc_id", max_len: int = 2048,
                            num_shards: int | None = None,
                            pad_id: int | None = None,
                            stitch_shards: int = 8):
    """Memory-bounded packing with remainder stitching — the hot-shard
    guard for :func:`pack_sequences`.

    With plain packing, bounding per-task memory means raising
    ``num_shards`` (each shard's token stream must fit a worker), and
    every shard then leaves one partial window — waste grows with the
    shard count.  Here each shard emits only FULL ``max_len`` windows
    plus ONE remainder row (its tail tokens + exact doc lineage); the
    remainders (< max_len tokens each — tiny) ride a second exchange
    where they concatenate in deterministic shard order and pack
    again.  Waste drops to at most one partial window per
    ``stitch_shards`` regardless of ``num_shards``, and the
    token-conservation invariant (sum of n_tokens == corpus tokens)
    holds exactly.

    Output schema matches :func:`pack_sequences`; full windows get
    pack_id "s<shard>-<i>", stitched ones "r<stitch_shard>-<i>".
    """
    import pandas as pd

    num_shards = num_shards or _default_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.select([key_col, tokens_col]).append_column(
            "pshard", pa.array(_key_shards(keys, num_shards, 31), pa.int64()))

    def pack_full(df):
        from ..sketches import pa_key_type
        kt = pa_key_type(df[key_col])
        df = df.sort_values(key_col, kind="stable")
        shard = int(df["pshard"].iloc[0])
        parts = [np.asarray(v, dtype=np.int64) if v is not None
                 else np.empty(0, np.int64) for v in df[tokens_col]]
        doc_lens = np.array([len(p) for p in parts], dtype=np.int64)
        stream = np.concatenate(parts) if parts else np.empty(0, np.int64)
        n = len(stream)
        keys_np = df[key_col].to_numpy()
        doc_ends = np.cumsum(doc_lens)
        out = {"pack_id": [], "tokens": [], "n_tokens": [], "n_docs": [],
               "doc_ids": [], "is_rem": [], "rshard": []}

        def emit(pid, window, real, d0, d1, ends_local, is_rem, rsh):
            out["pack_id"].append(pid)
            out["tokens"].append(window)
            out["n_tokens"].append(real)
            out["n_docs"].append(d1 - d0 + 1)
            out["doc_ids"].append(keys_np[d0:d1 + 1].tolist())
            out["is_rem"].append(is_rem)
            out["rshard"].append(rsh)
            # ends_local rides in doc_ids-parallel form only for
            # remainders; full windows leave it empty
            out.setdefault("doc_ends_local", []).append(ends_local)

        n_full = n // max_len
        for i in range(n_full):
            s, e = i * max_len, (i + 1) * max_len
            d0 = int(np.searchsorted(doc_ends, s, side="right"))
            d1 = int(np.searchsorted(doc_ends, e - 1, side="right"))
            emit(f"s{shard}-{i}", stream[s:e], max_len, d0, d1, [],
                 np.int8(0), np.int64(-1))
        if n % max_len:
            s = n_full * max_len
            d0 = int(np.searchsorted(doc_ends, s, side="right"))
            d1 = len(doc_lens) - 1
            ends_local = (doc_ends[d0:d1 + 1] - s).clip(0, n - s).tolist()
            emit(f"tail{shard}", stream[s:], n - s, d0, d1, ends_local,
                 np.int8(1), np.int64(shard % stitch_shards))
        return _pack_table(
            out, kt,
            is_rem=(np.asarray(out["is_rem"], np.int8), pa.int8()),
            rshard=(np.asarray(out["rshard"], np.int64), pa.int64()),
            doc_ends_local=(out.get("doc_ends_local", []),
                            pa.list_(pa.int64())))

    staged = ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(pack_full, batch_format="pandas") \
        .materialize()  # two consumers below; blocks stay distributed

    strip = ["is_rem", "rshard", "doc_ends_local"]
    key_type = None
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name == key_col:
            key_type = typ
    if key_type is None:
        raise ValueError(f"{key_col!r} not in dataset schema")

    def fulls(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["is_rem"], 0)).drop_columns(strip)

    def stitch(df):
        # deterministic order: by originating shard (encoded in pack_id
        # "tail<shard>")
        df = df.assign(_s=df["pack_id"].str.slice(4).astype(np.int64)) \
            .sort_values("_s", kind="stable")
        streams = [np.asarray(v, np.int64) for v in df["tokens"]]
        stream = np.concatenate(streams) if streams \
            else np.empty(0, np.int64)
        rsh = int(df["rshard"].iloc[0])
        # rebuild global doc boundaries from each remainder's local ends
        ends, ids, base = [], [], 0
        for ends_local, doc_ids, ln in zip(df["doc_ends_local"],
                                           df["doc_ids"],
                                           (len(s) for s in streams)):
            el = np.asarray(ends_local, np.int64)
            ends.append(base + el)
            ids.extend(list(doc_ids))
            base += ln
        doc_ends = np.concatenate(ends) if ends else np.empty(0, np.int64)
        keys_np = np.asarray(ids, dtype=object)
        n = len(stream)
        out = {"pack_id": [], "tokens": [], "n_tokens": [], "n_docs": [],
               "doc_ids": []}
        starts = np.arange(0, n, max_len)
        for i, s in enumerate(starts):
            e = min(s + max_len, n)
            window = stream[s:e]
            real = e - s
            if pad_id is not None and real < max_len:
                window = np.concatenate(
                    [window, np.full(max_len - real, pad_id, np.int64)])
            d0 = int(np.searchsorted(doc_ends, s, side="right"))
            d1 = int(np.searchsorted(doc_ends, e - 1, side="right"))
            d1 = min(d1, len(keys_np) - 1)
            out["pack_id"].append(f"r{rsh}-{i}")
            out["tokens"].append(window)
            out["n_tokens"].append(real)
            out["n_docs"].append(d1 - d0 + 1)
            out["doc_ids"].append(list(keys_np[d0:d1 + 1]))
        return _pack_table(out, key_type)

    def rems_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["is_rem"], 1))

    rems = staged.map_batches(rems_only, batch_format="pyarrow") \
        .groupby("rshard").map_groups(stitch, batch_format="pandas")
    return staged.map_batches(fulls, batch_format="pyarrow").union(rems)
