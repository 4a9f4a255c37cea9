"""Deduplication operators for training corpora, Ray-Data-first:

* exact dedup        — content-hash -> groupby -> keep min key
* MinHash + LSH      — shingle -> k minhashes -> banded buckets ->
                       bucket groupby -> candidate pairs
* SimHash            — 64-bit near-dup signature + multi-index pairs
* Jaccard verify     — distributed (shuffle semi-join routes texts to
                       pair shards) or table-based for small sides
* connected components — distributed min-label propagation over the
                       verified-pair Dataset (no driver union-find)
* composed keep-list — :func:`dedup_keep_keys_ds`: every stage is a
                       sharded Dataset op; the driver holds no key
                       list, pair list, or text

The heavy stages are ``map_batches`` with numpy-vectorized inner
kernels (per-doc reductions via ``reduceat`` over offset arrays,
triangular-index pair emission — no per-token or per-pair Python in
hot groups); the only shuffles are groupbys on small integer
hash-shard keys, which are uniform by construction.  The reference has
no dedup — these are north-prompt extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import (default_exchange_shards as _default_shards,
                        hash_strings, hash_strings2, mix64)

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — numpy has no bit_count."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
        x = (x & np.uint64(0x3333333333333333)) \
            + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return x.astype(np.int64)


def _key_hash(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of arbitrary key values (string or
    integer)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return mix64(arr.astype(np.int64).view(np.uint64), seed)
    return mix64(hash_strings(arr), seed)


def _key_shards(values, num_shards: int, seed: int = 0) -> np.ndarray:
    """Deterministic int64 shard id for arbitrary key values — the
    small groupby key that co-locates full hash groups on a bounded
    number of shards instead of shuffling a near-unique raw key."""
    return (_key_hash(values, seed) % np.uint64(num_shards)).astype(np.int64)


from ..sketches import pa_key_type as _pa_key_type  # noqa: E402


def _pairs_table(ka, kb, key_type: pa.DataType, **extra) -> pa.Table:
    """(key_a, key_b[, extras]) as an Arrow table with a PINNED key
    type.  Every pair emitter returns Arrow — never pandas — so a
    stage's data blocks and Ray's empty-input passthrough blocks
    (which skip the UDF and keep the upstream Arrow type) are the SAME
    block type with the SAME schema; a stream that mixes pandas and
    Arrow blocks trips ``TableBlockBuilder.add_block``'s type check in
    any downstream batcher/sort, which was the round-4 driver failure
    mode for the dup-pair queries.  ``extra`` maps column name ->
    ``(values, pa.DataType)``."""
    cols = {"key_a": pa.array(ka, type=key_type, from_pandas=True),
            "key_b": pa.array(kb, type=key_type, from_pandas=True)}
    for name, (vals, typ) in extra.items():
        cols[name] = pa.array(vals, type=typ, from_pandas=True)
    return pa.table(cols)


def _group_starts(*cols) -> tuple[np.ndarray, np.ndarray]:
    """(starts, sizes) of equal-value runs over pre-sorted parallel
    arrays (the group boundaries of a sorted grouping)."""
    n = len(cols[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for c in cols:
        a = np.asarray(c)
        new[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    return starts, sizes


def _triu_pairs(starts: np.ndarray, sizes: np.ndarray):
    """All within-group index pairs (i < j) for variable-size sorted
    groups — the vectorized replacement for a nested Python pair loop.
    Returns (left_idx, right_idx) into the underlying sorted arrays."""
    ia, ib = [], []
    for s, m in zip(starts, sizes):
        if m >= 2:
            i, j = np.triu_indices(int(m), 1)
            ia.append(i + s)
            ib.append(j + s)
    if not ia:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ia), np.concatenate(ib)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_keys(ds, text_col: str = "text", key_col: str = "doc_id",
                     num_shards: int | None = None,
                     _hash_fns=(hash_strings, hash_strings2)):
    """-> Dataset(key_col) of the kept (minimum-key) row per distinct
    content.  Shuffle moves only (hash128, key, shard) — never text —
    and the groupby key is a small integer shard, not the near-unique
    hash itself (a sort-based exchange on 10^12 distinct hashes is the
    pattern stages/unique.py exists to avoid); identical hashes always
    co-shard, and the per-shard min is a C++ Arrow group_by.

    Content identity is a 128-bit hash (two independently-keyed
    SipHashes): 64 bits alone would produce ~27k silent false merges at
    10^12 docs (birthday bound), each deleting a non-duplicate.
    ``_hash_fns`` is a test seam for collision injection."""
    num_shards = num_shards or _default_shards()
    hf1, hf2 = _hash_fns

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        h = hf1(texts)
        h2 = hf2(texts)
        # int64 view (not uint64): Ray's shuffle materializes group keys
        # through Python ints, where uint64 > 2^63 overflows
        return pa.table({
            "content_hash": pa.array(h.view(np.int64), pa.int64()),
            "content_hash2": pa.array(h2.view(np.int64), pa.int64()),
            key_col: t[key_col],
            "cshard": pa.array((h % np.uint64(num_shards))
                               .astype(np.int64), pa.int64()),
        })

    def local_min(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_hash", "content_hash2"]).aggregate(
            [(key_col, "min")])
        return g.select([f"{key_col}_min"]).rename_columns([key_col])

    return ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("cshard").map_groups(local_min, batch_format="pyarrow")


def exact_dedup_best_keys(ds, text_col: str = "text",
                          key_col: str = "doc_id",
                          score_col: str = "n_chars",
                          num_shards: int | None = None):
    """Quality-aware exact dedup: -> Dataset(key_col, score_col) of
    the BEST-scoring row per distinct content (max ``score_col``, ties
    to the minimum key) — the keep policy a curation pipeline wants
    when duplicates differ in metadata quality.  Same shuffle shape as
    :func:`exact_dedup_keys` (128-bit content identity, integer-shard
    exchange carrying only (hash128, key, score), never text); the
    per-shard argmax is one Arrow sort + run-boundary take for ALL
    groups at once."""
    num_shards = num_shards or _default_shards()

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        h = hash_strings(texts)
        h2 = hash_strings2(texts)
        return pa.table({
            "content_hash": pa.array(h.view(np.int64), pa.int64()),
            "content_hash2": pa.array(h2.view(np.int64), pa.int64()),
            key_col: t[key_col],
            score_col: t[score_col],
            "cshard": pa.array((h % np.uint64(num_shards))
                               .astype(np.int64), pa.int64()),
        })

    def local_best(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("content_hash", "ascending"),
            ("content_hash2", "ascending"),
            (score_col, "descending"), (key_col, "ascending")])
        t = t.take(idx)
        starts, _ = _group_starts(
            t["content_hash"].to_numpy(zero_copy_only=False),
            t["content_hash2"].to_numpy(zero_copy_only=False))
        return t.take(pa.array(starts, pa.int64())) \
            .select([key_col, score_col])

    return ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("cshard").map_groups(local_best, batch_format="pyarrow")


def exact_duplicate_groups(ds, text_col: str = "text",
                           key_col: str = "doc_id",
                           num_shards: int | None = None):
    """-> Dataset(content_hash, dup_count) for content appearing >1
    time.  Same integer-shard shuffle as :func:`exact_dedup_keys`, and
    the same 128-bit content identity (dup groups are keyed on both
    hashes; the emitted content_hash column is the first)."""
    num_shards = num_shards or _default_shards()

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        h = hash_strings(texts)
        h2 = hash_strings2(texts)
        return pa.table({
            "content_hash": pa.array(h.view(np.int64), pa.int64()),
            "content_hash2": pa.array(h2.view(np.int64), pa.int64()),
            "cshard": pa.array((h % np.uint64(num_shards))
                               .astype(np.int64), pa.int64()),
        })

    def local_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_hash", "content_hash2"]).aggregate(
            [("content_hash", "count")])
        g = g.select(["content_hash", "content_hash_count"]) \
             .rename_columns(["content_hash", "dup_count"])
        return g.filter(pc.greater(g["dup_count"], 1))

    return ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("cshard").map_groups(local_counts, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _word_shingles(texts: list[str | None], k: int):
    """All k-word shingles of each text; returns (flat list of shingle
    strings, per-doc offsets).  The string assembly is a Python
    comprehension (strings force it); everything downstream is numpy."""
    flat: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, s in enumerate(texts):
        if s:
            w = s.lower().split()
            if len(w) >= k:
                flat.extend(" ".join(w[j:j + k]) for j in range(len(w) - k + 1))
            elif w:
                flat.append(" ".join(w))
        offsets[i + 1] = len(flat)
    return flat, offsets


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(c)`` per count — the repeat/arange trick
    for building per-group position indices without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


_SHINGLE_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _shingle_hashes(texts, k: int, return_word_lengths: bool = False):
    """(flat uint64 k-word-shingle hashes, per-doc int64 offsets) with
    NO per-shingle string assembly: ONE Arrow lowercase+split over the
    batch, ONE SipHash pass over the flat word array, then each
    shingle hash is a vectorized polynomial combination of its k word
    hashes (k tiny strided passes) finished with a mix64.

    Shingle DEFINITION matches :func:`_word_shingles` — lowercased
    whitespace words; a doc with 1..k-1 words contributes ONE
    whole-text shingle; empty/null docs contribute none — but identity
    is by 64-bit hash instead of string (2^-64 per-pair collision,
    which every consumer here already tolerates).  Replaces the
    ``" ".join(w[j:j+k])`` string loop that dominated the MinHash
    chain's CPU."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    split = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(arr, "")))
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offs = np.asarray(split.offsets, dtype=np.int64)
    flat = split.values.slice(offs[0], offs[-1] - offs[0])
    offs = offs - offs[0]
    words = flat.to_numpy(zero_copy_only=False)
    # whitespace split emits "" at leading/trailing runs — drop while
    # keeping offsets consistent (tokenize_hash_batch trick)
    mask = words != ""
    csum = np.zeros(len(words) + 1, np.int64)
    np.cumsum(mask, out=csum[1:])
    offs = csum[offs]
    wh = hash_strings(words[mask]) if mask.any() \
        else np.empty(0, np.uint64)
    n_docs = len(arr)
    wl = np.diff(offs)
    full = wl >= k
    npos = np.where(full, wl - k + 1, 0).astype(np.int64)
    short = (wl > 0) & ~full
    out_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(npos + short.astype(np.int64), out=out_offsets[1:])
    out = np.zeros(int(out_offsets[-1]), np.uint64)
    starts = offs[:-1]
    with np.errstate(over="ignore"):
        if full.any():
            pos = np.repeat(starts[full], npos[full]) + _ranges(npos[full])
            dst = np.repeat(out_offsets[:-1][full], npos[full]) \
                + _ranges(npos[full])
            acc = np.zeros(len(pos), np.uint64)
            for i in range(k):
                acc = acc * _SHINGLE_P + wh[pos + i]
            out[dst] = acc
        for L in range(1, k):  # short docs, one pass per length < k
            sel = short & (wl == L)
            if not sel.any():
                continue
            sb = starts[sel]
            acc = np.zeros(int(sel.sum()), np.uint64)
            for i in range(L):
                acc = acc * _SHINGLE_P + wh[sb + i]
            out[out_offsets[:-1][sel]] = acc
    if return_word_lengths:
        return mix64(out, 7), out_offsets, wl
    return mix64(out, 7), out_offsets


class MinHasher:
    """Actor-pool stage producing k-permutation MinHash signatures.

    ``__init__`` fixes (k, shingle width, seeds) once per actor;
    ``__call__`` computes, per batch: vectorized shingle hashes
    (:func:`_shingle_hashes` — no per-shingle string assembly) ->
    per-seed splitmix rehash -> per-doc min via
    ``np.minimum.reduceat``.  Output adds ``minhash`` as a
    fixed-size-list<uint64> column."""

    def __init__(self, text_col: str = "text", num_hashes: int = 64,
                 shingle_words: int = 3, out_col: str = "minhash"):
        self.text_col = text_col
        self.k = num_hashes
        self.w = shingle_words
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        base, offsets = _shingle_hashes(t[self.text_col], self.w)
        n = t.num_rows
        sig = np.full((n, self.k), U64_MAX, dtype=np.uint64)
        if len(base):
            nonempty = np.diff(offsets) > 0
            starts = offsets[:-1][nonempty]
            for s in range(self.k):
                h = mix64(base, s)
                mins = np.minimum.reduceat(h, starts)
                sig[nonempty, s] = mins
        flat_sig = pa.array(sig.reshape(-1), pa.uint64())
        col = pa.FixedSizeListArray.from_arrays(flat_sig, self.k)
        out = t.append_column(self.out_col, col)
        # flag docs with no shingles (empty/null text): they all share
        # the identical all-max signature and would otherwise co-bucket
        # into one giant O(m^2) candidate group
        has = np.zeros(n, dtype=bool)
        has[np.diff(offsets) > 0] = True
        return out.append_column(f"{self.out_col}_empty",
                                 pa.array(~has, pa.bool_()))


def lsh_band_buckets(t: pa.Table, minhash_col: str = "minhash",
                     key_col: str = "doc_id", bands: int = 16) -> pa.Table:
    """Explode each signature into ``bands`` (band, bucket) rows:
    bucket = hash of the band's signature slice.  Output
    (band: int32, bucket: uint64, key) — the groupby key for candidate
    generation."""
    sigs = t[minhash_col]
    if isinstance(sigs, pa.ChunkedArray):
        sigs = sigs.combine_chunks()
    k = sigs.type.list_size
    rows_per_band = k // bands
    n = len(sigs)
    mat = np.asarray(sigs.values.to_numpy(zero_copy_only=False),
                     dtype=np.uint64).reshape(n, k)
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_key = np.tile(np.asarray(t[key_col].to_numpy(zero_copy_only=False)),
                      bands)
    buckets = np.empty(bands * n, dtype=np.uint64)
    for b in range(bands):
        sl = mat[:, b * rows_per_band:(b + 1) * rows_per_band]
        acc = np.full(n, np.uint64(b + 0x51_7C_C1), dtype=np.uint64)
        for c in range(sl.shape[1]):  # tiny loop over rows-per-band
            acc = mix64(acc ^ sl[:, c], b)
        buckets[b * n:(b + 1) * n] = acc
    return pa.table({
        "band": pa.array(out_band, pa.int32()),
        "bucket": pa.array(buckets, pa.uint64()),
        key_col: pa.array(out_key),
    })


def minhash_lsh_candidates(ds, text_col: str = "text",
                           key_col: str = "doc_id", num_hashes: int = 64,
                           shingle_words: int = 3, bands: int = 16,
                           concurrency=None, num_shards: int | None = None):
    """-> Dataset(key_a, key_b) of candidate near-duplicate pairs
    (co-bucketed in >=1 band, deduplicated).  Pipeline:
    map_batches(MinHasher) -> band explode -> groupby bucket ->
    per-group pair emission -> distinct.

    ``concurrency=None`` (default) runs the hasher as a task closure —
    MinHasher holds only parameters, so actor pools would pay slow
    ramp-up for nothing; pass a concurrency tuple to force an actor
    pool anyway."""
    kwargs = dict(text_col=text_col, num_hashes=num_hashes,
                  shingle_words=shingle_words)
    if concurrency is None:
        sigs = ds.map_batches(MinHasher(**kwargs), batch_format="pyarrow")
    else:
        sigs = ds.map_batches(
            MinHasher, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", concurrency=concurrency)
    sigs = sigs.map_batches(
        lambda t: t.filter(pc.invert(t["minhash_empty"])),
        batch_format="pyarrow")
    buckets = sigs.map_batches(
        lambda t: lsh_band_buckets(t, key_col=key_col, bands=bands),
        batch_format="pyarrow")

    # shuffle on a SMALL mod-bucket (co-locating whole (band, bucket)
    # groups), never on the raw (band, bucket) pair: a groupby with one
    # tiny group per bucket is pathological in any engine at scale.
    # Cluster-proportional by default: each map_groups call holds 1/nb
    # of the exploded (bands x N) bucket rows, so nb must grow with
    # both cluster width and corpus size.
    nb = num_shards or _default_shards()

    def add_mod(t: pa.Table) -> pa.Table:
        m = mix64(np.asarray(t["bucket"].to_numpy(zero_copy_only=False),
                             dtype=np.uint64),
                  7) % np.uint64(nb)
        return t.append_column("shard", pa.array(m.astype(np.int64)))

    def emit_pairs(df):
        kt = _pa_key_type(df[key_col])
        dup = df[df.duplicated(["band", "bucket"], keep=False)]
        if dup.empty:
            return _pairs_table([], [], kt)
        # sort by (group, key) so within-group pairs come out ordered
        # (key_a < key_b); pair emission is a vectorized triangular
        # cross-join per group, not a nested Python loop
        dup = dup.sort_values(["band", "bucket", key_col], kind="stable")
        starts, sizes = _group_starts(dup["band"].to_numpy(),
                                      dup["bucket"].to_numpy())
        ia, ib = _triu_pairs(starts, sizes)
        keys = dup[key_col].to_numpy()
        return _pairs_table(keys[ia], keys[ib], kt)

    pairs = buckets.map_batches(add_mod, batch_format="pyarrow") \
        .groupby("shard").map_groups(emit_pairs, batch_format="pandas")
    # same pair can surface from several bands -> distinct.  Dedup on a
    # small integer pair-shard (local drop_duplicates per shard), not a
    # near-unique (key_a, key_b) string groupby.
    return distinct_pairs(pairs, num_shards=nb)


def distinct_pairs(pairs, num_shards: int | None = None,
                   min_col: str | None = None):
    """Distributed DISTINCT over a (key_a, key_b) pair Dataset: shard by
    pair hash (a bounded integer shuffle — cluster-proportional by
    default — never a sort-shuffle on the near-unique composite string
    key), drop duplicates locally per shard.  With ``min_col``, keeps
    the minimum of that column per pair (e.g. the best Hamming
    distance) instead of an arbitrary row."""
    num_shards = num_shards or _default_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("pshard", pa.array([], pa.int64()))
        ha = _key_hash(t["key_a"].to_numpy(zero_copy_only=False), 3)
        hb = _key_hash(t["key_b"].to_numpy(zero_copy_only=False), 4)
        shard = ((ha ^ hb) % np.uint64(num_shards)).astype(np.int64)
        return t.append_column("pshard", pa.array(shard, pa.int64()))

    def local_distinct(df):
        if min_col is not None:
            df = df.sort_values(min_col, kind="stable")
        df = df.drop_duplicates(["key_a", "key_b"]) \
               .drop(columns=["pshard"])
        kt = _pa_key_type(df["key_a"])
        extra = {} if min_col is None else \
            {min_col: (df[min_col].to_numpy(),
                       pa.from_numpy_dtype(df[min_col].dtype))}
        return _pairs_table(df["key_a"].to_numpy(),
                            df["key_b"].to_numpy(), kt, **extra)

    return pairs.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(local_distinct, batch_format="pandas")


def jaccard_verify_pairs(pairs_table: pa.Table, docs_table: pa.Table,
                         text_col: str = "text", key_col: str = "doc_id",
                         shingle_words: int = 3,
                         threshold: float = 0.7) -> pa.Table:
    """Exact n-gram Jaccard over candidate pairs (small side — runs on
    whatever slice of docs covers the candidates; broadcast-sized).
    Returns (key_a, key_b, jaccard) for pairs >= threshold."""
    texts = dict(zip(docs_table[key_col].to_pylist(),
                     docs_table[text_col].to_pylist()))

    def shingle_set(s):
        w = (s or "").lower().split()
        if len(w) < shingle_words:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i:i + shingle_words])
                for i in range(len(w) - shingle_words + 1)}

    cache: dict = {}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs_table["key_a"].to_pylist(),
                    pairs_table["key_b"].to_pylist()):
        sa = cache.setdefault(a, shingle_set(texts.get(a)))
        sb = cache.setdefault(b, shingle_set(texts.get(b)))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table({"key_a": pa.array(out_a), "key_b": pa.array(out_b),
                     "jaccard": pa.array(out_j, pa.float64())})


# ---------------------------------------------------------------------------
# distributed verification + connected components + composed pipeline
# ---------------------------------------------------------------------------

def _route_pair_payloads(pairs, docs, key_col, doc_payload, req_payload,
                         num_shards, seeds, doc_transform=None,
                         payload_type: pa.DataType | None = None):
    """Shared shuffle-semi-join core for pair verification: each pair
    emits two payload requests (one per side) sharded by key hash; the
    docs Dataset ships (key, payload) through the same shuffle (the
    corpus-side payload moves ONCE — the unavoidable cost when the
    candidate key set is too large to broadcast); per key-shard the
    payloads attach to requests, which re-shard by pair hash so both
    sides of every pair meet on one shard.

    ``doc_payload(table) -> pa.Array`` builds the per-doc payload
    column; ``req_payload(n) -> pa.Array`` builds the request-side
    placeholder (must be NON-NULL for integer payloads — a null int
    column coerces to float64 through the pandas map_groups and
    corrupts values above 2^53).  ``doc_transform(list) -> list``, if
    given, rewrites the payloads of REQUESTED docs only, once per
    unique doc per key-shard (e.g. text -> packed shingle hashes) —
    expensive derivations must go here, not in ``doc_payload``, or
    they run for every corpus doc instead of only the candidate-pair
    docs.  Returns a Dataset with columns (pshard, key_a, key_b, side,
    payload); requests whose key has no doc row are dropped (their
    pair cannot verify).
    """
    import pandas as pd

    s_key, s_a, s_b = seeds

    def requests(t: pa.Table) -> pa.Table:
        def side(which: int, key_chunked) -> pa.Table:
            keys = key_chunked.combine_chunks() \
                if isinstance(key_chunked, pa.ChunkedArray) else key_chunked
            n = len(keys)
            return pa.table({
                "kshard": pa.array(_key_shards(
                    keys.to_numpy(zero_copy_only=False), num_shards, s_key),
                    pa.int64()),
                "key": keys,
                "key_a": t["key_a"],
                "key_b": t["key_b"],
                "side": pa.array(np.full(n, which, np.int8), pa.int8()),
                "payload": req_payload(n),
            })
        return pa.concat_tables([side(0, t["key_a"]), side(1, t["key_b"])])

    def doc_rows(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        n = t.num_rows
        # side = -1 marks a doc row; key_a/key_b are self placeholders,
        # NOT nulls — a null int64 column would coerce to float64 in
        # the pandas map_groups and corrupt large keys
        return pa.table({
            "kshard": pa.array(_key_shards(
                keys.to_numpy(zero_copy_only=False), num_shards, s_key),
                pa.int64()),
            "key": keys,
            "key_a": keys,
            "key_b": keys,
            "side": pa.array(np.full(n, -1, np.int8), pa.int8()),
            "payload": doc_payload(t),
        })

    union = pairs.map_batches(requests, batch_format="pyarrow").union(
        docs.map_batches(doc_rows, batch_format="pyarrow"))

    def attach(df):
        doc_mask = df["side"].to_numpy() == -1
        payload = df.loc[doc_mask].drop_duplicates("key") \
                    .set_index("key")["payload"]
        req = df.loc[~doc_mask]
        if len(req):
            # filter-then-.loc keeps the payload dtype (a .map with
            # missing keys would detour through NaN/float64)
            req = req.loc[req["key"].isin(payload.index)]
        if doc_transform is not None:
            # derive only for docs some pair actually requested
            payload = payload.loc[payload.index.isin(req["key"])] \
                if len(req) else payload.iloc[:0]
            if len(payload):
                payload = pd.Series(doc_transform(payload.tolist()),
                                    index=payload.index, dtype=object)
        p = payload.loc[req["key"]].to_numpy() if len(req) \
            else payload.to_numpy()[:0]
        ka = req["key_a"].to_numpy()
        kb = req["key_b"].to_numpy()
        shard = ((_key_hash(ka, s_a) ^ _key_hash(kb, s_b))
                 % np.uint64(num_shards)).astype(np.int64) \
            if len(req) else np.empty(0, np.int64)
        kt = _np_key_type(ka) if len(ka) else _pa_key_type(df["key"])
        # payload type is pinned by the caller: mixed pandas/Arrow (or
        # object-dtype-inferred) blocks out of this exchange were the
        # round-4 driver failure mode
        ptype = payload_type if payload_type is not None else pa.string()
        return pa.table({
            "pshard": pa.array(shard, pa.int64()),
            "key_a": pa.array(ka, type=kt, from_pandas=True),
            "key_b": pa.array(kb, type=kt, from_pandas=True),
            "side": pa.array(req["side"].to_numpy(), pa.int8()),
            "payload": pa.array(p, type=ptype, from_pandas=True)})

    return union.groupby("kshard").map_groups(attach,
                                              batch_format="pandas")


def _pair_side_arrays(df):
    """Align a routed pair-shard frame into parallel arrays — ONE
    vectorized pass, no per-pair Python loop: sort by (pair, side),
    take the first row of each (pair, side) run, and intersect the two
    sides' group ids so only pairs with BOTH payloads survive.
    Returns (key_a, key_b, payload_side0, payload_side1) numpy arrays
    of equal length."""
    df = df.sort_values(["key_a", "key_b", "side"], kind="stable")
    ka = df["key_a"].to_numpy()
    kb = df["key_b"].to_numpy()
    payload = df["payload"].to_numpy()
    sides = df["side"].to_numpy()
    starts, _sizes = _group_starts(ka, kb)
    gid = np.zeros(len(ka), np.int64)
    gid[starts] = 1
    gid = np.cumsum(gid) - 1
    first = np.ones(len(ka), bool)
    first[1:] = (gid[1:] != gid[:-1]) | (sides[1:] != sides[:-1])
    m0 = first & (sides == 0)
    m1 = first & (sides == 1)
    g0 = gid[m0]
    g1 = gid[m1]
    common, i0, i1 = np.intersect1d(g0, g1, assume_unique=True,
                                    return_indices=True)
    idx0 = np.flatnonzero(m0)[i0]
    idx1 = np.flatnonzero(m1)[i1]
    anchor = starts[common]
    return ka[anchor], kb[anchor], payload[idx0], payload[idx1]


def _shingle_hash_bytes(texts: list, shingle_words: int) -> list:
    """Each text's UNIQUE word-shingle set as a sorted array of 64-bit
    shingle hashes (:func:`_shingle_hashes` — the same basis MinHash
    signs, no per-shingle string assembly), packed to bytes; per-doc
    dedup+sort via a single lexsort.  Used as the ``doc_transform`` of
    the Jaccard semi-join: runs once per REQUESTED doc per key-shard,
    and the pair shards then intersect integer arrays instead of
    rebuilding Python string sets."""
    n = len(texts)
    h64, offsets = _shingle_hashes(texts, shingle_words)
    h = h64.view(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((h, doc_idx))
    hs, di = h[order], doc_idx[order]
    keep = np.ones(len(hs), bool)
    keep[1:] = (di[1:] != di[:-1]) | (hs[1:] != hs[:-1])
    hs, di = hs[keep], di[keep]
    bounds = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(di, minlength=n), out=bounds[1:])
    buf = hs.tobytes()
    return [buf[bounds[i] * 8:bounds[i + 1] * 8] for i in range(n)]


def _bytes_to_hash_concat(payloads: np.ndarray):
    """(concatenated int64 hash array, per-item set sizes) from an
    object array of packed-hash bytes — ONE frombuffer over the joined
    buffer, no per-item decode loop."""
    if len(payloads) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    sizes = np.fromiter((len(b) >> 3 for b in payloads), np.int64,
                        count=len(payloads))
    vals = np.frombuffer(b"".join(payloads), np.int64)
    return vals, sizes


_np_key_type = _pa_key_type  # numpy arrays and Series share the rule


def _jaccard_frame(ka, kb, p0, p1, threshold: float):
    """Vectorized Jaccard over aligned pair arrays of packed-hash
    payloads: concatenate all pairs' hash arrays, ONE lexsort by
    (pair, hash), and count within-pair duplicate hashes (each common
    shingle appears exactly twice in a pair) — every intersection size
    in one run-length pass, zero per-pair Python.  Returns an Arrow
    table (pinned key type — see :func:`_pairs_table`)."""
    va, sa = _bytes_to_hash_concat(p0)
    vb, sb = _bytes_to_hash_concat(p1)
    npairs = len(ka)
    idx = np.arange(npairs, dtype=np.int64)
    pid = np.concatenate([np.repeat(idx, sa), np.repeat(idx, sb)])
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pid))
    pid, vals = pid[order], vals[order]
    dup = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
    inter = np.bincount(pid[1:][dup], minlength=npairs)
    union = sa + sb - inter
    ok = (sa > 0) & (sb > 0)
    j = np.zeros(npairs, np.float64)
    j[ok] = inter[ok] / union[ok]
    keep = ok & (j >= threshold)
    return _pairs_table(ka[keep], kb[keep], _np_key_type(ka),
                        jaccard=(j[keep], pa.float64()))


def _broadcast_payload_lookup(pairs_mat, docs, key_col, payload_builder):
    """Small-pair fast path support: collect the candidate-pair KEY
    set (bounded by the caller's threshold — the only driver pull),
    derive payloads for exactly those docs in one streaming filter
    pass over the corpus, and ``ray.put`` the (key, payload) lookup
    table.  Returns (object_ref, n_unique_keys) or (None, 0) when no
    doc matches."""
    import ray

    key_tbls = [b.select(["key_a", "key_b"]) for b in
                pairs_mat.iter_batches(batch_format="pyarrow", batch_size=None)
                if b.num_rows]
    if not key_tbls:  # no candidate pairs at all
        return None, 0
    both = pa.concat_tables(key_tbls)
    uniq = pc.unique(pa.concat_arrays(
        [both["key_a"].combine_chunks(), both["key_b"].combine_chunks()]))
    keys_ref = ray.put(uniq)

    def subset(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[key_col], value_set=ray.get(keys_ref))
        t = t.filter(m)
        return pa.table({key_col: t[key_col],
                         "payload": payload_builder(t)})

    parts = [b for b in docs.map_batches(subset, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not parts:
        return None, len(uniq)
    return ray.put(pa.concat_tables(parts)), len(uniq)


def _verify_pairs_broadcast(pairs_mat, docs, key_col, payload_builder,
                            emit_frame):
    """Shared small-pair fast path: payloads of the requested docs are
    broadcast once; each pair batch aligns both sides by lookup and
    calls ``emit_frame(ka, kb, p0, p1)``.  ZERO exchanges — the two
    groupbys of the semi-join route cost ~1 s of fixed overhead each,
    which dwarfs the work when the candidate set is small."""
    import pandas as pd
    import ray

    lookup_ref, _ = _broadcast_payload_lookup(pairs_mat, docs, key_col,
                                              payload_builder)

    from ..sketches import cached_broadcast

    def build_series(ptbl):
        s = pd.Series(ptbl["payload"].to_pylist(),
                      index=ptbl[key_col].to_pylist(), dtype=object)
        # duplicate doc keys would fan .loc lookups out row-wise and
        # misalign the pair arrays — keep the first, like the
        # semi-join's drop_duplicates("key")
        if not s.index.is_unique:
            s = s[~s.index.duplicated()]
        return s

    def verify_batch(t: pa.Table):
        df = t.select(["key_a", "key_b"]).to_pandas()
        if lookup_ref is None or df.empty:
            return emit_frame(df["key_a"].to_numpy()[:0],
                              df["key_b"].to_numpy()[:0],
                              np.empty(0, object), np.empty(0, object))
        # built once per WORKER, not per batch (the Series build over
        # up to 2 x threshold payloads is the expensive part)
        s = cached_broadcast(lookup_ref, build_series)
        # drop pairs with a missing doc on either side (semi-join
        # contract: such a pair cannot verify)
        ok = df["key_a"].isin(s.index) & df["key_b"].isin(s.index)
        df = df.loc[ok]
        return emit_frame(df["key_a"].to_numpy(), df["key_b"].to_numpy(),
                          s.loc[df["key_a"]].to_numpy(),
                          s.loc[df["key_b"]].to_numpy())

    return pairs_mat.map_batches(verify_batch, batch_format="pyarrow")


def jaccard_verify_pairs_ds(pairs, docs, text_col: str = "text",
                            key_col: str = "doc_id",
                            shingle_words: int = 3,
                            threshold: float = 0.7,
                            num_shards: int | None = None,
                            small_pairs_threshold: int = 100_000):
    """Distributed n-gram Jaccard verification of candidate pairs.

    ADAPTIVE: candidate counts are usually tiny relative to the corpus
    (LSH prunes hard), so when the pair count is at most
    ``small_pairs_threshold`` the requested docs' shingle-hash sets
    are broadcast once and pairs verify with ZERO exchanges (driver
    briefly holds the pair KEY set — bounded by the threshold, never
    text).  Above the threshold, the :func:`_route_pair_payloads`
    shuffle semi-join runs: text ships through the key-shard exchange
    (once per doc — the unavoidable cost), each key-shard derives the
    unique-shingle hash sets of the REQUESTED docs only
    (:func:`_shingle_hash_bytes`), and the pair shards intersect
    integer arrays via :func:`_jaccard_frame`.  Jaccard over 64-bit
    shingle hashes is exact up to a ~2^-64 per-shingle collision.

    Returns Dataset(key_a, key_b, jaccard) for pairs >= threshold.
    """
    num_shards = num_shards or _default_shards()

    pairs = pairs.materialize()
    if pairs.count() <= small_pairs_threshold:
        builder = lambda t: pa.array(  # noqa: E731
            _shingle_hash_bytes(t[text_col].to_pylist(), shingle_words),
            pa.binary())
        return _verify_pairs_broadcast(
            pairs, docs.select_columns([key_col, text_col]), key_col,
            builder,
            lambda ka, kb, p0, p1: _jaccard_frame(ka, kb, p0, p1,
                                                  threshold))

    import pandas as pd

    routed = _route_pair_payloads(
        pairs, docs.select_columns([key_col, text_col]), key_col,
        doc_payload=lambda t: pc.cast(t[text_col], pa.string()),
        req_payload=lambda n: pa.nulls(n, pa.string()),
        num_shards=num_shards, seeds=(5, 6, 7),
        doc_transform=lambda texts: _shingle_hash_bytes(texts,
                                                        shingle_words),
        payload_type=pa.binary())

    def verify(df):
        if df.empty:
            return _pairs_table([], [], _pa_key_type(df["key_a"]),
                                jaccard=([], pa.float64()))
        ka, kb, p0, p1 = _pair_side_arrays(df)
        return _jaccard_frame(ka, kb, p0, p1, threshold)

    return routed.groupby("pshard").map_groups(verify,
                                               batch_format="pandas")


def filter_exact_text_pairs(pairs, docs, text_col: str = "text",
                            key_col: str = "doc_id",
                            num_shards: int | None = None,
                            _hash_fns=(hash_strings, hash_strings2),
                            small_pairs_threshold: int = 1_000_000):
    """Keep only candidate pairs whose texts are byte-identical —
    verified via 128-bit / 32-hex content hashes (64 bits alone would
    declare hash-colliding distinct texts "identical" at 10^12-doc
    scale).  Turns a near-dup candidate generator (LSH / SimHash) into
    an exact-duplicate-pair finder with recall 1 (identical text =>
    identical signature => co-bucketed), which makes the result
    SQL-oracle-checkable.  ``_hash_fns`` is a test seam for collision
    injection.

    ADAPTIVE like :func:`jaccard_verify_pairs_ds`: at most
    ``small_pairs_threshold`` pairs verify against a broadcast of the
    requested docs' hashes with zero exchanges; larger candidate sets
    run the :func:`_route_pair_payloads` shuffle semi-join.  The
    default threshold is 10x Jaccard's because the broadcast payload
    here is 32 bytes per REQUESTED DOC (not per pair) — the only
    pair-proportional cost is the key-set pull (~16 MB at the
    threshold)."""
    import pandas as pd

    num_shards = num_shards or _default_shards()
    hf1, hf2 = _hash_fns

    def doc_hashes(t: pa.Table) -> pa.Array:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        if len(texts) == 0:
            # np.char.mod on an EMPTY object array infers float64 and
            # the subsequent zfill raises TypeError — this is exactly
            # the intermittent driver failure when a block's rows are
            # all filtered out by the candidate-key subset
            return pa.array([], pa.string())
        h1 = hf1(texts)
        h2 = hf2(texts)
        hexes = np.char.add(np.char.mod("%016x", h1),
                            np.char.mod("%016x", h2))
        return pa.array(hexes, pa.string())

    pairs = pairs.materialize()
    if pairs.count() <= small_pairs_threshold:
        def equal_frame(ka, kb, h0, h1):
            eq = h0 == h1 if len(ka) else np.zeros(0, bool)
            return _pairs_table(ka[eq], kb[eq], _np_key_type(ka))

        return _verify_pairs_broadcast(
            pairs, docs.select_columns([key_col, text_col]), key_col,
            doc_hashes, equal_frame)

    routed = _route_pair_payloads(
        pairs, docs.select_columns([key_col, text_col]), key_col,
        doc_payload=doc_hashes,
        req_payload=lambda n: pa.array(np.full(n, "", object), pa.string()),
        num_shards=num_shards, seeds=(21, 22, 23),
        payload_type=pa.string())

    def equal_pairs(df):
        if df.empty:
            return _pairs_table([], [], _pa_key_type(df["key_a"]))
        ka, kb, h0, h1 = _pair_side_arrays(df)
        eq = h0 == h1  # elementwise over the hex-string object arrays
        return _pairs_table(ka[eq], kb[eq], _np_key_type(ka))

    return routed.groupby("pshard").map_groups(equal_pairs,
                                               batch_format="pandas")


def connected_components(pairs, num_shards: int | None = None,
                         max_rounds: int = 50,
                         small_edges_threshold: int = 500_000):
    """Connected components over a (key_a, key_b) edge Dataset.

    ADAPTIVE: dup-pair graphs are usually tiny relative to the corpus,
    and each distributed round costs ~1 s of fixed exchange overhead —
    so at most ``small_edges_threshold`` edges (a few MB of keys; the
    driver briefly holds the edge list, never any text) run a single
    path-compressed union-find with min-key labels.  Larger graphs run
    the distributed min-label propagation: state lives in a sharded
    Dataset (rows = node labels + forwarded edges + label messages),
    each round is one integer-shard groupby, and convergence is
    detected by an exact per-round changed-label count (labels only
    decrease, so changed == 0 is a true fixpoint).  Rounds needed =
    component diameter; near-dup components are near-cliques (LSH
    co-buckets all members of a dup cluster), so 2–4 rounds is
    typical.  Raises RuntimeError if ``max_rounds`` is hit.

    Returns a materialized Dataset(node, label) with one row per node,
    label = the minimum key of the node's component.
    """
    import pandas as pd
    import ray.data  # noqa: F401

    num_shards = num_shards or _default_shards()

    pairs = pairs.materialize()
    if pairs.count() <= small_edges_threshold:
        tbls = [b for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None)
                if b.num_rows]
        if not tbls:
            try:
                ktype = pa.schema(pairs.schema().base_schema) \
                    .field("key_a").type
            except Exception:  # noqa: BLE001 — schema unknowable
                ktype = pa.string()
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], ktype),
                 "label": pa.array([], ktype)}))
        edges = pa.concat_tables([t.select(["key_a", "key_b"])
                                  for t in tbls])
        ka = edges["key_a"].to_pylist()
        kb = edges["key_b"].to_pylist()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(ka, kb):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        label_of_root: dict = {}
        nodes = list(parent)
        roots = [find(n) for n in nodes]
        for n, r in zip(nodes, roots):
            cur = label_of_root.get(r)
            if cur is None or n < cur:
                label_of_root[r] = n
        ktype = edges.schema.field("key_a").type
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, ktype),
            "label": pa.array([label_of_root[r] for r in roots], ktype),
        }))

    # row kinds: 0 = edge (other = neighbor), 1 = label (other = label)
    def init_rows(t: pa.Table) -> pa.Table:
        parts = []
        for u, v in (("key_a", "key_b"), ("key_b", "key_a")):
            node = t[u].combine_chunks() \
                if isinstance(t[u], pa.ChunkedArray) else t[u]
            other = t[v].combine_chunks() \
                if isinstance(t[v], pa.ChunkedArray) else t[v]
            n = len(node)
            shard = pa.array(_key_shards(
                node.to_numpy(zero_copy_only=False), num_shards, 9),
                pa.int64())
            common = {"nshard": shard, "node": node}
            # forwarded edge
            parts.append(pa.table({
                **common, "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
                "other": other,
                "canon": pa.array(np.zeros(n, bool)),
                "changed": pa.array(np.zeros(n, np.int8), pa.int8())}))
            # self label (canonical)
            parts.append(pa.table({
                **common, "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                "other": node,
                "canon": pa.array(np.ones(n, bool)),
                "changed": pa.array(np.zeros(n, np.int8), pa.int8())}))
            # initial neighbor message (so round 1 already sees
            # neighbor ids as candidate labels — otherwise the first
            # round is a false fixpoint)
            parts.append(pa.table({
                **common, "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                "other": other,
                "canon": pa.array(np.zeros(n, bool)),
                "changed": pa.array(np.zeros(n, np.int8), pa.int8())}))
        return pa.concat_tables(parts)

    def propagate(df):
        kind = df["kind"].to_numpy()
        edges = df.loc[kind == 0]
        labels = df.loc[kind == 1]
        jumps = df.loc[kind == 2]
        m = labels.groupby("node")["other"].min()
        prev = labels.loc[labels["canon"]].groupby("node")["other"].min()
        changed = (m.to_numpy() != prev.reindex(m.index).to_numpy()) \
            .astype(np.int8)
        nodes = m.index.to_numpy()
        canon = pd.DataFrame({
            "node": nodes, "kind": np.int8(1), "other": m.to_numpy(),
            "canon": True, "changed": changed})
        msgs = pd.DataFrame({
            "node": edges["other"].to_numpy(),
            "kind": np.int8(1),
            "other": edges["node"].map(m).to_numpy(),
            "canon": False, "changed": np.int8(0)})
        fwd = pd.DataFrame({
            "node": edges["node"].to_numpy(), "kind": np.int8(0),
            "other": edges["other"].to_numpy(),
            "canon": False, "changed": np.int8(0)})
        # pointer jumping (hash-to-min flavor): each node asks its
        # current label for THAT node's label, halving pointer-chain
        # depth per round — deep chains converge in O(log d) rounds
        # instead of O(d).  A jump row (kind 2, node=x, other=req) is
        # answered here (x's shard) with a label message m[x] -> req;
        # fresh requests go to each node's new label.
        answers = pd.DataFrame({
            "node": jumps["other"].to_numpy(),
            "kind": np.int8(1),
            "other": jumps["node"].map(m).to_numpy(),
            "canon": False, "changed": np.int8(0)})
        ptr = m[m.to_numpy() != nodes]  # nodes not yet their own root
        requests = pd.DataFrame({
            "node": ptr.to_numpy(), "kind": np.int8(2),
            "other": ptr.index.to_numpy(),
            "canon": False, "changed": np.int8(0)})
        out = pd.concat([canon, msgs, fwd, answers, requests],
                        ignore_index=True)
        out["nshard"] = _key_shards(out["node"].to_numpy(), num_shards, 9)
        kt = _pa_key_type(out["node"])
        return pa.table({
            "nshard": pa.array(out["nshard"].to_numpy(), pa.int64()),
            "node": pa.array(out["node"].to_numpy(), type=kt,
                             from_pandas=True),
            "kind": pa.array(out["kind"].to_numpy().astype(np.int8),
                             pa.int8()),
            "other": pa.array(out["other"].to_numpy(), type=kt,
                              from_pandas=True),
            "canon": pa.array(out["canon"].to_numpy().astype(bool),
                              pa.bool_()),
            "changed": pa.array(out["changed"].to_numpy().astype(np.int8),
                                pa.int8())})

    state = pairs.map_batches(init_rows, batch_format="pyarrow") \
        .materialize()
    if state.count() == 0:
        import ray.data as rd

        # preserve the caller's key dtype in the empty result
        try:
            ktype = pa.schema(pairs.schema().base_schema) \
                .field("key_a").type
        except Exception:  # noqa: BLE001 — schema unknowable on empty
            ktype = pa.string()
        return rd.from_arrow(pa.table({"node": pa.array([], ktype),
                                       "label": pa.array([], ktype)}))

    for _ in range(max_rounds):
        state = state.groupby("nshard").map_groups(
            propagate, batch_format="pandas").materialize()
        # every non-canon row carries changed=0, so the convergence
        # check is ONE column aggregate over the already-materialized
        # state — no extra filter map_batches pass per round
        n_changed = state.sum("changed")
        if not n_changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds (pathologically deep component — raise max_rounds)")

    def final_labels(t: pa.Table) -> pa.Table:
        lab = t.filter(pc.and_(pc.equal(t["kind"], 1), t["canon"]))
        return pa.table({"node": lab["node"], "label": lab["other"]})

    return state.map_batches(final_labels, batch_format="pyarrow")


def component_all_pairs(pairs, num_shards: int | None = None):
    """Transitive-closure ALL-pairs of a (key_a, key_b) edge Dataset:
    run :func:`connected_components`, co-locate each component on one
    label-hash shard, and emit every (a, b), a < b, within each
    component.  Turns a connectivity-preserving candidate graph (e.g.
    :func:`winnow_candidates` star pairs above ``max_bucket``, after
    :func:`filter_exact_text_pairs`) back into the full pair set a SQL
    self-join oracle produces — output cardinality is sum m(m-1)/2
    over components, i.e. exactly what any all-pairs consumer must
    materialize anyway.  Returns Dataset(key_a, key_b)."""
    import pandas as pd

    num_shards = num_shards or _default_shards()
    labels = connected_components(pairs, num_shards=num_shards)

    def add_shard(t: pa.Table) -> pa.Table:
        lab = t["label"].combine_chunks() \
            if isinstance(t["label"], pa.ChunkedArray) else t["label"]
        shard = pa.array(_key_shards(
            lab.to_numpy(zero_copy_only=False), num_shards, 31), pa.int64())
        return t.append_column("lshard", shard)

    def emit(df):
        kt = _pa_key_type(df["node"])
        if len(df) < 2:
            return _pairs_table([], [], kt)
        df = df.sort_values(["label", "node"], kind="stable")
        starts, sizes = _group_starts(df["label"].to_numpy())
        ia, ib = _triu_pairs(starts, sizes)
        nodes = df["node"].to_numpy()
        return _pairs_table(nodes[ia], nodes[ib], kt)

    return labels.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("lshard").map_groups(emit, batch_format="pandas")


def dedup_keep_keys_ds(ds, text_col: str = "text", key_col: str = "doc_id",
                       jaccard_threshold: float = 0.8, num_hashes: int = 64,
                       shingle_words: int = 3, bands: int = 16,
                       concurrency=None, num_shards: int | None = None):
    """End-to-end distributed dedup: exact (content-hash) THEN near-dup
    (MinHash+LSH candidates -> distributed Jaccard verify ->
    distributed connected components).  Returns a Dataset(key_col) of
    kept keys (the minimum key per duplicate component) — every stage
    streams; the driver holds no key list, pair list, or text.

    A key is dropped when a strictly smaller key exists in its
    near-dup component (matching union-find-with-min semantics), even
    if that smaller key was itself removed by exact dedup — its
    content survives through its own exact-kept representative.
    """
    import threading

    import pandas as pd

    num_shards = num_shards or _default_shards()
    # the exact path and the LSH->verify chain are independent until
    # the final anti-join: materialize the exact keep-list on a
    # background thread so its shuffle overlaps the (longer) LSH chain
    # instead of serializing after it
    kept_box: dict = {}

    def _exact():
        try:
            kept_box["ds"] = exact_dedup_keys(
                ds, text_col, key_col, num_shards).materialize()
        except Exception as e:  # noqa: BLE001
            kept_box["err"] = e

    exact_thread = threading.Thread(target=_exact, daemon=True)
    exact_thread.start()

    cand = minhash_lsh_candidates(ds, text_col, key_col, num_hashes,
                                  shingle_words, bands, concurrency,
                                  num_shards)
    verified = jaccard_verify_pairs_ds(
        cand, ds, text_col, key_col, shingle_words, jaccard_threshold,
        num_shards).materialize()  # duplicate-rate sized; read by CC rounds

    exact_thread.join()
    if "err" in kept_box:
        raise kept_box["err"]
    kept_exact = kept_box["ds"]

    if verified.count() == 0:
        return kept_exact

    cc = connected_components(
        verified.map_batches(lambda t: t.select(["key_a", "key_b"]),
                             batch_format="pyarrow"),
        num_shards)
    drop = cc.map_batches(
        lambda t: pa.table({key_col: t.filter(
            pc.invert(pc.equal(t["node"], t["label"])))["node"]}),
        batch_format="pyarrow")

    # distributed anti-join: kept_exact MINUS drop, on integer shards
    def tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            keys = t[key_col]
            n = t.num_rows
            return pa.table({
                "kshard": pa.array(_key_shards(
                    keys.to_numpy(zero_copy_only=False), num_shards, 13),
                    pa.int64()),
                key_col: keys,
                "is_drop": pa.array(np.full(n, flag, np.int8), pa.int8()),
            })
        return f

    union = kept_exact.map_batches(tag(0), batch_format="pyarrow").union(
        drop.map_batches(tag(1), batch_format="pyarrow"))

    def anti(df):
        flag = df.groupby(key_col)["is_drop"].max()
        keep = flag.index[flag.to_numpy() == 0].to_numpy()
        return pa.table({key_col: pa.array(
            keep, type=_pa_key_type(df[key_col]), from_pandas=True)})

    return union.groupby("kshard").map_groups(anti, batch_format="pandas")


def dedup_keep_keys(ds, text_col: str = "text", key_col: str = "doc_id",
                    jaccard_threshold: float = 0.8, num_hashes: int = 64,
                    shingle_words: int = 3, bands: int = 16,
                    concurrency=None) -> pa.Table:
    """Small-scale convenience wrapper over :func:`dedup_keep_keys_ds`:
    materializes the kept-key Dataset to a sorted ``pa.Table``.  Use
    the ``_ds`` variant (and write the result) when the keep-list
    itself is large."""
    keep = dedup_keep_keys_ds(ds, text_col, key_col, jaccard_threshold,
                              num_hashes, shingle_words, bands, concurrency)
    tbl = pa.concat_tables(
        [t for t in keep.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
        or [pa.table({key_col: pa.array([], pa.int64())})])
    return tbl.sort_by(key_col)


def winnow_candidates(ds, text_col: str = "text", key_col: str = "doc_id",
                      k: int = 8, window: int = 16,
                      num_shards: int | None = None,
                      max_bucket: int = 50):
    """Substring-level near-dup candidate pairs: documents sharing at
    least one winnowing fingerprint (text.winnow_fingerprints_batch —
    the MOSS guarantee: any shared substring of length >= window+k-1
    surfaces a shared fingerprint).  Complements MinHash (whole-doc
    set overlap) and SimHash (whole-doc bit profile) with CONTAINMENT
    detection: a paragraph copied into an otherwise different
    document.

    Same exchange shape as the LSH generators: fingerprints explode to
    (fp, key) rows, co-locate on a bounded fp-hash shard, and pairs
    emit per fingerprint group.  ``max_bucket`` caps the O(m^2) pair
    blowup of fingerprints shared by more than that many docs
    (boilerplate substrings): over-cap buckets emit CHAIN pairs in
    CONTENT-HASH order (m-1 edges; each member to its neighbour)
    instead of being dropped.  Identical texts sort adjacent in that
    order, so an exact-dup cluster of ANY size — whose members share
    *all* fingerprints and therefore form a contiguous run in every
    one of its buckets — stays connected through identical-text edges
    that survive :func:`filter_exact_text_pairs`; recall 1 then holds
    for closure-based consumers (connected components /
    :func:`component_all_pairs`) up to a 2^-64 content-hash sort
    collision.  A min-key STAR would NOT give this: its edges run to a
    possibly different-content hub and die in the exact filter.  The
    raw pair list itself is NOT the full pair closure above the cap.
    Returns Dataset(key_a, key_b) distinct pairs."""
    import pandas as pd

    from .text import winnow_fingerprints_batch

    nb = num_shards or _default_shards()

    def explode(t: pa.Table) -> pa.Table:
        t2 = winnow_fingerprints_batch(t, text_col, k=k, window=window)
        fps = t2["fingerprints"]
        if isinstance(fps, pa.ChunkedArray):
            fps = fps.combine_chunks()
        flat = fps.flatten()
        counts = pc.list_value_length(fps).to_numpy(zero_copy_only=False)
        keys = np.repeat(
            np.asarray(t2[key_col].to_numpy(zero_copy_only=False)),
            counts)
        # content hash rides along as the over-cap chain sort key:
        # identical texts sort adjacent, keeping exact-dup clusters
        # connected through identical-text edges (docstring)
        chash = np.repeat(
            hash_strings(t2[text_col].to_numpy(zero_copy_only=False))
            .view(np.int64), counts)
        fp = flat.to_numpy(zero_copy_only=False)
        shard = (mix64(fp.view(np.uint64), 59) % np.uint64(nb)) \
            .astype(np.int64)
        return pa.table({
            "fshard": pa.array(shard, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "chash": pa.array(chash, pa.int64()),
            key_col: pa.array(keys),
        })

    def emit(df):
        kt = _pa_key_type(df[key_col])
        dup = df[df.duplicated(["fp"], keep=False)]
        if dup.empty:
            return _pairs_table([], [], kt)
        # one key may contribute a fingerprint many times across its
        # windows only once (fingerprints are per-doc deduplicated by
        # winnow_fingerprints_batch), so groups are distinct docs
        dup = dup.sort_values(["fp", "chash", key_col], kind="stable")
        fpv = dup["fp"].to_numpy()
        starts, sizes = _group_starts(fpv)
        keys = dup[key_col].to_numpy()
        keep = sizes <= max_bucket
        ia, ib = _triu_pairs(starts[keep], sizes[keep])
        ok = keys[ia] != keys[ib]
        # normalize orientation (key_a < key_b): the group sort is by
        # (chash, key), so triu order no longer implies key order
        key_a = np.minimum(keys[ia][ok], keys[ib][ok])
        key_b = np.maximum(keys[ia][ok], keys[ib][ok])
        if not np.all(keep):
            # over-cap buckets degrade to CHAIN pairs in (chash, key)
            # order: m-1 edges, identical-content members adjacent —
            # see the docstring for why a min-key star would lose
            # exact-dup recall through the exact-text filter
            sa, sz = starts[~keep], sizes[~keep]
            left = np.concatenate(
                [np.arange(s, s + m - 1) for s, m in zip(sa, sz)])
            right = left + 1
            la, lb = keys[left], keys[right]
            lo = np.minimum(la, lb)
            hi = np.maximum(la, lb)
            ok2 = lo != hi
            key_a = np.concatenate([key_a, lo[ok2]])
            key_b = np.concatenate([key_b, hi[ok2]])
        return _pairs_table(key_a, key_b, kt)

    pairs = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("fshard").map_groups(emit, batch_format="pandas")
    return distinct_pairs(pairs, num_shards=nb)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word hashes: per doc, each word votes ±1 on
    each bit; the signature is the sign vector.  Vectorized with a
    bit-unpacked vote matrix + ``np.add.reduceat`` per doc."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col
        self.bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, t: pa.Table) -> pa.Table:
        # k=1 shingles = per-word hashes, via the shared vectorized
        # split+hash kernel (no Python word loop)
        h, offsets = _shingle_hashes(t[self.text_col], 1)
        sig = np.zeros(t.num_rows, dtype=np.uint64)
        if len(h):
            votes = ((h[:, None] & self.bit_masks) != 0).astype(np.int32) * 2 - 1
            nonempty = np.diff(offsets) > 0
            starts = offsets[:-1][nonempty]
            sums = np.add.reduceat(votes, starts, axis=0)
            bits = (sums > 0).astype(np.uint64)
            packed = (bits << np.arange(64, dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64)
            sig[nonempty] = packed
        return t.append_column(self.out_col, pa.array(sig, pa.uint64()))


def simhash_near_dups(ds, text_col: str = "text", key_col: str = "doc_id",
                      max_hamming: int = 3, concurrency=None,
                      num_shards: int | None = None):
    """Near-dup pairs by SimHash: docs whose signatures agree on all
    four 16-bit chunks after masking ``max_hamming`` bits are candidate
    pairs (standard multi-index trick: any pair within Hamming distance
    3 shares at least one of 4 exact 16-bit chunks).  Returns
    (key_a, key_b, hamming).  ``concurrency=None`` = task closure
    (SimHasher is stateless — see minhash_lsh_candidates)."""
    if concurrency is None:
        sigs = ds.map_batches(SimHasher(text_col=text_col),
                              batch_format="pyarrow")
    else:
        sigs = ds.map_batches(
            SimHasher, fn_constructor_kwargs=dict(text_col=text_col),
            batch_format="pyarrow", concurrency=concurrency)

    def explode_chunks(t: pa.Table) -> pa.Table:
        s = np.asarray(t["simhash"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        n = len(s)
        chunk_ids = np.repeat(np.arange(4, dtype=np.int32), n)
        chunks = np.concatenate([
            (s >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)])
        return pa.table({
            "chunk_id": pa.array(chunk_ids, pa.int32()),
            "chunk": pa.array(chunks.astype(np.int64), pa.int64()),
            key_col: pa.array(np.tile(
                np.asarray(t[key_col].to_numpy(zero_copy_only=False)), 4)),
            "simhash": pa.array(np.tile(s, 4), pa.uint64()),
        })

    exploded = sigs.map_batches(explode_chunks, batch_format="pyarrow")

    # same small-mod-bucket shuffle as MinHash LSH: co-locate whole
    # (chunk_id, chunk) groups on a bounded number of integer shards
    # (cluster-proportional by default — see _default_shards)
    nb = num_shards or _default_shards()

    def add_mod(t: pa.Table) -> pa.Table:
        base = (np.asarray(t["chunk"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
                + (np.asarray(t["chunk_id"].to_numpy(zero_copy_only=False),
                              dtype=np.uint64) << np.uint64(17)))
        m = mix64(base, 11) % np.uint64(nb)
        return t.append_column("shard", pa.array(m.astype(np.int64)))

    def emit(df):
        kt = _pa_key_type(df[key_col])
        dup = df[df.duplicated(["chunk_id", "chunk"], keep=False)]
        if dup.empty:
            return _pairs_table([], [], kt,
                                hamming=([], pa.int64()))
        dup = dup.sort_values(["chunk_id", "chunk", key_col], kind="stable")
        starts, sizes = _group_starts(dup["chunk_id"].to_numpy(),
                                      dup["chunk"].to_numpy())
        ia, ib = _triu_pairs(starts, sizes)
        keys = dup[key_col].to_numpy()
        sigs = dup["simhash"].to_numpy().astype(np.uint64)
        ham = _popcount64(sigs[ia] ^ sigs[ib])
        ok = (ham <= max_hamming) & (keys[ia] != keys[ib])
        return _pairs_table(keys[ia][ok], keys[ib][ok], kt,
                            hamming=(ham[ok], pa.int64()))

    pairs = exploded.map_batches(add_mod, batch_format="pyarrow") \
        .groupby("shard").map_groups(emit, batch_format="pandas")
    # distinct via integer pair-shards keeping the best hamming — NOT a
    # sort-shuffle groupby on the near-unique (key_a, key_b) pair key
    return distinct_pairs(pairs, num_shards=nb, min_col="hamming")


def novel_keys_vs_existing(new_ds, existing_ds, text_col: str = "text",
                           key_col: str = "doc_id",
                           num_shards: int | None = None,
                           _hash_fns=(hash_strings, hash_strings2)):
    """Incremental-ingestion dedup: the keys of NEW documents whose
    content does not already exist in the EXISTING corpus — the check
    every append-only training-data pipeline runs before admitting a
    crawl increment.

    Shape: both sides ship only (hash128, key) — never text — through
    ONE bounded hash-shard exchange (identical hashes co-shard by
    construction, same rule as :func:`exact_dedup_keys`); each shard
    anti-joins its new rows against its existing hash set with a
    C-level merge.  Content identity is 128-bit (two keyed SipHashes);
    null-text rows are excluded on both sides (they have no content to
    compare).  Returns Dataset(key_col).
    """
    import pandas as pd

    num_shards = num_shards or _default_shards()
    hf1, hf2 = _hash_fns

    def rows(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[text_col]))
            texts = t[text_col].to_numpy(zero_copy_only=False)
            h1 = hf1(texts).view(np.int64)
            h2 = hf2(texts).view(np.int64)
            shard = (h1.view(np.uint64) % np.uint64(num_shards)) \
                .astype(np.int64)
            return pa.table({
                "hshard": pa.array(shard, pa.int64()),
                "h1": pa.array(h1, pa.int64()),
                "h2": pa.array(h2, pa.int64()),
                "side": pa.array(np.full(t.num_rows, side, np.int8),
                                 pa.int8()),
                key_col: t[key_col],
            })
        return fn

    union = new_ds.select_columns([key_col, text_col]) \
        .map_batches(rows(0), batch_format="pyarrow").union(
            existing_ds.select_columns([key_col, text_col])
            .map_batches(rows(1), batch_format="pyarrow"))

    def anti(df):
        kt = _pa_key_type(df[key_col])
        newdf = df.loc[df["side"] == 0, ["h1", "h2", key_col]]
        if newdf.empty:
            return pa.table({key_col: pa.array([], kt)})
        exist = df.loc[df["side"] == 1, ["h1", "h2"]].drop_duplicates()
        m = newdf.merge(exist, on=["h1", "h2"], how="left",
                        indicator=True)
        keep = m.loc[m["_merge"] == "left_only", key_col].to_numpy()
        return pa.table({key_col: pa.array(keep, type=kt,
                                           from_pandas=True)})

    return union.groupby("hshard").map_groups(anti, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity self-join (no candidate pruning)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str = "text",
                        key_col: str = "doc_id",
                        shingle_words: int = 3, threshold: float = 0.5,
                        num_shards: int | None = None,
                        max_df: int | None = None,
                        size_hint_rows: int | None = None,
                        small_rows_threshold: int = 100_000):
    """EXACT word-n-gram Jaccard similarity self-join over the whole
    corpus — the classic inverted-index similarity join, with no
    LSH/candidate pruning and therefore recall 1 by construction
    (the guarantee the LSH paths trade away for speed).

    Returns a Dataset of ``(key_a, key_b, n_common, n_union,
    jaccard)`` for every unordered pair with ``jaccard >= threshold``
    (``key_a < key_b``; docs with no shingles — null/blank text —
    cannot pair).

    Dataflow (every exchange a bounded integer-shard groupby, the
    module's standard shape):

    1. ``map_batches``: vectorized shingle hashing
       (:func:`_shingle_hashes` — one Arrow split + one SipHash pass
       per batch), per-doc DISTINCT via one lexsort -> the posting
       rows ``(key, sh, sshard)``.
    2. ``groupby(sshard)``: postings sorted by (shingle, key); each
       posting list emits its triangular pairs
       (:func:`_triu_pairs`), immediately pre-aggregated per
       ``(key_a, key_b)`` (combiner) before the pair exchange.
    3. ``groupby(pshard)``: per-pair sum = exact ``|A ∩ B|``.
    4. Per-doc set sizes (one extra tokenize pass, O(docs) rows,
       materialized distributed — never on the driver) are attached
       with two native hash-shuffle joins; ``jaccard =
       inter / (|A| + |B| - inter)`` and the threshold filter run
       vectorized per batch.

    ``max_df`` drops shingles whose per-corpus posting list exceeds
    it (a stop-shingle knob: pair-generation work is
    ``sum_s df(s)^2``, and web-scale corpora have power-law shingle
    frequencies).  With the default ``None`` the join is exact —
    callers that cap MUST treat the result as "Jaccard over
    non-stop shingles" (the winnow-cap lesson: a silent cap breaks
    the recall contract).

    Shingle identity is the module's 64-bit hash (2^-64 per-pair
    collision tolerance); the shingle definition matches
    :func:`_word_shingles` (lowercased whitespace words, short docs
    contribute one whole-text shingle).

    ADAPTIVE like the linkage/verify operators: the distributed plan
    pays four fixed-cost exchanges regardless of size.  When the
    CALLER certifies the row count via ``size_hint_rows`` (parquet
    metadata — never a count() pass) and it is at most
    ``small_rows_threshold``, the same pure phase functions run once
    on the driver over the collected projection: zero exchanges,
    byte-identical answer (``max_df`` is global in both paths — a
    shingle's postings all land in one shard).  No hint, or a hint
    above the threshold, runs the distributed plan — the 100 TB
    default.
    """
    num_shards = num_shards or _default_shards()
    key_type_holder: dict = {}

    def postings(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        if t.num_rows == 0:
            return pa.table({
                "key": pa.array([], keys.type),
                "sh": pa.array([], pa.int64()),
                "sshard": pa.array([], pa.int64())})
        sh, offs = _shingle_hashes(t[text_col], shingle_words)
        n = t.num_rows
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(offs))
        order = np.lexsort((sh, doc_idx))
        d, h = doc_idx[order], sh[order]
        first = np.ones(len(d), bool)
        if len(d) > 1:
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        d, h = d[first], h[first]
        shard = (h % np.uint64(num_shards)).astype(np.int64)
        return pa.table({
            "key": pc.take(keys, pa.array(d, pa.int64())),
            "sh": pa.array(h.view(np.int64), pa.int64()),
            "sshard": pa.array(shard, pa.int64())})

    def doc_sizes(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], keys.type),
                             "sz": pa.array([], pa.int64())})
        sh, offs = _shingle_hashes(t[text_col], shingle_words)
        n = t.num_rows
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(offs))
        order = np.lexsort((sh, doc_idx))
        d, h = doc_idx[order], sh[order]
        first = np.ones(len(d), bool)
        if len(d) > 1:
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        sz = np.bincount(d[first], minlength=n).astype(np.int64)
        nz = sz > 0
        return pa.table({
            "key": pc.take(keys, pa.array(np.flatnonzero(nz))),
            "sz": pa.array(sz[nz], pa.int64())})

    def shard_pairs(df):
        import pandas as pd
        df = df.sort_values(["sh", "key"], kind="stable")
        h = df["sh"].to_numpy()
        starts, sizes = _group_starts(h)
        if max_df is not None:
            keep = sizes <= max_df
            starts, sizes = starts[keep], sizes[keep]
        ia, ib = _triu_pairs(starts, sizes)
        kt = _pa_key_type(df["key"])
        if len(ia) == 0:
            return _pairs_table([], [], kt, c=([], pa.int64()),
                                pshard=([], pa.int64()))
        k = df["key"].to_numpy()
        out = pd.DataFrame({"key_a": k[ia], "key_b": k[ib]})
        out = out.groupby(["key_a", "key_b"], sort=False) \
                 .size().reset_index(name="c")
        ph = _key_hash(out["key_a"].to_numpy(), 3) \
            ^ _key_hash(out["key_b"].to_numpy(), 4)
        pshard = (ph % np.uint64(num_shards)).astype(np.int64)
        return _pairs_table(
            out["key_a"].to_numpy(), out["key_b"].to_numpy(), kt,
            c=(out["c"].to_numpy().astype(np.int64), pa.int64()),
            pshard=(pshard, pa.int64()))

    def pair_sums(df):
        g = df.groupby(["key_a", "key_b"], sort=False, as_index=False) \
              .agg(n_common=("c", "sum"))
        return _pairs_table(
            g["key_a"].to_numpy(), g["key_b"].to_numpy(),
            _pa_key_type(g["key_a"]),
            n_common=(g["n_common"].to_numpy().astype(np.int64),
                      pa.int64()))

    key_type = None
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name == key_col:
            key_type = typ
    if key_type is None:
        raise ValueError(f"{key_col!r} not in dataset schema")

    def norm_pairs(t: pa.Table) -> pa.Table:
        # empty input partitions surface as column-less blocks out of
        # groupby/map_groups; the native hash-shuffle join rejects any
        # block missing its key column, so pin the schema here
        if t.num_rows == 0 or "key_a" not in t.column_names:
            return pa.table({"key_a": pa.array([], key_type),
                             "key_b": pa.array([], key_type),
                             "n_common": pa.array([], pa.int64())})
        return pa.table({"key_a": pc.cast(t["key_a"], key_type),
                         "key_b": pc.cast(t["key_b"], key_type),
                         "n_common": pc.cast(t["n_common"], pa.int64())})

    def finish(df):
        need = ["key_a", "key_b", "n_common", "sz_a", "sz_b"]
        if df.shape[0] == 0 or any(c not in df.columns for c in need):
            return _pairs_table([], [], key_type,
                                n_common=([], pa.int64()),
                                n_union=([], pa.int64()),
                                jaccard=([], pa.float64()))
        inter_n = df["n_common"].to_numpy().astype(np.int64)
        uni = df["sz_a"].to_numpy().astype(np.int64) \
            + df["sz_b"].to_numpy().astype(np.int64) - inter_n
        jac = inter_n / np.maximum(uni, 1)
        keep = jac >= threshold
        out = df.loc[keep]
        return _pairs_table(out["key_a"].to_numpy(),
                            out["key_b"].to_numpy(), key_type,
                            n_common=(inter_n[keep], pa.int64()),
                            n_union=(uni[keep], pa.int64()),
                            jaccard=(jac[keep], pa.float64()))

    if size_hint_rows is not None and \
            size_hint_rows <= small_rows_threshold:
        import ray.data as rd

        empty = pa.table({"key_a": pa.array([], key_type),
                          "key_b": pa.array([], key_type),
                          "n_common": pa.array([], pa.int64()),
                          "n_union": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
                 if b.num_rows]
        if not parts:
            return rd.from_arrow(empty)
        t_all = pa.concat_tables(parts).combine_chunks()
        sums = pair_sums(
            shard_pairs(postings(t_all).to_pandas()).to_pandas())
        if sums.num_rows == 0:
            return rd.from_arrow(empty)
        s = doc_sizes(t_all).to_pandas()
        p = sums.to_pandas()
        df = p.merge(s.rename(columns={"key": "key_a", "sz": "sz_a"}),
                     on="key_a", how="inner") \
              .merge(s.rename(columns={"key": "key_b", "sz": "sz_b"}),
                     on="key_b", how="inner")
        return rd.from_arrow(finish(df))

    postings_ds = ds.map_batches(postings, batch_format="pyarrow")
    inter = postings_ds.groupby("sshard") \
        .map_groups(shard_pairs, batch_format="pandas") \
        .groupby("pshard").map_groups(pair_sums, batch_format="pandas") \
        .map_batches(norm_pairs, batch_format="pyarrow")

    # sizes: O(docs) x 16 B rows, materialized DISTRIBUTED (object
    # store blocks, never the driver) so the two exchange side-inputs
    # below don't re-run the tokenize lineage.
    #
    # The sizes are attached with the module's sentinel-row
    # integer-shard exchange, NOT Dataset.join: Ray's hash-shuffle
    # join finalizes a zero-input-block partition as a SCHEMA-LESS
    # empty table and pa.Table.join then fails with "No match ...
    # for key field reference" whenever the pair side is sparse
    # relative to num_partitions (few distinct keys -> some
    # partitions receive no left blocks at all).  Sentinel rows
    # carry int64 zeros (never nulls) in the off-side columns so no
    # dtype is corrupted in the pandas groups (the as-of-join
    # float64-key lesson).
    sizes = ds.map_batches(doc_sizes, batch_format="pyarrow") \
        .materialize()

    def _attach(pairs_ds, side_key, carry: list[str], out_col: str):
        carry_t = {c: pa.int64() for c in carry}
        all_cols = ["kshard", "side", "key_a", "key_b"] + carry \
            + ["szv"]

        def tag_pairs(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "key_a" not in t.column_names:
                return pa.table(
                    {"kshard": pa.array([], pa.int64()),
                     "side": pa.array([], pa.int8()),
                     "key_a": pa.array([], key_type),
                     "key_b": pa.array([], key_type),
                     **{c: pa.array([], carry_t[c]) for c in carry},
                     "szv": pa.array([], pa.int64())})
            shard = _key_shards(
                t[side_key].to_numpy(zero_copy_only=False), num_shards)
            return pa.table(
                {"kshard": pa.array(shard, pa.int64()),
                 "side": pa.array(np.zeros(t.num_rows, np.int8)),
                 "key_a": t["key_a"], "key_b": t["key_b"],
                 **{c: pc.cast(t[c], pa.int64()) for c in carry},
                 "szv": pa.array(np.zeros(t.num_rows, np.int64))})

        def tag_sizes(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return tag_pairs(t.drop_columns(list(t.column_names)))
            shard = _key_shards(
                t["key"].to_numpy(zero_copy_only=False), num_shards)
            zeros = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table(
                {"kshard": pa.array(shard, pa.int64()),
                 "side": pa.array(np.ones(t.num_rows, np.int8)),
                 "key_a": t["key"], "key_b": t["key"],
                 **{c: zeros for c in carry},
                 "szv": pc.cast(t["sz"], pa.int64())})

        def merge(df):
            def to_arrow(frame):
                return pa.table({
                    "key_a": pa.array(frame["key_a"].to_numpy(),
                                      type=key_type, from_pandas=True),
                    "key_b": pa.array(frame["key_b"].to_numpy(),
                                      type=key_type, from_pandas=True),
                    **{c: pa.array(
                        frame[c].to_numpy().astype(np.int64), pa.int64())
                       for c in carry + [out_col]}})

            p = df.loc[df["side"] == 0,
                       ["key_a", "key_b"] + carry].copy()
            s = df.loc[df["side"] == 1, [side_key, "szv"]] \
                .drop_duplicates(side_key) \
                .rename(columns={"szv": out_col})
            if p.empty:
                p[out_col] = df["szv"].iloc[:0]
                return to_arrow(p)
            return to_arrow(p.merge(s, on=side_key, how="inner"))

        union = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow") \
            .union(sizes.map_batches(tag_sizes, batch_format="pyarrow"))
        assert union.schema().names is not None  # keep lineage eager-safe
        del all_cols
        return union.groupby("kshard").map_groups(
            merge, batch_format="pandas")

    with_a = _attach(inter, "key_a", ["n_common"], "sz_a")
    with_b = _attach(with_a, "key_b", ["n_common", "sz_a"], "sz_b")

    return with_b.map_batches(finish, batch_format="pandas")


def duplicated_spans(ds, text_col: str = "text", key_col: str = "doc_id",
                     k: int = 3, min_docs: int = 2,
                     num_shards: int | None = None):
    """Substring-level exact dedup (the Lee et al. 2022 "Deduplicating
    Training Data" shape, fixed-width variant): for every document,
    the MAXIMAL word spans all of whose k-word windows also appear in
    at least ``min_docs`` distinct documents corpus-wide — the spans a
    training-data pipeline would cut as cross-document boilerplate.

    Window convention = the dedup shingle kernel
    (:func:`_shingle_hashes` — lowercased whitespace words; a doc with
    1..k-1 words contributes ONE whole-text window covering all its
    words; empty/null docs none), identity by 64-bit hash.

    Scale shape: pass 1 is the ngram-novelty df machinery — per batch
    one vectorized shingle pass + per-doc distinct (lexsort), a
    value-counts COMBINER, partial dfs summed on a bounded gram-hash
    shard exchange; windows with df >= ``min_docs`` broadcast once as
    a sorted uint64 membership array (the set is corpus-bounded and
    SHRINKS as min_docs rises).  Pass 2 never exchanges at all: each
    batch probes the broadcast set (searchsorted), and merges each
    doc's overlapping hit windows [p, p+k-1] into maximal spans in one
    numpy pass across ALL docs of the batch (break where the next hit
    starts beyond the running end, or the doc changes).

    -> Dataset(key_col, span_start int64, span_end int64), word
    positions 0-based inclusive.
    """
    spans_fn, _ = _span_pass(ds, text_col, key_col, k, min_docs,
                             num_shards)

    def spans(t: pa.Table) -> pa.Table:
        d, p, e, _keys, _wl, starts, last = spans_fn(t)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if len(starts) == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64())})
        return pa.table({
            key_col: pa.array(keys[d[starts]]),
            "span_start": pa.array(p[starts], pa.int64()),
            "span_end": pa.array(e[last], pa.int64())})

    return ds.map_batches(spans, batch_format="pyarrow")


def _span_pass(ds, text_col: str, key_col: str, k: int, min_docs: int,
               num_shards: int | None):
    """Shared machinery of :func:`duplicated_spans` /
    :func:`remove_duplicated_spans`: builds the duplicated-window
    membership set (one bounded gram-hash exchange, broadcast once)
    and returns ``(per_batch, dup_size)`` where ``per_batch(t)`` ->
    ``(d, p, e, keys, wl, starts, last)``: per-hit doc row index /
    start / inclusive end arrays, batch keys, per-doc word lengths,
    and the merged-span run boundaries (starts/last index into the
    hit arrays)."""
    import ray

    nb = num_shards or _default_shards()

    def df_partial(t: pa.Table) -> pa.Table:
        sh, offs = _shingle_hashes(t[text_col], k)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offs))
        if len(sh) == 0:
            return pa.table({"gshard": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        order = np.lexsort((sh, doc_idx))
        d, h = doc_idx[order], sh[order]
        first = np.ones(len(d), bool)
        if len(d) > 1:
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        h = h[first]                      # distinct (doc, gram)
        hs = np.sort(h, kind="stable")
        starts, sizes = _group_starts(hs)
        ug = hs[starts]
        shard = (mix64(ug, 89) % np.uint64(nb)).astype(np.int64)
        return pa.table({"gshard": pa.array(shard, pa.int64()),
                         "g": pa.array(ug.view(np.int64), pa.int64()),
                         "df": pa.array(sizes, pa.int64())})

    def df_total(t: pa.Table) -> pa.Table:
        g = t.group_by("g").aggregate([("df", "sum")])
        g = g.select(["g", "df_sum"]).rename_columns(["g", "df"])
        g = g.filter(pc.greater_equal(g["df"], min_docs))
        return g.select(["g"])

    dup_ds = ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(df_total, batch_format="pyarrow")
    parts = [b for b in dup_ds.iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    dup = np.sort(pa.concat_tables(parts)["g"]
                  .to_numpy(zero_copy_only=False).view(np.uint64)) \
        if parts else np.empty(0, np.uint64)
    dup_ref = ray.put(dup)

    none = (np.empty(0, np.int64),) * 3

    def per_batch(t: pa.Table):
        member = ray.get(dup_ref)
        sh, offs, wl = _shingle_hashes(t[text_col], k,
                                       return_word_lengths=True)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if len(sh) == 0 or len(member) == 0:
            return (*none, keys, wl, *none[:2])
        n_wins = np.diff(offs)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            n_wins)
        # window start positions (0-based) and inclusive end positions;
        # a short doc's single whole-text window covers [0, wl-1]
        pos = _ranges(n_wins[n_wins > 0]) if n_wins.any() \
            else np.empty(0, np.int64)
        ends = pos + k - 1
        short = np.repeat(wl < k, n_wins)
        ends[short] = np.repeat(wl, n_wins)[short] - 1
        idx = np.searchsorted(member, sh)
        hit = (idx < len(member)) & (member[np.minimum(
            idx, len(member) - 1)] == sh)
        if not hit.any():
            return (*none, keys, wl, *none[:2])
        d, p, e = doc_idx[hit], pos[hit], ends[hit]
        # merge runs: hits are doc-major, position-ascending, and ends
        # ascend with positions, so a span breaks exactly where the
        # next hit starts STRICTLY past the previous end (the SQL
        # islands rule: s > max(e) over preceding; touching merges)
        brk = np.ones(len(d), bool)
        if len(d) > 1:
            brk[1:] = (d[1:] != d[:-1]) | (p[1:] > e[:-1])
        starts = np.flatnonzero(brk)
        last = np.append(starts[1:], len(d)) - 1
        return d, p, e, keys, wl, starts, last

    return per_batch, len(dup)


def remove_duplicated_spans(ds, text_col: str = "text",
                            key_col: str = "doc_id", k: int = 3,
                            min_docs: int = 2,
                            num_shards: int | None = None):
    """Boilerplate removal: rewrite each document with every
    :func:`duplicated_spans` span CUT OUT (all occurrences — the
    policy for cross-document template noise; near-dup keep-one
    policies live in the keep-list machinery instead).

    Same two-phase shape as :func:`duplicated_spans`; the rewrite is
    batch-local and fully vectorized — original-case whitespace words
    as an Arrow list array, a flat keep mask from the merged spans,
    offset rebuild, then ``pc.binary_join`` reassembles every doc in
    one kernel (no per-doc Python).  Docs with null/blank text are
    excluded (they have no words); docs with no duplicated span pass
    through verbatim up to whitespace normalization (single spaces).

    -> Dataset(key_col, clean_text string, n_removed int64).
    """
    spans_fn, _dup_size = _span_pass(ds, text_col, key_col, k,
                                     min_docs, num_shards)

    def clean(t: pa.Table) -> pa.Table:
        d, p, e, keys_np, wl, runs, last = spans_fn(t)
        # merged spans only: (doc, start, end) one row per maximal span
        d, p, e = d[runs], p[runs], e[last]
        # original-case word lists (same split convention as the
        # shingle kernel: whitespace split, "" dropped)
        split = pc.utf8_split_whitespace(
            pc.fill_null(t[text_col], ""))
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        offs = np.asarray(split.offsets, dtype=np.int64)
        flat = split.values.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
        words = flat.to_numpy(zero_copy_only=False)
        mask = words != ""
        csum = np.zeros(len(words) + 1, np.int64)
        np.cumsum(mask, out=csum[1:])
        offs = csum[offs]
        words = words[mask]
        keep = np.ones(len(words), bool)
        if len(d):
            starts = offs[:-1]
            # flat indices covered by each span [p, e] of doc d
            lens = e - p + 1
            flat_idx = np.repeat(starts[d] + p, lens) + _ranges(lens)
            keep[flat_idx] = False
        n_words = np.diff(offs)
        has_text = n_words > 0
        kept_counts = np.add.reduceat(
            keep.astype(np.int64), offs[:-1][has_text]) \
            if has_text.any() and len(keep) else np.empty(0, np.int64)
        kept_words = pa.array(words[keep], pa.string())
        new_offs = np.zeros(int(has_text.sum()) + 1, np.int64)
        np.cumsum(kept_counts, out=new_offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), kept_words)
        joined = pc.binary_join(
            lst, pa.scalar(" ", pa.string()))
        removed = (n_words[has_text] - kept_counts).astype(np.int64)
        ktype = t.schema.field(key_col).type
        return pa.table({
            key_col: pa.array(list(keys_np[has_text]), ktype),
            "clean_text": joined,
            "n_removed": pa.array(removed, pa.int64())})

    return ds.map_batches(clean, batch_format="pyarrow")
