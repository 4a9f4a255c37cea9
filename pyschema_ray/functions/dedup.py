"""Deduplication operators for training corpora, Ray-Data-first:

* exact dedup        — content-hash -> groupby -> keep min key
* MinHash + LSH      — shingle -> k minhashes -> banded buckets ->
                       bucket groupby -> candidate pairs -> Jaccard verify
* SimHash            — 64-bit near-dup signature per doc
* n-gram Jaccard     — exact pairwise verifier

The heavy stages are ``map_batches`` with numpy-vectorized inner
kernels (per-doc reductions via ``reduceat`` over offset arrays, no
per-token Python); the only shuffles are groupbys on hash/bucket keys,
which are uniform by construction.  The reference has no dedup — these
are north-prompt extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import hash_strings, mix64

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_keys(ds, text_col: str = "text", key_col: str = "doc_id"):
    """-> Dataset(key_col) of the kept (minimum-key) row per distinct
    content hash.  Shuffle moves only (hash, key) pairs, never text."""
    def add_hash(t: pa.Table) -> pa.Table:
        h = hash_strings(t[text_col].to_numpy(zero_copy_only=False))
        # int64 view (not uint64): Ray's shuffle materializes group keys
        # through Python ints, where uint64 > 2^63 overflows
        return pa.table({
            "content_hash": pa.array(h.view(np.int64), pa.int64()),
            key_col: t[key_col],
        })

    pairs = ds.map_batches(add_hash, batch_format="pyarrow")
    kept = pairs.groupby("content_hash").min(key_col)
    return kept.map_batches(
        lambda t: t.select([f"min({key_col})"]).rename_columns([key_col]),
        batch_format="pyarrow")


def exact_duplicate_groups(ds, text_col: str = "text",
                           key_col: str = "doc_id"):
    """-> Dataset(content_hash, dup_count) for content appearing >1 time."""
    def add_hash(t: pa.Table) -> pa.Table:
        h = hash_strings(t[text_col].to_numpy(zero_copy_only=False))
        return pa.table({"content_hash": pa.array(h.view(np.int64),
                                                  pa.int64())})

    counts = ds.map_batches(add_hash, batch_format="pyarrow") \
               .groupby("content_hash").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["content_hash", "dup_count"])
                   .filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow")


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


class MinHasher:
    """Actor-pool stage producing k-permutation MinHash signatures.

    ``__init__`` fixes (k, shingle width, seeds) once per actor;
    ``__call__`` computes, per batch: shingle -> one vectorized SipHash
    pass over all shingles -> per-seed splitmix rehash -> per-doc min
    via ``np.minimum.reduceat``.  Output adds ``minhash`` as a
    fixed-size-list<uint64> column."""

    def __init__(self, text_col: str = "text", num_hashes: int = 64,
                 shingle_words: int = 3, out_col: str = "minhash"):
        self.text_col = text_col
        self.k = num_hashes
        self.w = shingle_words
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        flat, offsets = _word_shingles(texts, self.w)
        n = len(texts)
        sig = np.full((n, self.k), U64_MAX, dtype=np.uint64)
        if flat:
            base = hash_strings(np.asarray(flat, dtype=object))
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
                           concurrency=(1, 4)):
    """-> Dataset(key_a, key_b) of candidate near-duplicate pairs
    (co-bucketed in >=1 band, deduplicated).  Pipeline:
    map_batches(MinHasher actor pool) -> band explode -> groupby bucket
    -> per-group pair emission -> distinct."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(text_col=text_col, num_hashes=num_hashes,
                                   shingle_words=shingle_words),
        batch_format="pyarrow", concurrency=concurrency)
    sigs = sigs.map_batches(
        lambda t: t.filter(pc.invert(t["minhash_empty"])),
        batch_format="pyarrow")
    buckets = sigs.map_batches(
        lambda t: lsh_band_buckets(t, key_col=key_col, bands=bands),
        batch_format="pyarrow")

    # shuffle on a SMALL mod-bucket (co-locating whole (band, bucket)
    # groups), never on the raw (band, bucket) pair: a groupby with one
    # tiny group per bucket is pathological in any engine at scale
    nb = 64

    def add_mod(t: pa.Table) -> pa.Table:
        m = mix64(np.asarray(t["bucket"].to_numpy(zero_copy_only=False),
                             dtype=np.uint64),
                  7) % np.uint64(nb)
        return t.append_column("shard", pa.array(m.astype(np.int64)))

    def emit_pairs(df):
        import pandas as pd
        dup = df[df.duplicated(["band", "bucket"], keep=False)]
        a_out, b_out = [], []
        for _, g in dup.groupby(["band", "bucket"], sort=False):
            keys = sorted(g[key_col].tolist())
            for i in range(len(keys)):
                for j in range(i + 1, len(keys)):
                    a_out.append(keys[i])
                    b_out.append(keys[j])
        return pd.DataFrame({"key_a": a_out, "key_b": b_out})

    pairs = buckets.map_batches(add_mod, batch_format="pyarrow") \
        .groupby("shard").map_groups(emit_pairs, batch_format="pandas")
    # same pair can surface from several bands -> distinct
    return pairs.groupby(["key_a", "key_b"]).count().drop_columns(["count()"])


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
# composed dedup pipeline
# ---------------------------------------------------------------------------

def dedup_keep_keys(ds, text_col: str = "text", key_col: str = "doc_id",
                    jaccard_threshold: float = 0.8, num_hashes: int = 64,
                    shingle_words: int = 3, bands: int = 16,
                    concurrency=(1, 4)) -> pa.Table:
    """End-to-end dedup: exact (content-hash) THEN near-dup
    (MinHash+LSH candidates -> exact Jaccard verify -> union-find) —
    returns the kept keys (minimum key per duplicate component).

    Distributed stages: exact-dedup groupby, MinHash actor pool, LSH
    shard groupby.  Driver-side: union-find over the VERIFIED pair list
    and the Jaccard verification text fetch — both duplicate-rate
    sized, documented as the small-side assumption."""
    import pyarrow.compute as pc  # noqa: F401  (local alias clarity)

    kept_exact = pa.concat_tables(
        exact_dedup_keys(ds, text_col, key_col)
        .iter_batches(batch_format="pyarrow"))
    kept_set = set(kept_exact[key_col].to_pylist())

    cand = minhash_lsh_candidates(ds, text_col, key_col, num_hashes,
                                  shingle_words, bands, concurrency)
    cand_tbl = pa.concat_tables(
        [t for t in cand.iter_batches(batch_format="pyarrow")
         if t.num_rows]
        or [pa.table({"key_a": pa.array([], pa.int64()),
                      "key_b": pa.array([], pa.int64())})])
    # fetch candidate docs (duplicate-rate sized) for exact verification
    cand_keys = set(cand_tbl["key_a"].to_pylist()) \
        | set(cand_tbl["key_b"].to_pylist())
    if cand_keys:
        key_arr = pa.array(sorted(cand_keys))
        docs = pa.concat_tables(ds.map_batches(
            lambda t: t.filter(pc.is_in(t[key_col], value_set=key_arr))
                       .select([key_col, text_col]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
        verified = jaccard_verify_pairs(cand_tbl, docs, text_col, key_col,
                                        shingle_words, jaccard_threshold)
    else:
        verified = pa.table({"key_a": pa.array([], pa.int64()),
                             "key_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})

    # union-find over verified near-dup pairs
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified["key_a"].to_pylist(),
                    verified["key_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    drop = {k for k in kept_set if find(k) != k}
    keep = sorted(kept_set - drop)
    return pa.table({key_col: pa.array(keep)})


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
        texts = t[self.text_col].to_pylist()
        words: list[str] = []
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, s in enumerate(texts):
            if s:
                words.extend(s.lower().split())
            offsets[i + 1] = len(words)
        sig = np.zeros(len(texts), dtype=np.uint64)
        if words:
            h = hash_strings(np.asarray(words, dtype=object))
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
                      max_hamming: int = 3, concurrency=(1, 4)):
    """Near-dup pairs by SimHash: docs whose signatures agree on all
    four 16-bit chunks after masking ``max_hamming`` bits are candidate
    pairs (standard multi-index trick: any pair within Hamming distance
    3 shares at least one of 4 exact 16-bit chunks).  Returns
    (key_a, key_b, hamming)."""
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
    # (chunk_id, chunk) groups on a few integer shards
    nb = 64

    def add_mod(t: pa.Table) -> pa.Table:
        base = (np.asarray(t["chunk"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
                + (np.asarray(t["chunk_id"].to_numpy(zero_copy_only=False),
                              dtype=np.uint64) << np.uint64(17)))
        m = mix64(base, 11) % np.uint64(nb)
        return t.append_column("shard", pa.array(m.astype(np.int64)))

    def emit(df):
        import pandas as pd
        a_out, b_out, h_out = [], [], []
        dup = df[df.duplicated(["chunk_id", "chunk"], keep=False)]
        for _, g in dup.groupby(["chunk_id", "chunk"], sort=False):
            recs = sorted(zip(g[key_col], g["simhash"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    x = np.uint64(recs[i][1]) ^ np.uint64(recs[j][1])
                    ham = bin(int(x)).count("1")
                    if ham <= max_hamming and recs[i][0] != recs[j][0]:
                        a_out.append(recs[i][0])
                        b_out.append(recs[j][0])
                        h_out.append(ham)
        return pd.DataFrame({"key_a": a_out, "key_b": b_out,
                             "hamming": h_out})

    pairs = exploded.map_batches(add_mod, batch_format="pyarrow") \
        .groupby("shard").map_groups(emit, batch_format="pandas")
    return pairs.groupby(["key_a", "key_b"]).min("hamming")
