"""Bloom-filter membership for incremental corpus admission at scale.

:func:`novel_keys_vs_existing` (dedup.py) is the EXACT path: both
corpora ship (hash128, key) rows through one exchange per increment.
The Bloom path trades a tunable false-positive rate for a radically
cheaper steady state: the existing corpus is hashed ONCE into a bit
array (a persistable artifact of ``m/8`` bytes), and every future
crawl increment probes it with a single broadcast ``map_batches`` —
no shuffle, and the existing corpus is never re-read.  False
positives drop novel docs (bounded by ``fp_rate``); false negatives
are impossible, so nothing already seen is ever re-admitted — the
safe direction for dedup.

Standard construction (Bloom 1970; Kirsch & Mitzenmacher 2006 double
hashing — public algorithms): ``k`` bit positions per key derived as
``(h1 + i*h2) mod m`` from two keyed SipHashes (the package's stable
``hash_strings`` / ``hash_strings2``), ``m`` and ``k`` sized from the
target capacity and fp rate by the textbook formulas.

Distributed build: per batch, bit indices reduce LOCALLY to
(word_index, or_mask) pairs (one sort + ``np.bitwise_or.reduceat``);
the exchange then carries at most ``m/64`` word rows per batch —
bounded by the filter size, never by corpus rows — and a word-shard
``map_groups`` ORs them; the driver assembles the dense ``uint64``
array (driver memory = filter size, by construction the artifact
that must fit everywhere anyway).  Probe: the word array ships once
via ``ray.put``; per batch one gather + bitwise AND over all k
probes.  Everything is numpy; no Python loop over rows anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import (default_exchange_shards, hash_strings,
                        hash_strings2)


def bloom_params(capacity: int, fp_rate: float = 0.01):
    """Textbook sizing: m = -n ln p / (ln 2)^2, k = (m/n) ln 2.
    Returns (m_bits rounded up to a multiple of 64, k >= 1)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if not 0.0 < fp_rate < 1.0:
        raise ValueError("fp_rate must be in (0, 1)")
    m = int(math.ceil(-capacity * math.log(fp_rate) / math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _bit_indices(texts: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n*k,) bit positions via double hashing; h2 forced odd so the
    probe sequence cycles through all residues even when m is a
    power of two."""
    h1 = hash_strings(texts)
    h2 = hash_strings2(texts) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    idx = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return idx.reshape(-1)


def _or_pairs(idx: np.ndarray):
    """bit positions -> (unique word indices, OR-ed uint64 masks)."""
    words = (idx >> np.uint64(6)).astype(np.int64)
    masks = np.uint64(1) << (idx & np.uint64(63))
    order = np.argsort(words, kind="stable")
    words, masks = words[order], masks[order]
    starts = np.flatnonzero(np.r_[True, words[1:] != words[:-1]])
    return words[starts], np.bitwise_or.reduceat(masks, starts)


class BloomFilter:
    """Immutable probe-side view: dense uint64 word array + params."""

    __slots__ = ("words", "m_bits", "k")

    def __init__(self, words: np.ndarray, m_bits: int, k: int):
        self.words = words
        self.m_bits = m_bits
        self.k = k

    def contains(self, texts) -> np.ndarray:
        """Vectorized membership: True = maybe present (fp_rate),
        False = DEFINITELY absent."""
        texts = np.asarray(texts, dtype=object)
        if len(texts) == 0:
            return np.zeros(0, bool)
        idx = _bit_indices(texts, self.m_bits, self.k)
        w = (idx >> np.uint64(6)).astype(np.int64)
        m = np.uint64(1) << (idx & np.uint64(63))
        hit = (self.words[w] & m) != 0
        return hit.reshape(len(texts), self.k).all(axis=1)

    def fill_fraction(self) -> float:
        """Fraction of set bits (sanity probe for over-capacity)."""
        return float(np.unpackbits(
            self.words.view(np.uint8)).sum()) / self.m_bits


def bloom_build(ds, col: str = "text", capacity: int | None = None,
                fp_rate: float = 0.01,
                num_shards: int | None = None) -> BloomFilter:
    """Build a Bloom filter over ``col`` of a Dataset (nulls skipped).

    ``capacity`` sizes the filter; when None it is taken from
    ``ds.count()`` (one extra metadata-cheap pass — pass it explicitly
    in production where the planned corpus size is known)."""
    if capacity is None:
        capacity = max(1, ds.count())
    m_bits, k = bloom_params(capacity, fp_rate)
    nb = min(num_shards or default_exchange_shards(), m_bits // 64)

    def partial(t: pa.Table) -> pa.Table:
        v = t.filter(pc.is_valid(t[col]))[col] \
            .to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"wshard": pa.array([], pa.int64()),
                             "word_idx": pa.array([], pa.int64()),
                             "mask": pa.array([], pa.uint64())})
        words, masks = _or_pairs(_bit_indices(v, m_bits, k))
        return pa.table({
            "wshard": pa.array(words % np.int64(nb), pa.int64()),
            "word_idx": pa.array(words, pa.int64()),
            "mask": pa.array(masks, pa.uint64()),
        })

    def reduce_shard(t: pa.Table) -> pa.Table:
        w = t["word_idx"].to_numpy(zero_copy_only=False)
        m = t["mask"].to_numpy(zero_copy_only=False).astype(np.uint64)
        words, masks = w.astype(np.uint64), m
        order = np.argsort(words, kind="stable")
        words, masks = words[order], masks[order]
        starts = np.flatnonzero(np.r_[True, words[1:] != words[:-1]])
        return pa.table({
            "word_idx": pa.array(words[starts].astype(np.int64),
                                 pa.int64()),
            "mask": pa.array(np.bitwise_or.reduceat(masks, starts),
                             pa.uint64()),
        })

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wshard") \
        .map_groups(lambda t: reduce_shard(t.drop_columns(["wshard"])),
                    batch_format="pyarrow")
    dense = np.zeros(m_bits // 64, np.uint64)
    for b in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            wi = b["word_idx"].to_numpy(zero_copy_only=False)
            mk = b["mask"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            dense[wi] |= mk
    return BloomFilter(dense, m_bits, k)


def bloom_probe(ds, bloom: BloomFilter, col: str = "text",
                out_col: str = "maybe_seen"):
    """Append a boolean ``out_col``: True = maybe in the filter
    (<= fp_rate wrong), False = definitely novel.  The word array
    ships ONCE via ``ray.put``; null values probe as False."""
    import ray

    ref = ray.put(bloom.words)
    m_bits, k = bloom.m_bits, bloom.k

    def fn(t: pa.Table) -> pa.Table:
        words = ray.get(ref)
        bf = BloomFilter(words, m_bits, k)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        res = np.zeros(t.num_rows, bool)
        if valid.any():
            v = t[col].to_numpy(zero_copy_only=False)[valid]
            res[valid] = bf.contains(v)
        return t.append_column(out_col, pa.array(res, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def novel_keys_vs_bloom(new_ds, bloom: BloomFilter,
                        text_col: str = "text",
                        key_col: str = "doc_id"):
    """Keys of new documents whose content is DEFINITELY not in the
    seen-corpus filter — the shuffle-free admission gate (a <=fp_rate
    sliver of genuinely novel docs is conservatively dropped; nothing
    seen is ever admitted).  Null-text rows are excluded, matching
    :func:`novel_keys_vs_existing`."""
    probed = bloom_probe(
        new_ds.select_columns([key_col, text_col]), bloom,
        col=text_col, out_col="maybe_seen")

    def emit(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[text_col]),
                             pc.invert(t["maybe_seen"])))
        return t.select([key_col])

    return probed.map_batches(emit, batch_format="pyarrow")


def bloom_semi_join(fact, dim, on: str, right_on: str | None = None,
                    fp_rate: float = 0.001,
                    dim_capacity: int | None = None,
                    num_partitions: int | None = None,
                    size_hint_bytes: int | None = None):
    """Bloom semi-join pushdown: INNER shuffle join with the fact side
    pre-pruned against a Bloom filter of the dimension's join keys —
    the classic runtime-filter technique for shrinking an all-to-all
    exchange when the dimension is selective.

    At 100 TB the win is structural: the fact side normally ships
    EVERY row through the join shuffle; with a selective dim (e.g. 2%
    of customers) the Bloom probe — one broadcast word array, one
    gather+AND per batch, no exchange — drops ~98% of fact rows
    BEFORE they ever hit the wire.  The result stays EXACT for inner
    joins: a false positive (<= fp_rate) only lets a non-matching row
    into the exact hash join, which then drops it; false negatives
    are impossible, so no matching row is ever lost.  (Outer joins
    must not prune their outer side — this helper is inner-only by
    contract.)

    The dim side streams twice (once to build the filter, once into
    the join) — the cheap side by definition.  Returns the joined
    Dataset."""
    import ray

    from .joins import shuffle_join
    from ..sketches import cached_broadcast

    rkey = right_on or on
    bloom = bloom_build(dim.select_columns([rkey]), col=rkey,
                        capacity=dim_capacity, fp_rate=fp_rate)
    ref = ray.put(bloom.words)
    m_bits, k = bloom.m_bits, bloom.k

    def prune(t: pa.Table) -> pa.Table:
        words = cached_broadcast(ref, lambda w: w)
        bf = BloomFilter(words, m_bits, k)
        valid = pc.is_valid(t[on]).to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, bool)
        if valid.any():
            v = t[on].to_numpy(zero_copy_only=False)[valid]
            keep[valid] = bf.contains(v)
        return t.filter(pa.array(keep))

    pruned = fact.map_batches(prune, batch_format="pyarrow")

    # A fully-pruned fact side would reach Ray's hash join as
    # fabricated SCHEMA-LESS empty blocks (empty input partitions never
    # call the UDF — the r4 empty-RefBundle class) and the join then
    # fails to resolve the key field.  Guard with ONE sentinel row
    # whose key the Bloom itself proves absent from the dim (contains()
    # False => definitely not present), so the exact inner join drops
    # it and the left side always carries its schema.
    fact_schema = pa.schema(fact.schema().base_schema)
    ktype = fact_schema.field(on).type
    sent_key = None
    for i in range(64):
        if pa.types.is_integer(ktype):
            # stay inside the key type's range (an int32 key column
            # rejects a 2^62 sentinel)
            lo = 0 if pa.types.is_unsigned_integer(ktype) \
                else -(2 ** (ktype.bit_width - 1))
            cand = lo + i
        else:
            cand = f"\x00__psr_bloom_sentinel_{i}__"
        if not bloom.contains(np.array([cand], dtype=object))[0]:
            sent_key = cand
            break
    if sent_key is not None:
        import ray.data

        sentinel = pa.table({
            f.name: pa.array([sent_key], f.type) if f.name == on
            else pa.nulls(1, f.type) for f in fact_schema})
        pruned = pruned.union(ray.data.from_arrow(sentinel))

    return shuffle_join(pruned, dim, on, right_on=rkey,
                        join_type="inner",
                        num_partitions=num_partitions,
                        size_hint_bytes=size_hint_bytes)
