"""N-gram language-model quality scoring (the CCNet-style LM filter).

A bigram LM is trained ON the corpus (or a reference corpus) and every
document is scored by its total log-probability — the classic
perplexity-based quality signal for pretraining-data curation: docs
whose word transitions are unlike the reference distribution (boiler-
plate, gibberish, wrong language) score low.

Float discipline: per-token log-probabilities are quantized to INTEGER
milli-nats (``round(ln(p) * 1000)``, half away from zero) BEFORE the
per-document sum, so the distributed result is exact, order-
independent, and SQL-oracle-reproducible (the same rule all the
``*_cents`` aggregates follow).  A boundary flip requires ``ln(p)*1000``
to sit within one float ulp of an exact ``.5`` — ~2^-40 per distinct
bigram, tolerated like the module-wide 2^-64 hash collisions.

Scale shape:

* TRAIN: one ``map_batches`` pass builds per-batch (first-word-hash,
  bigram-hash) count partials (value-count combiner — the exchange
  carries unique bigrams per batch, never one row per token), partials
  sum on a bounded bigram-hash shard exchange.  Vocabulary size (the
  smoothing denominator) comes from a distinct-word-hash count on the
  same kind of exchange.
* The finished LM is vocabulary-bounded, NOT corpus-bounded; it is
  collected once and broadcast via ``ray.put`` as sorted uint64 key
  arrays (binary-search probes, no dict).  At web scale prune with
  ``min_count`` (counts below it are dropped; their probes fall back
  to the unseen path) — the knob is loud, not silent: smoothing makes
  the score well-defined either way and the docstring IS the contract.
* SCORE: one ``map_batches`` pass per corpus — two ``searchsorted``
  probes per bigram, one exact int64 per-doc reduction.  No shuffle.

Word identity matches the repo convention (lowercased whitespace
tokens, empty tokens dropped) so the SQL oracle can reproduce it with
``regexp_split_to_array(lower(trim(text)), '\\s+')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import hash_strings, mix64
from .dedup import _default_shards, _group_starts

_BIGRAM_P = np.uint64(0x9E3779B97F4A7C15)


def _word_hashes(texts):
    """(flat uint64 word hashes, per-doc int64 offsets): ONE Arrow
    lowercase+split over the batch, one SipHash pass, empty tokens
    dropped with offsets kept consistent (the _shingle_hashes
    convention, k=1, no polynomial/mix — raw word identity)."""
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
    mask = words != ""
    csum = np.zeros(len(words) + 1, np.int64)
    np.cumsum(mask, out=csum[1:])
    offs = csum[offs]
    wh = hash_strings(words[mask]) if mask.any() else np.empty(0, np.uint64)
    return wh, offs


def _doc_bigrams(wh: np.ndarray, offs: np.ndarray):
    """(h1, h2, bigram-hash, per-bigram doc index) for all ADJACENT
    word pairs that do not cross a document boundary."""
    n_docs = len(offs) - 1
    wl = np.diff(offs)
    if len(wh) < 2:
        e = np.empty(0, np.uint64)
        return e, e, e, np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), wl)
    valid = doc_idx[:-1] == doc_idx[1:]
    h1 = wh[:-1][valid]
    h2 = wh[1:][valid]
    with np.errstate(over="ignore"):
        b = mix64(h1 * _BIGRAM_P + h2, 73)
    return h1, h2, b, doc_idx[:-1][valid]


def bigram_lm_counts(ds, text_col: str = "text",
                     num_shards: int | None = None, min_count: int = 1):
    """Distributed bigram counts -> Dataset(h1 uint64-as-int64,
    b uint64-as-int64, n int64): ``b`` identifies the (w1, w2) pair,
    ``h1`` its first word (so first-word totals — the conditional-
    probability denominator — are derivable by grouping on h1)."""
    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        wh, offs = _word_hashes(t[text_col])
        h1, _h2, b, _d = _doc_bigrams(wh, offs)
        if len(b) == 0:
            return pa.table({"bshard": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # combiner: unique bigrams per batch with counts
        order = np.argsort(b, kind="stable")
        bs, h1s = b[order], h1[order]
        first = np.ones(len(bs), bool)
        first[1:] = bs[1:] != bs[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(bs))).astype(np.int64)
        ub, uh1 = bs[starts], h1s[starts]
        shard = (mix64(ub, 79) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({"bshard": pa.array(shard, pa.int64()),
                         "h1": pa.array(uh1.view(np.int64), pa.int64()),
                         "b": pa.array(ub.view(np.int64), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by(["h1", "b"]).aggregate([("n", "sum")])
        g = g.select(["h1", "b", "n_sum"]).rename_columns(["h1", "b", "n"])
        if min_count > 1:
            g = g.filter(pc.greater_equal(g["n"], min_count))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bshard").map_groups(total, batch_format="pyarrow")


def distinct_word_count(ds, text_col: str = "text",
                        num_shards: int | None = None) -> int:
    """EXACT corpus vocabulary size (distinct lowercased whitespace
    words, 64-bit hash identity): per-batch unique word hashes
    (combiner), hash-shard exchange, per-shard distinct count, driver
    sums ``num_shards`` integers."""
    num_shards = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        wh, _offs = _word_hashes(t[text_col])
        u = np.unique(wh)
        shard = (mix64(u, 83) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({"wshard": pa.array(shard, pa.int64()),
                         "wh": pa.array(u.view(np.int64), pa.int64())})

    def cnt(t: pa.Table) -> pa.Table:
        n = len(np.unique(t["wh"].to_numpy(zero_copy_only=False)))
        return pa.table({"n_distinct": pa.array([n], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(cnt, batch_format="pyarrow")
    return int(parts.sum("n_distinct") or 0)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL round() semantics (half away from zero) — numpy's
    half-to-even would disagree on exact .5 boundaries."""
    return np.copysign(np.floor(np.abs(x) + 0.5), x)


def bigram_lm_scores(ds, text_col: str = "text", key_col: str = "doc_id",
                     train_ds=None, num_shards: int | None = None,
                     min_count: int = 1):
    """Score every document of ``ds`` under an add-one-smoothed bigram
    LM trained on ``train_ds`` (default: ``ds`` itself — self-scoring,
    the corpus-outlier signal).  Per bigram ``(w1, w2)``::

        p = (c(w1, w2) + 1) / (c1(w1) + V)

    where ``c1(w1) = sum_w2 c(w1, w2)`` (so the conditional
    distribution normalizes) and ``V`` is the training vocabulary
    size; unseen words/bigrams probe to count 0 and take the smoothed
    fallback.  -> Dataset(key_col, n_tokens, n_bigrams, sum_mlogp) —
    ``sum_mlogp`` is the exact int64 sum of per-bigram milli-nat
    log-probs; mean log-prob / perplexity are one division away and
    deliberately not materialized as floats.

    PRUNED-DENOMINATOR SEMANTICS with ``min_count > 1``: the c1
    totals are derived from the PRUNED bigram table (bigrams below
    ``min_count`` are dropped before totalling), so
    ``c1(w1) = sum_w2 [c(w1, w2) >= min_count] * c(w1, w2)`` — the
    conditional probabilities then normalize over the RETAINED
    bigrams plus smoothing mass, not the raw distribution.  This is
    deliberate: the pruned table is the only artifact shipped to
    scorers (shipping unpruned totals would defeat the pruning's
    memory bound).  The default ``min_count=1`` (and the
    oracle-checked query) is exactly the formula above.
    """
    import ray

    num_shards = num_shards or _default_shards()
    train = train_ds if train_ds is not None else ds

    lm = _collect_lm(bigram_lm_counts(train, text_col, num_shards,
                                      min_count))
    vocab = distinct_word_count(train, text_col, num_shards)
    lm_ref = ray.put(lm)

    def score(t: pa.Table) -> pa.Table:
        b_keys, b_n, w_keys, w_n = ray.get(lm_ref)
        wh, offs = _word_hashes(t[text_col])
        h1, _h2, b, bdoc = _doc_bigrams(wh, offs)
        n_docs = t.num_rows
        wl = np.diff(offs)
        if len(b):
            if len(b_keys):
                pos = np.clip(np.searchsorted(b_keys, b), 0,
                              len(b_keys) - 1)
                c12 = np.where(b_keys[pos] == b, b_n[pos], 0)
            else:
                c12 = np.zeros(len(b), np.int64)
            if len(w_keys):
                wpos = np.clip(np.searchsorted(w_keys, h1), 0,
                               len(w_keys) - 1)
                c1 = np.where(w_keys[wpos] == h1, w_n[wpos], 0)
            else:
                c1 = np.zeros(len(h1), np.int64)
            p = (c12 + 1.0) / (c1 + float(max(vocab, 1)))
            mlp = _round_half_away(np.log(p) * 1000.0)
            # float-weight bincount is EXACT here: integer-valued
            # weights, per-doc sums far below 2^53
            sums = np.bincount(bdoc, weights=mlp,
                               minlength=n_docs).astype(np.int64)
        else:
            sums = np.zeros(n_docs, np.int64)
        return pa.table({
            key_col: t[key_col],
            "n_tokens": pa.array(wl, pa.int64()),
            "n_bigrams": pa.array(np.maximum(wl - 1, 0), pa.int64()),
            "sum_mlogp": pa.array(sums, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def _collect_lm(counts_ds):
    """Materialize the vocabulary-bounded LM once: sorted bigram-hash
    keys + counts, and first-word-hash keys + totals (the c1 table,
    derived by one driver groupby over unique-bigram rows)."""
    tables = [b for b in counts_ds.iter_batches(batch_format="pyarrow", batch_size=None)
              if b.num_rows]
    if not tables:
        e = np.empty(0, np.uint64)
        z = np.empty(0, np.int64)
        return e, z, e, z
    t = pa.concat_tables(tables)
    b = t["b"].to_numpy(zero_copy_only=False).view(np.uint64)
    h1 = t["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = t["n"].to_numpy(zero_copy_only=False)
    bo = np.argsort(b, kind="stable")
    b_keys, b_n = b[bo], n[bo].astype(np.int64)
    ho = np.argsort(h1, kind="stable")
    h1s, ns = h1[ho], n[ho]
    first = np.ones(len(h1s), bool)
    if len(h1s) > 1:
        first[1:] = h1s[1:] != h1s[:-1]
    starts = np.flatnonzero(first)
    w_keys = h1s[starts]
    w_n = np.add.reduceat(ns, starts).astype(np.int64) if len(ns) \
        else np.empty(0, np.int64)
    return b_keys, b_n, w_keys, w_n


def ngram_novelty_scores(ds, text_col: str = "text",
                         key_col: str = "doc_id", n: int = 3,
                         min_df: int = 2,
                         num_shards: int | None = None):
    """Boilerplate / memorization audit: for every document, how many
    of its DISTINCT word n-grams also appear in at least ``min_df``
    documents corpus-wide.  High ``n_common / n_grams`` flags
    template-heavy or duplicated prose; the inverse is a novelty
    signal for curriculum/dedup decisions.

    Document frequency is by DISTINCT documents (a doc repeating its
    own n-gram does not make that n-gram "shared").  The n-gram
    definition matches the dedup shingle convention
    (:func:`~pyschema_ray.functions.dedup._shingle_hashes` —
    lowercased whitespace words; a doc with 1..n-1 words contributes
    ONE whole-text gram; empty/null docs contribute none), so the SQL
    oracle reproduces it with the ngram_jaccard_pairs gram CTE.

    Scale shape: per batch one vectorized shingle pass + per-doc
    dedup (lexsort), then a value-counts COMBINER (each doc's grams
    appear once, so per-batch gram counts sum to exact distinct-doc
    df across batches — rows are whole documents); partial dfs sum on
    a bounded gram-hash shard exchange.  Grams with ``df >= min_df``
    (the corpus-bounded boilerplate set — at web scale raise
    ``min_df``; the set SHRINKS as the corpus grows noisier) are
    collected once and broadcast as a sorted uint64 membership array;
    the scoring pass is searchsorted probes, no shuffle.

    -> Dataset(key_col, n_grams int64, n_common int64).
    """
    import ray

    from .dedup import _shingle_hashes

    num_shards = num_shards or _default_shards()

    def _doc_distinct(t: pa.Table):
        """(distinct gram hashes per doc, per-doc counts) — the
        ngram_jaccard postings dedup (one lexsort per batch)."""
        sh, offs = _shingle_hashes(t[text_col], n)
        n_docs = t.num_rows
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                            np.diff(offs))
        order = np.lexsort((sh, doc_idx))
        d, h = doc_idx[order], sh[order]
        first = np.ones(len(d), bool)
        if len(d) > 1:
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        return d[first], h[first], n_docs

    def df_partial(t: pa.Table) -> pa.Table:
        _d, h, _n = _doc_distinct(t)
        if len(h) == 0:
            return pa.table({"gshard": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        order = np.argsort(h, kind="stable")
        hs = h[order]
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(hs))).astype(np.int64)
        ug = hs[starts]
        shard = (mix64(ug, 89) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({"gshard": pa.array(shard, pa.int64()),
                         "g": pa.array(ug.view(np.int64), pa.int64()),
                         "df": pa.array(counts, pa.int64())})

    def df_total(t: pa.Table) -> pa.Table:
        g = t.group_by("g").aggregate([("df", "sum")])
        g = g.select(["g", "df_sum"]).rename_columns(["g", "df"])
        return g.filter(pc.greater_equal(g["df"], min_df))

    common_ds = ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(df_total, batch_format="pyarrow")
    tables = [b for b in common_ds.iter_batches(batch_format="pyarrow", batch_size=None)
              if b.num_rows]
    common = np.sort(pa.concat_tables(tables)["g"]
                     .to_numpy(zero_copy_only=False)
                     .view(np.uint64)) if tables else np.empty(0, np.uint64)
    common_ref = ray.put(common)

    def score(t: pa.Table) -> pa.Table:
        keys = ray.get(common_ref)
        d, h, n_docs = _doc_distinct(t)
        n_grams = np.bincount(d, minlength=n_docs).astype(np.int64)
        if len(h) and len(keys):
            pos = np.clip(np.searchsorted(keys, h), 0, len(keys) - 1)
            hit = keys[pos] == h
            n_common = np.bincount(d[hit], minlength=n_docs) \
                .astype(np.int64)
        else:
            n_common = np.zeros(n_docs, np.int64)
        return pa.table({
            key_col: t[key_col],
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_common": pa.array(n_common, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_log_ratio(ds, target_ds, text_col: str = "text",
                        key_col: str = "doc_id",
                        num_shards: int | None = None,
                        min_count: int = 1):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document under TWO add-one-smoothed bigram LMs — one trained on
    ``target_ds`` (the domain you want more of), one on the corpus
    itself — and emit the exact int64 milli-nat log-likelihood ratio
    ``mlog_ratio = mlogp_target - mlogp_corpus``.  Rank or
    hash-sample by the ratio to up-weight target-like documents.

    Same physical plan as :func:`bigram_lm_scores` doubled: two
    vocabulary-bounded count exchanges (one per LM), both models
    broadcast ONCE via ray.put, then a single scoring scan over the
    corpus computes both sums per document — the corpus text is read
    once, never reshuffled.  All per-bigram quantities are quantized
    to milli-nats before summing, so results are order-independent
    and the SQL oracle reproduces them with ln()/round().

    -> Dataset(key_col, n_bigrams, mlogp_target, mlogp_corpus,
               mlog_ratio — all int64).
    """
    import ray

    num_shards = num_shards or _default_shards()

    lm_t = _collect_lm(bigram_lm_counts(target_ds, text_col,
                                        num_shards, min_count))
    lm_c = _collect_lm(bigram_lm_counts(ds, text_col, num_shards,
                                        min_count))
    v_t = distinct_word_count(target_ds, text_col, num_shards)
    v_c = distinct_word_count(ds, text_col, num_shards)
    ref = ray.put((lm_t, lm_c))

    def _mlp(b, h1, lm, vocab: int) -> np.ndarray:
        b_keys, b_n, w_keys, w_n = lm
        if len(b_keys):
            pos = np.clip(np.searchsorted(b_keys, b), 0,
                          len(b_keys) - 1)
            c12 = np.where(b_keys[pos] == b, b_n[pos], 0)
        else:
            c12 = np.zeros(len(b), np.int64)
        if len(w_keys):
            wpos = np.clip(np.searchsorted(w_keys, h1), 0,
                           len(w_keys) - 1)
            c1 = np.where(w_keys[wpos] == h1, w_n[wpos], 0)
        else:
            c1 = np.zeros(len(h1), np.int64)
        p = (c12 + 1.0) / (c1 + float(max(vocab, 1)))
        return _round_half_away(np.log(p) * 1000.0)

    def score(t: pa.Table) -> pa.Table:
        wh, offs = _word_hashes(t[text_col])
        h1, _h2, b, bdoc = _doc_bigrams(wh, offs)
        n_docs = t.num_rows
        wl = np.diff(offs)
        if len(b):
            lmt, lmc = ray.get(ref)
            mt = _mlp(b, h1, lmt, v_t)
            mc = _mlp(b, h1, lmc, v_c)
            st = np.bincount(bdoc, weights=mt,
                             minlength=n_docs).astype(np.int64)
            sc = np.bincount(bdoc, weights=mc,
                             minlength=n_docs).astype(np.int64)
        else:
            st = np.zeros(n_docs, np.int64)
            sc = np.zeros(n_docs, np.int64)
        return pa.table({
            key_col: t[key_col],
            "n_bigrams": pa.array(np.maximum(wl - 1, 0), pa.int64()),
            "mlogp_target": pa.array(st, pa.int64()),
            "mlogp_corpus": pa.array(sc, pa.int64()),
            "mlog_ratio": pa.array(st - sc, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def vocab_oov(ds, ref_ds, text_col: str = "text",
              num_shards: int | None = None):
    """Out-of-vocabulary coverage of one corpus against another's
    vocabulary — the tokenizer/domain-shift health check (how much of
    the eval split's text does a train-split vocabulary cover?).
    Token- and type-level OOV counts for ``ds`` measured against the
    distinct words of ``ref_ds``.

    No vocabulary broadcast (a 100 TB reference vocabulary may not fit
    one task): the reference side ships per-batch DISTINCT word
    hashes, the measured side ships per-batch (word hash, token count)
    partials, both onto ONE word-hash shard exchange; each shard
    resolves membership with a sorted probe and emits 4-int partials.

    Per-word 64-bit hash identity (2^-64 collisions), same
    tokenization as every lm.py operator (lowercase, whitespace).

    -> Dataset with one row: (n_tokens, n_oov_tokens, n_types,
       n_oov_types — all int64).
    """
    import ray.data

    nb = num_shards or _default_shards()
    OUT = ("n_tokens", "n_oov_tokens", "n_types", "n_oov_types")

    def ref_rows(t: pa.Table) -> pa.Table:
        wh, _ = _word_hashes(t[text_col])
        u = np.unique(wh)
        return pa.table({
            "h": pa.array(u.view(np.int64), pa.int64()),
            "n": pa.array(np.zeros(len(u), np.int64)),
            "tag": pa.array(np.zeros(len(u), np.int8)),
            "wshard": pa.array((u % np.uint64(nb)).astype(np.int64),
                               pa.int64())})

    def measured_rows(t: pa.Table) -> pa.Table:
        wh, _ = _word_hashes(t[text_col])
        u, c = np.unique(wh, return_counts=True)
        return pa.table({
            "h": pa.array(u.view(np.int64), pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
            "tag": pa.array(np.ones(len(u), np.int8)),
            "wshard": pa.array((u % np.uint64(nb)).astype(np.int64),
                               pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        zero = pa.table({c: pa.array([0], pa.int64()) for c in OUT})
        mt = t.filter(pc.equal(t["tag"], 1))
        if mt.num_rows == 0:
            return zero
        rt = t.filter(pc.equal(t["tag"], 0))
        ref = np.unique(rt["h"].to_numpy(zero_copy_only=False))
        mh = mt["h"].to_numpy(zero_copy_only=False)
        mn = mt["n"].to_numpy(zero_copy_only=False)
        # merge the measured side's per-batch partials
        order = np.argsort(mh, kind="stable")
        mh, mn = mh[order], mn[order]
        starts, _ = _group_starts(mh)
        uh = mh[starts]
        un = np.add.reduceat(mn, starts)
        if len(ref):
            pos = np.clip(np.searchsorted(ref, uh), 0, len(ref) - 1)
            oov = ref[pos] != uh
        else:
            oov = np.ones(len(uh), bool)
        return pa.table({
            "n_tokens": pa.array([int(un.sum())], pa.int64()),
            "n_oov_tokens": pa.array([int(un[oov].sum())], pa.int64()),
            "n_types": pa.array([len(uh)], pa.int64()),
            "n_oov_types": pa.array([int(oov.sum())], pa.int64())})

    parts = ref_ds.map_batches(ref_rows, batch_format="pyarrow") \
        .union(ds.map_batches(measured_rows, batch_format="pyarrow")) \
        .groupby("wshard").map_groups(resolve, batch_format="pyarrow")

    def total(t: pa.Table) -> pa.Table:
        def s(c):
            return int(pc.sum(t[c]).as_py() or 0) if t.num_rows else 0
        return pa.table({c: pa.array([s(c)], pa.int64()) for c in OUT})

    zero = ray.data.from_arrow(
        pa.table({c: pa.array([0], pa.int64()) for c in OUT}))
    return parts.union(zero).repartition(1) \
        .map_batches(total, batch_format="pyarrow")


def source_vocab_kl(ds, group_col: str = "source",
                    text_col: str = "text",
                    num_shards: int | None = None):
    """Per-group vocabulary drift: the KL divergence of each group's
    word distribution from the corpus distribution, in EXACT integer
    milli-nats — ``kl_milli = sum_w c_gw * round(1000 * ln((c_gw * M)
    / (N_g * d_w)))`` where ``c_gw`` is the group's count of word w,
    ``N_g`` the group's tokens, ``d_w`` the corpus count of w and
    ``M`` total tokens.  KL(nats) ~ kl_milli / (1000 * N_g); the
    integer sum is order-independent, so the SQL oracle reproduces it
    with ln()/round().  The domain-shift score behind mixture
    rebalancing.

    Two passes: a tiny per-group token-total groupby, then per-batch
    (group, word-hash, count) partials onto ONE word-hash shard
    exchange where each shard sees a word's full column (d_w sums in
    place) — the group totals ride in as a broadcast dict, the driver
    holds O(groups) ints.  Magnitude contract: ``N_g * d_w < 2^63``.

    -> Dataset(group_col string, n_tokens int64, kl_milli int64).
    """
    import ray
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()

    def tok_partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        wh, offs = _word_hashes(t[text_col])
        cnt = np.diff(offs)
        out = pa.table({"g": g, "n": pa.array(cnt, pa.int64())})
        out = out.filter(pc.is_valid(out["g"]))
        gg = out.group_by("g").aggregate([("n", "sum")])
        return pa.table({"g": gg["g"],
                         "n": pc.cast(gg["n_sum"], pa.int64())})

    tot = pa.concat_tables(
        [b for b in ds.map_batches(tok_partial, batch_format="pyarrow")
         .groupby("g").aggregate(A.Sum("n"))
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows] or
        [pa.table({"g": pa.array([], pa.string()),
                   "sum(n)": pa.array([], pa.int64())})])
    gnames = np.asarray(tot["g"].to_pylist(), dtype=object)
    gtot = pc.cast(tot["sum(n)"], pa.int64()).to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.argsort(gnames)
    gnames, gtot = gnames[order], gtot[order]
    M = int(gtot.sum())
    ref = ray.put((gnames, gtot))

    def count_partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        wh, offs = _word_hashes(t[text_col])
        wl = np.diff(offs)
        gv = np.asarray(g.to_pylist(), dtype=object)
        doc_g = np.repeat(gv, wl)
        keep = np.array([x is not None for x in doc_g], dtype=bool)
        empty = pa.table({"g": pa.array([], pa.string()),
                          "h": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "wshard": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        gk = doc_g[keep]
        hk = wh[keep]
        gt = pa.table({"g": pa.array(gk.tolist(), pa.string()),
                       "h": pa.array(hk.view(np.int64), pa.int64())}) \
            .group_by(["g", "h"]).aggregate([([], "count_all")])
        hcol = gt["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": gt["g"], "h": gt["h"],
            "c": pc.cast(gt["count_all"], pa.int64()),
            "wshard": pa.array(
                (hcol.view(np.uint64) % np.uint64(nb)).astype(np.int64),
                pa.int64())})

    def kl_terms(t: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string()),
                          "kl": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        names, totals = ray.get(ref)
        # merge cross-batch (g, h) partials, then d_h per word
        gt = t.select(["g", "h", "c"]).group_by(["g", "h"]) \
            .aggregate([("c", "sum")])
        gv = np.asarray(gt["g"].to_pylist(), dtype=object)
        hv = gt["h"].to_numpy(zero_copy_only=False)
        cv = pc.cast(gt["c_sum"], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.argsort(hv, kind="stable")
        hv, gv, cv = hv[o], gv[o], cv[o]
        starts, sizes = _group_starts(hv)
        d = np.repeat(np.add.reduceat(cv, starts), sizes)
        gi = np.searchsorted(names, gv)
        ng = totals[np.clip(gi, 0, max(len(names) - 1, 0))]
        ratio = (cv * 1.0 * M) / (ng * d)
        m = _round_half_away(np.log(ratio) * 1000.0)
        # integer-valued float product, far below 2^53 — exact
        terms = (cv * m).astype(np.int64)
        out = pa.table({"g": pa.array(gv.tolist(), pa.string()),
                        "kl": pa.array(terms, pa.int64())}) \
            .group_by("g").aggregate([("kl", "sum")])
        return pa.table({"g": out["g"],
                         "kl": pc.cast(out["kl_sum"], pa.int64())})

    agg = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(kl_terms, batch_format="pyarrow") \
        .groupby("g").aggregate(A.Sum("kl"))

    def finish(t: pa.Table) -> pa.Table:
        names, totals = ray.get(ref)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "kl_milli": pa.array([], pa.int64())})
        gv = np.asarray(t["g"].to_pylist(), dtype=object)
        gi = np.clip(np.searchsorted(names, gv), 0,
                     max(len(names) - 1, 0))
        return pa.table({
            group_col: t["g"],
            "n_tokens": pa.array(totals[gi], pa.int64()),
            "kl_milli": pc.cast(t["sum(kl)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def lexical_diversity(ds, group_col: str = "source",
                      text_col: str = "text"):
    """Per-group lexical diversity ingredients: documents, total
    tokens, and the SUM of per-document distinct-word counts (the
    type-token-ratio numerator) — boilerplate and template farms show
    low distinct-per-doc; all three are exact integers, so the SQL
    oracle (per-doc COUNT(DISTINCT word)) matches bit-for-bit.

    One streaming pass, NO exchange beyond the tiny group groupby:
    per-doc distinct counts come from one lexsort over (doc, word
    hash) run boundaries per batch.  64-bit word-hash identity.

    -> Dataset(group_col string, n_docs, n_tokens,
       n_distinct_sum — int64).
    """
    import ray.data.aggregate as A

    def partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        wh, offs = _word_hashes(t[text_col])
        wl = np.diff(offs)
        n_docs = t.num_rows
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), wl)
        if len(wh):
            order = np.lexsort((wh, doc_idx))
            dd, hh = doc_idx[order], wh[order]
            newrun = np.ones(len(hh), bool)
            newrun[1:] = (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1])
            distinct = np.bincount(dd[newrun],
                                   minlength=n_docs).astype(np.int64)
        else:
            distinct = np.zeros(n_docs, np.int64)
        out = pa.table({
            "g": g,
            "one": pa.array(np.ones(n_docs, np.int64)),
            "tok": pa.array(wl, pa.int64()),
            "dis": pa.array(distinct, pa.int64())}) \
            .filter(pc.is_valid(g))
        gg = out.group_by("g").aggregate([("one", "sum"),
                                          ("tok", "sum"),
                                          ("dis", "sum")])
        return pa.table({"g": gg["g"],
                         "n_docs": pc.cast(gg["one_sum"], pa.int64()),
                         "n_tokens": pc.cast(gg["tok_sum"],
                                             pa.int64()),
                         "n_distinct_sum": pc.cast(gg["dis_sum"],
                                                   pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(A.Sum("n_docs"), A.Sum("n_tokens"),
                                A.Sum("n_distinct_sum"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t["g"],
            "n_docs": pc.cast(t["sum(n_docs)"], pa.int64()),
            "n_tokens": pc.cast(t["sum(n_tokens)"], pa.int64()),
            "n_distinct_sum": pc.cast(t["sum(n_distinct_sum)"],
                                      pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")
