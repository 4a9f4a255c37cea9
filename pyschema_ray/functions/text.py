"""Text-analysis operators for training-data pipelines, all expressed
as vectorized ``map_batches`` stages over a string column: token
counting, quality features, language ID (stopword heuristic), and
content fingerprinting.  The reference has no text ops — these are the
north-prompt "text analysis" extensions, built Ray-Data-first.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import hash_strings

TOKEN_SPLIT_RE = r"\s+"


def token_count_batch(t: pa.Table, text_col: str = "text",
                      out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count, matching SQL
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` exactly:
    empty-after-trim strings count 1 (the SQL split of '' is ['''])."""
    trimmed = pc.utf8_trim_whitespace(t[text_col])
    parts = pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE)
    n = pc.list_value_length(parts)
    return t.append_column(out_col, pc.cast(n, pa.int64()))


def tokenize_hash_batch(t: pa.Table, text_col: str = "text",
                        vocab_mod: int = 50_000,
                        out_col: str = "tokens") -> pa.Table:
    """Whitespace tokenize + hash each word to an int id in
    ``[0, vocab_mod)`` — the fully vectorized tokenizer stage for
    tokenize-then-pack pipelines (semantics identical to the Python
    ``s.split()`` loop it replaces, verified element-wise in tests).
    ONE Arrow split over the batch, ONE SipHash pass over the flat
    word array, and the per-doc lists are rebuilt from offsets — no
    per-row Python in the hot path."""
    col = pc.fill_null(t[text_col], "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.utf8_split_whitespace(col)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offsets = np.asarray(split.offsets)
    # rebase: a sliced ListArray's .values is the FULL child array
    flat = split.values.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    words = flat.to_numpy(zero_copy_only=False)
    # the split emits "" entries at leading/trailing whitespace — drop
    # them per doc while keeping offsets consistent
    mask = words != ""
    csum = np.zeros(len(words) + 1, dtype=np.int64)
    np.cumsum(mask, out=csum[1:])
    new_offsets = csum[offsets]
    kept = words[mask]
    ids = (hash_strings(kept) % np.uint64(vocab_mod)).astype(np.int64) \
        if len(kept) else np.empty(0, np.int64)
    tokens = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(ids, pa.int64()))
    return t.append_column(out_col, tokens)


def quality_features_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer-exact quality features (SQL-oracle friendly):
    n_chars, n_words, n_digits, n_punct, plus float ratios."""
    text = t[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    trimmed = pc.utf8_trim_whitespace(text)
    n_words = pc.cast(pc.list_value_length(
        pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE)), pa.int64())
    n_digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64())
    out = t.append_column("n_chars_actual", n_chars)
    out = out.append_column("n_words", n_words)
    out = out.append_column("n_digits", n_digits)
    out = out.append_column("n_punct", n_punct)
    mean_word_len = pc.divide(
        pc.cast(n_chars, pa.float64()),
        pc.cast(pc.max_element_wise(n_words, 1), pa.float64()))
    out = out.append_column("mean_word_len", mean_word_len)
    return out


def quality_score_batch(t: pa.Table, text_col: str = "text",
                        min_words: int = 10, max_mean_word_len: float = 12.0,
                        max_digit_ratio: float = 0.3) -> pa.Table:
    """Composite 0..1 quality score + keep flag (heuristics in the
    C4/Gopher style: length, word shape, symbol density)."""
    q = quality_features_batch(t, text_col)
    n_chars = np.asarray(q["n_chars_actual"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
    n_words = np.asarray(q["n_words"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
    n_digits = np.asarray(q["n_digits"].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
    mwl = np.asarray(q["mean_word_len"].to_numpy(zero_copy_only=False),
                     dtype=np.float64)
    digit_ratio = n_digits / np.maximum(n_chars, 1.0)
    score = np.ones(len(n_chars))
    score *= np.clip(n_words / max(min_words, 1), 0, 1)
    score *= np.where(mwl <= max_mean_word_len, 1.0,
                      np.clip(max_mean_word_len / np.maximum(mwl, 1e-9), 0, 1))
    score *= np.clip(1.0 - digit_ratio / max(max_digit_ratio, 1e-9), 0, 1)
    out = q.append_column("quality_score", pa.array(score, pa.float64()))
    return out.append_column("quality_keep",
                             pa.array(score >= 0.5, pa.bool_()))


# ---------------------------------------------------------------------------
# language ID — stopword-hit heuristic, stateful actor stage
# ---------------------------------------------------------------------------

#: tiny distinctive-stopword lists per language (public common words)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "was", "with", "that"],
    "es": ["el", "la", "los", "las", "que", "una", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour"],
    "zh": ["的", "是", "在", "了", "我", "他", "不"],
}


class LangIdScorer:
    """Actor-pool stage: regex patterns compiled ONCE per actor in
    ``__init__`` (the stateful-stage pattern); ``__call__`` scores each
    batch vectorized via ``pc.count_substring_regex``.  Use with
    ``ds.map_batches(LangIdScorer, concurrency=(1, n),
    batch_format="pyarrow")``."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 markers: dict | None = None):
        self.text_col = text_col
        self.out_col = out_col
        markers = markers or _LANG_MARKERS
        # one alternation pattern per language, word-bounded for latin
        self.patterns = {}
        for lang, words in markers.items():
            if lang == "zh":
                pat = "|".join(words)
            else:
                pat = r"\b(?:" + "|".join(words) + r")\b"
            self.patterns[lang] = pat
        self.langs = sorted(self.patterns)

    def __call__(self, t: pa.Table) -> pa.Table:
        # null text scores zero everywhere -> 'und' (deterministic, and
        # matches the SQL oracle's coalesce(lower(text), ''))
        lower = pc.utf8_lower(pc.fill_null(t[self.text_col], ""))
        scores = np.zeros((t.num_rows, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            c = pc.count_substring_regex(lower, self.patterns[lang])
            scores[:, j] = np.asarray(c.to_numpy(zero_copy_only=False))
        best = np.asarray(self.langs, dtype=object)[scores.argmax(axis=1)]
        best = np.where(scores.max(axis=1) > 0, best, "und")
        return t.append_column(self.out_col,
                               pa.array(best, pa.string(), from_pandas=True))


def normalize_text_batch(t: pa.Table, text_col: str = "text",
                         out_col: str | None = None) -> pa.Table:
    """Canonical text normalization for corpus cleaning: collapse
    whitespace runs to single spaces, trim, then Unicode NFC.  The
    exact pipeline is reproducible in SQL
    (``nfc_normalize(trim(regexp_replace(text, '[\\t\\n\\r ]+', ' ',
    'g')))``), so it is oracle-checkable.

    NFC caveat: pyarrow's ``utf8_normalize(form="NFC")`` does NOT
    compose combining sequences (verified on 16.1: e+U+0301 stays
    decomposed, while DuckDB/CPython compose to U+00E9), so NFC goes
    through ``unicodedata`` — with a vectorized ASCII fast path
    (``string_is_ascii``) that skips the per-string work for the
    overwhelmingly-ASCII common case."""
    import unicodedata

    col = pc.replace_substring_regex(t[text_col], r"[\t\n\r ]+", " ")
    col = pc.utf8_trim_whitespace(col)
    non_ascii = pc.invert(pc.fill_null(pc.string_is_ascii(col), True))
    if pc.any(non_ascii).as_py():
        # route ONLY the non-ASCII subset through the Python NFC
        # fallback (take by mask + replace_with_mask) — a mostly-CJK
        # corpus pays per-string Python, an occasional-unicode corpus
        # pays almost nothing, and the ASCII bulk never leaves Arrow
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(non_ascii, pa.ChunkedArray):
            non_ascii = non_ascii.combine_chunks()
        idx = np.flatnonzero(np.asarray(non_ascii.to_numpy(
            zero_copy_only=False)))
        fixed = [unicodedata.normalize("NFC", v) if v is not None else v
                 for v in col.take(pa.array(idx)).to_pylist()]
        col = pc.replace_with_mask(col, non_ascii,
                                   pa.array(fixed, pa.string()))
    if out_col is None or out_col == text_col:
        return t.set_column(t.schema.get_field_index(text_col),
                            text_col, col)
    return t.append_column(out_col, col)


#: PII patterns (RE2 syntax — the SAME dialect pyarrow's
#: replace_substring_regex and DuckDB's regexp_replace use, so the SQL
#: oracle can reproduce the transform exactly).  Order matters: email
#: before the bare-number patterns.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii_batch(t: pa.Table, text_col: str = "text",
                     out_col: str | None = None,
                     patterns: list[tuple[str, str]] | None = None) -> pa.Table:
    """Redact PII-shaped spans (emails, phone numbers, IPs, SSNs) with
    typed placeholders — chained vectorized ``replace_substring_regex``
    kernels, no per-row Python.  ``out_col=None`` replaces the text
    column in place."""
    col = t[text_col]
    for pat, repl in (patterns or PII_PATTERNS):
        col = pc.replace_substring_regex(col, pat, repl)
    if out_col is None or out_col == text_col:
        return t.set_column(t.schema.get_field_index(text_col),
                            text_col, col)
    return t.append_column(out_col, col)


_WINNOW_P = np.uint64(1099511628211)  # FNV prime — rolling-hash base


def winnow_fingerprints_batch(t: pa.Table, text_col: str = "text",
                              k: int = 8, window: int = 16,
                              out_col: str = "fingerprints") -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): rolling polynomial hash over byte
    k-grams, then the minimum hash of every ``window`` consecutive
    grams is selected; the resulting fingerprint SET is guaranteed to
    share members between any two documents sharing a substring of
    length >= window + k - 1.  Emits ``out_col`` as list<int64>
    (sorted, deduplicated) — substring-level near-dup evidence, where
    :func:`fingerprint_batch` is whole-document identity.

    Per-doc work is numpy (k shifted-slice fused ops for the rolling
    hash, one sliding-window min); the Python loop is only over docs
    in the batch (strings force that boundary)."""
    from numpy.lib.stride_tricks import sliding_window_view

    out: list = []
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for s in t[text_col].to_pylist():
            b = np.frombuffer((s or "").lower().encode("utf-8", "ignore"),
                              dtype=np.uint8).astype(np.uint64)
            n = len(b)
            if n == 0:
                out.append([])
                continue
            if n < k:
                h = np.zeros(1, np.uint64)
                for j in range(n):
                    h = h * _WINNOW_P + b[j]
                out.append([int(h.view(np.int64)[0])])
                continue
            m = n - k + 1
            h = np.zeros(m, np.uint64)
            for j in range(k):
                h = h * _WINNOW_P + b[j:j + m]
            if m <= window:
                sel = np.array([h.min()], np.uint64)
            else:
                sel = sliding_window_view(h, window).min(axis=1)
            out.append(np.unique(sel).view(np.int64).tolist())
    return t.append_column(out_col, pa.array(out, pa.list_(pa.int64())))


def fingerprint_batch(t: pa.Table, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """64-bit content fingerprint (stable SipHash of the full text),
    returned as a 16-hex-digit string.  Equal texts -> equal
    fingerprints across processes/machines; the exact-dedup key."""
    h = hash_strings(t[text_col].to_numpy(zero_copy_only=False))
    if len(h) == 0:
        # np.char.mod on empty object input infers float64 and zfill
        # then raises — guard like dedup.filter_exact_text_pairs
        return t.append_column(out_col, pa.array([], pa.string()))
    hexes = np.char.mod("%016x", h)
    return t.append_column(out_col, pa.array(hexes, pa.string()))


def word_frequencies(ds, text_col: str = "text",
                     num_shards: int | None = None,
                     lowercase: bool = True, min_count: int = 1):
    """Corpus word-frequency table -> Dataset(word, n): the vocabulary
    builder for tokenizer training / frequency filtering.  Per batch,
    one Arrow split + flatten + value_counts produces (word, count)
    partials (the combiner — the exchange carries unique-words-per-
    batch, never one row per token); partials then sum on a bounded
    word-hash shard exchange with a C++ group_by per shard.  No raw
    near-unique word groupby, no Python in the hot path."""
    from .dedup import _default_shards, _key_shards

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.fill_null(t[text_col], ""))
        if lowercase:
            col = pc.utf8_lower(col)
        words = pc.list_flatten(
            pc.split_pattern_regex(col, TOKEN_SPLIT_RE))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        w = vc.field("values")
        n = pc.cast(vc.field("counts"), pa.int64())
        shard = _key_shards(w.to_numpy(zero_copy_only=False), nb, 47)
        return pa.table({"wshard": pa.array(shard, pa.int64()),
                         "word": w, "n": n})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("word").aggregate([("n", "sum")])
        g = g.select(["word", "n_sum"]).rename_columns(["word", "n"])
        if min_count > 1:
            g = g.filter(pc.greater_equal(g["n"], min_count))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(total, batch_format="pyarrow")


def top_words(ds, text_col: str = "text", k: int = 100,
              num_shards: int | None = None, lowercase: bool = True):
    """EXACT top-k most frequent words — heavy hitters without a
    sketch: after :func:`word_frequencies`' word-hash exchange every
    word's GLOBAL count lives wholly in one shard, so a per-shard
    head-k followed by a final head-k over the (k × shards)-row
    candidate set is exact (no Misra-Gries error bound needed).  Ties
    break ascending on the word so results are deterministic and
    SQL-oracle-comparable.

    -> Dataset(word, n) of exactly min(k, vocab) rows."""
    freqs = word_frequencies(ds, text_col, num_shards, lowercase)

    def head(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n", "descending"), ("word", "ascending")])
        return t.slice(0, k)

    # per-batch head is superset-safe under any block coalescing:
    # each word's total is complete within its shard's rows
    cand = freqs.map_batches(head, batch_format="pyarrow")
    return cand.repartition(1).map_batches(head, batch_format="pyarrow")


def ngram_frequencies(ds, text_col: str = "text", n: int = 2,
                      num_shards: int | None = None,
                      min_count: int = 1):
    """Word n-gram frequency table -> Dataset(ngram, count): the
    bigram/trigram statistics a contamination / memorization audit
    needs.  Same combiner + word-hash shard exchange as
    :func:`word_frequencies`; the n-gram assembly reuses the dedup
    shingle kernel (texts lowercased; documents shorter than ``n``
    words contribute their whole text as one partial gram — the
    MinHash convention, documented there)."""
    from .dedup import _word_shingles, _default_shards, _key_shards

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _word_shingles(t[text_col].to_pylist(), n)
        if not flat:
            return pa.table({"wshard": pa.array([], pa.int64()),
                             "ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        arr = pa.array(flat, pa.string())
        vc = arr.value_counts()
        w = vc.field("values")
        c = pc.cast(vc.field("counts"), pa.int64())
        shard = _key_shards(w.to_numpy(zero_copy_only=False), nb, 53)
        return pa.table({"wshard": pa.array(shard, pa.int64()),
                         "ngram": w, "n": c})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("ngram").aggregate([("n", "sum")])
        g = g.select(["ngram", "n_sum"]).rename_columns(["ngram", "n"])
        if min_count > 1:
            g = g.filter(pc.greater_equal(g["n"], min_count))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(total, batch_format="pyarrow")


def fingerprint_md5_batch(t: pa.Table, text_col: str = "text",
                          out_col: str = "fingerprint") -> pa.Table:
    """MD5 content fingerprint (32-hex string), null in -> null out.
    Slower than :func:`fingerprint_batch` (hashlib per row — strings
    force the boundary anyway) but computable by ANY engine, so the
    result is SQL-oracle-checkable (``md5(text)``); use the SipHash
    variant for hot dedup paths."""
    import hashlib

    vals = [hashlib.md5(s.encode("utf-8")).hexdigest()
            if s is not None else None
            for s in t[text_col].to_pylist()]
    return t.append_column(out_col, pa.array(vals, pa.string()))


def ngram_contamination(ds, eval_texts, text_col: str = "text",
                        key_col: str = "doc_id", n: int = 8):
    """Benchmark-decontamination scan: per document, how many of its
    word n-grams appear in a BROADCAST evaluation set — the standard
    train/test-overlap check before pretraining.  ``eval_texts`` is a
    list of benchmark strings (small by contract — benchmarks are KB
    to MB; the corpus is the big side and streams).

    The eval set's unique n-grams are built ONCE on the driver and
    ``ray.put`` once; each batch assembles its grams with the shared
    shingle kernel (lowercase, whitespace words, whole-text partial
    gram for docs shorter than ``n`` — the MinHash convention) and
    membership is one vectorized Arrow ``is_in`` against the broadcast
    value set — exact string comparison, no hash-collision slack.
    Documents with no grams (null/empty text) are omitted, matching a
    SQL oracle's non-null filter.

    -> Dataset(key, n_grams, n_contaminated)."""
    import ray

    from .dedup import _word_shingles

    flat, _ = _word_shingles(list(eval_texts), n)
    eval_grams = pc.unique(pa.array(flat, pa.string()))
    ref = ray.put(eval_grams)

    def score(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, offsets = _word_shingles(texts, n)
        if not flat:
            return pa.table({
                key_col: t[key_col].slice(0, 0),
                "n_grams": pa.array([], pa.int64()),
                "n_contaminated": pa.array([], pa.int64()),
            })
        hit = pc.is_in(pa.array(flat, pa.string()),
                       value_set=ray.get(ref)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(hit, out=c[1:])
        n_grams = np.diff(offsets)
        n_bad = c[offsets[1:]] - c[offsets[:-1]]
        keep = n_grams > 0
        return pa.table({
            key_col: t[key_col].filter(pa.array(keep)),
            "n_grams": pa.array(n_grams[keep], pa.int64()),
            "n_contaminated": pa.array(n_bad[keep], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def doc_frequencies(ds, text_col: str = "text", key_col: str = "doc_id",
                    num_shards: int | None = None,
                    lowercase: bool = True, min_df: int = 1):
    """Document-frequency table -> Dataset(word, df): in how many
    DOCUMENTS each word appears — the IDF denominator and the standard
    stopword/rare-word filter input.  Same combiner + word-hash shard
    exchange as :func:`word_frequencies`, except each batch first
    dedups (doc, word) pairs (one C-level drop_duplicates over the
    flattened split), so the exchange carries unique words-per-batch
    with per-batch document counts."""
    import pandas as pd

    from .dedup import _default_shards, _key_shards

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.fill_null(t[text_col], ""))
        if lowercase:
            col = pc.utf8_lower(col)
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offsets = np.asarray(parts.offsets)
        flat = parts.values.slice(offsets[0], offsets[-1] - offsets[0])
        offsets = offsets - offsets[0]
        words = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offsets))
        df = pd.DataFrame({"d": doc_idx, "w": words})
        df = df.loc[df["w"] != ""].drop_duplicates()
        vc = df["w"].value_counts(sort=False)
        w = vc.index.to_numpy(dtype=object)
        return pa.table({
            "wshard": pa.array(_key_shards(w, nb, 59), pa.int64()),
            "word": pa.array(w, pa.string()),
            "df": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
        })

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("word").aggregate([("df", "sum")])
        g = g.select(["word", "df_sum"]).rename_columns(["word", "df"])
        if min_df > 1:
            g = g.filter(pc.greater_equal(g["df"], min_df))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(total, batch_format="pyarrow")


def top_terms_per_doc(ds, df_table: pa.Table | None = None,
                      text_col: str = "text", key_col: str = "doc_id",
                      k: int = 3, min_df: int = 1):
    """Per-document characteristic terms, TF-IDF-style but with an
    INTEGER-deterministic ranking — rank terms within each doc by
    (tf desc, df asc, term asc) — so the result is exactly
    reproducible by a SQL window function (float idf ties the ranking
    to log() rounding; the (tf, df) lexicographic order is the same
    signal without the float).

    ``df_table`` is the corpus document-frequency table
    (:func:`doc_frequencies` output); computed from ``ds`` when not
    given, then broadcast ONCE via ray.put.  Partitioning contract:
    the (pruned) vocabulary must fit the object store — pass
    ``min_df`` to prune rare words at 100-TB vocabularies.

    -> Dataset(key, term, tf, df, rank), rank in 1..k."""
    import pandas as pd
    import ray

    if df_table is None:
        df_ds = doc_frequencies(ds, text_col=text_col, key_col=key_col,
                                min_df=min_df)
        df_table = pa.concat_tables(
            [b for b in df_ds.iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows] or [pa.table({"word": pa.array([], pa.string()),
                                          "df": pa.array([], pa.int64())})])
    ref = ray.put(df_table)

    from ..sketches import cached_broadcast

    def per_batch(t: pa.Table):
        # vocabulary lookup built once per WORKER (cached_broadcast) —
        # rebuilding an O(vocab) Series per batch would dominate at
        # corpus-scale vocabularies
        lookup = cached_broadcast(
            ref, lambda dft: pd.Series(
                dft["df"].to_numpy(zero_copy_only=False),
                index=dft["word"].to_pylist()))
        col = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.fill_null(t[text_col], "")))
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offsets = np.asarray(parts.offsets)
        flat = parts.values.slice(offsets[0], offsets[-1] - offsets[0])
        offsets = offsets - offsets[0]
        words = flat.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offsets))
        frame = pd.DataFrame({"d": doc_idx, "term": words})
        frame = frame.loc[frame["term"] != ""]
        if frame.empty:
            keys_empty = t[key_col].slice(0, 0)
            return pa.table({
                key_col: keys_empty,
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64())})
        tf = frame.groupby(["d", "term"], sort=False).size() \
            .reset_index(name="tf")
        tf["df"] = lookup.reindex(tf["term"]).to_numpy()
        # words absent from a pruned df table: treat as df = 0 (rarest)
        tf["df"] = np.nan_to_num(tf["df"].to_numpy(), nan=0).astype(np.int64)
        tf = tf.sort_values(["d", "tf", "df", "term"],
                            ascending=[True, False, True, True],
                            kind="stable")
        tf["rank"] = tf.groupby("d", sort=False).cumcount() + 1
        tf = tf.loc[tf["rank"] <= k]
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(keys[tf["d"].to_numpy()]),
            "term": pa.array(tf["term"].to_numpy(), pa.string()),
            "tf": pa.array(tf["tf"].to_numpy().astype(np.int64)),
            "df": pa.array(tf["df"].to_numpy().astype(np.int64)),
            "rank": pa.array(tf["rank"].to_numpy().astype(np.int64)),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def word_repetition_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Within-document repetition signal (Gopher-style quality rule):
    per doc, total word count and DISTINCT word count — the repetition
    ratio 1 - distinct/total flags template/spam pages.  One Arrow
    split + one (doc, word) dedup per batch; integer outputs keep it
    SQL-oracle-exact."""
    import pandas as pd

    col = pc.utf8_lower(pc.utf8_trim_whitespace(
        pc.fill_null(t[text_col], "")))
    parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offsets = np.asarray(parts.offsets)
    flat = parts.values.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    words = flat.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        np.diff(offsets))
    keep = words != ""
    doc_idx, words = doc_idx[keep], words[keep]
    n_words = np.bincount(doc_idx, minlength=t.num_rows)
    dd = pd.DataFrame({"d": doc_idx, "w": words}).drop_duplicates()
    n_distinct = np.bincount(dd["d"].to_numpy(), minlength=t.num_rows)
    out = t.append_column("n_words", pa.array(n_words, pa.int64()))
    return out.append_column("n_distinct_words",
                             pa.array(n_distinct, pa.int64()))


def frequency_of_frequencies(ds, text_col: str = "text",
                             num_shards: int | None = None,
                             lowercase: bool = True):
    """Vocabulary frequency-of-frequencies -> Dataset(n_occurrences,
    n_words): how many distinct words occur exactly n times — the
    Zipf/Good-Turing profile used to pick tokenizer vocab sizes and
    min-count cuts.  Builds on :func:`word_frequencies` (per-batch
    value_counts combiner + bounded word-hash exchange), then a second
    combiner: per word-shard the (count -> n_words) partial is
    computed locally, so the second exchange carries distinct counts
    per shard (tiny), never words."""
    wf = word_frequencies(ds, text_col=text_col, num_shards=num_shards,
                          lowercase=lowercase)

    def partial(t: pa.Table) -> pa.Table:
        vc = t["n"].combine_chunks().value_counts() \
            if isinstance(t["n"], pa.ChunkedArray) \
            else t["n"].value_counts()
        return pa.table({
            "n_occurrences": pc.cast(vc.field("values"), pa.int64()),
            "n_words": pc.cast(vc.field("counts"), pa.int64())})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by(["n_occurrences"]).aggregate([("n_words", "sum")])
        g = g.select(["n_occurrences", "n_words_sum"]) \
            .rename_columns(["n_occurrences", "n_words"])
        return g.set_column(1, "n_words",
                            pc.cast(g["n_words"], pa.int64()))

    return wf.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(total, batch_format="pyarrow")


def inverted_index(ds, text_col: str = "text", key_col: str = "doc_id",
                   min_df: int = 2, max_df: int | None = None,
                   num_shards: int | None = None,
                   lowercase: bool = True):
    """Posting-list build -> Dataset(word, df, postings): for each
    word with document frequency in [min_df, max_df], the sorted,
    comma-joined list of containing doc ids — the search-index /
    contamination-lookup artifact.

    Shape: per batch, DISTINCT (word, doc) pairs (an Arrow
    split+flatten with a per-doc repeat, deduped batch-locally — the
    combiner); pairs exchange ONCE on a bounded word-hash shard;
    per shard a pandas groupby dedupes cross-batch pairs, counts df,
    applies the df band (dropping stopword-frequency words BEFORE
    string assembly bounds posting size), sorts and joins ids.
    Postings travel as strings so the result is hashable/oracle-
    comparable; at 100 TB the df band is the documented guard — an
    unbanded index would make single hot words' postings lists
    arbitrarily long."""
    from .dedup import _default_shards, _key_shards

    nb = num_shards or _default_shards()

    def pairs(t: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.fill_null(t[text_col], ""))
        if lowercase:
            col = pc.utf8_lower(col)
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        words = pc.list_flatten(parts)
        docs = np.repeat(t[key_col].to_numpy(zero_copy_only=False), lens)
        keep = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        pt = pa.table({"word": words.filter(pa.array(keep)),
                       "doc": pa.array(docs[keep], pa.int64())})
        # batch-local distinct: the exchange carries unique pairs
        pt = pt.group_by(["word", "doc"]).aggregate([]) \
            .select(["word", "doc"])
        shard = _key_shards(pt["word"].to_numpy(zero_copy_only=False),
                            nb, 71)
        return pt.append_column("wshard", pa.array(shard, pa.int64()))

    empty = pa.table({"word": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "postings": pa.array([], pa.string())})

    def build(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        # cross-batch distinct + C++ sort; all run detection and the
        # posting-string assembly below are vectorized (no per-word
        # Python lambda — binary_join over one LargeListArray)
        pt = t.select(["word", "doc"]).group_by(["word", "doc"]) \
            .aggregate([]) \
            .sort_by([("word", "ascending"), ("doc", "ascending")])
        w = pt["word"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        sizes = np.diff(np.r_[starts, len(w)])
        band = sizes >= min_df
        if max_df is not None:
            band &= sizes <= max_df
        if not band.any():
            return empty
        keep = np.repeat(band, sizes)
        docs = pt["doc"].combine_chunks().filter(pa.array(keep))
        doc_str = pc.cast(docs, pa.string())
        kept = sizes[band].astype(np.int64)
        offsets = np.zeros(len(kept) + 1, np.int64)
        np.cumsum(kept, out=offsets[1:])
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            doc_str.combine_chunks() if isinstance(doc_str,
                                                   pa.ChunkedArray)
            else doc_str)
        return pa.table({
            "word": pa.array(w[starts][band], pa.string()),
            "df": pa.array(kept, pa.int64()),
            "postings": pc.cast(pc.binary_join(lst, ","), pa.string())})

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("wshard").map_groups(build, batch_format="pyarrow")


def cms_word_counts(ds, text_col: str = "text", depth: int = 4,
                    width: int = 65536, lowercase: bool = True):
    """Corpus-wide Count-Min word-frequency sketch -> CountMinSketch.

    The streaming alternative to :func:`word_frequencies` when the
    EXACT vocabulary table itself is too hot to exchange or the
    consumer only needs ad-hoc point lookups: each batch folds its
    local value_counts into a ``depth x width`` counter block (one
    ``np.add.at`` per row) — NO shuffle at all, fixed
    O(depth x width) memory regardless of vocabulary size, one-sided
    error <= e/width * N with prob 1 - e^-depth.  Point estimates
    never undercount.

    The per-batch partials (depth*width int64 each — ~2 MB at the
    defaults) reduce through ``levels`` chained in-plane fold stages,
    each summing up to ``fanout`` partial rows inside a task
    (vectorized reshape+sum — CMS merge is exact elementwise
    addition, so fold order is irrelevant): the driver receives at
    most n_batches / fanout^levels rows instead of concatenating
    every partial (64^3 ≈ 2.6e5x reduction at the defaults — one
    row on the driver for anything below ~10^7 batches)."""
    from ..sketches import CountMinSketch

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.fill_null(t[text_col], ""))
        if lowercase:
            col = pc.utf8_lower(col)
        words = pc.list_flatten(
            pc.split_pattern_regex(col, TOKEN_SPLIT_RE))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        cms = CountMinSketch(depth, width)
        if len(vc):
            cms.update(vc.field("values").to_numpy(zero_copy_only=False),
                       pc.cast(vc.field("counts"), pa.int64())
                       .to_numpy(zero_copy_only=False))
        return cms.to_row()

    def fold(t: pa.Table) -> pa.Table:
        counters = t["counters"].combine_chunks()
        # flatten() respects slice offsets; .values would not
        flat = np.asarray(counters.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        summed = flat.reshape(t.num_rows, depth * width).sum(axis=0)
        return pa.table({
            "depth": pa.array([depth], pa.int64()),
            "width": pa.array([width], pa.int64()),
            "counters": pa.array([summed], pa.list_(pa.int64())),
        })

    # distinct per-level concurrency caps keep the fold stages from
    # FUSING with the partial stage (or each other) — fused, each fold
    # would see only its own task's rows and never re-bundle across
    # tasks, collapsing the tree back into one-row-per-task
    rows = ds.map_batches(partial, batch_format="pyarrow")
    fanout = 64
    for cap in (16, 4, 1):
        rows = rows.map_batches(fold, batch_format="pyarrow",
                                batch_size=fanout, concurrency=cap)
    tail = [b for b in rows.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows]
    if not tail:
        return CountMinSketch(depth, width)
    return CountMinSketch.from_rows(pa.concat_tables(tail))


def corpus_report(ds, text_col: str = "text",
                  num_shards: int | None = None) -> pa.Table:
    """One-pass corpus summary -> one-row
    pa.Table(n_docs, n_null_text, total_words, max_doc_words,
    vocab_size).

    The corpus streams ONCE: each batch's partial emits its distinct
    (word, count) rows for the vocabulary exchange (the
    word_frequencies combiner) PLUS four sentinel rows (wshard = -1)
    carrying the batch's doc/null/word/max counters; scalar totals
    and per-shard distinct-word counts both reduce through the same
    bounded groupby, so the driver sees O(shards) rows."""
    from .dedup import _default_shards, _key_shards

    nb = num_shards or _default_shards()

    def partial(t: pa.Table) -> pa.Table:
        raw = t[text_col]
        n_null = pc.sum(pc.cast(pc.is_null(raw), pa.int64()),
                        min_count=0).as_py() or 0
        col = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.fill_null(raw, "")))
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets).astype(np.int64)
        flat = parts.values.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
        words = flat.to_numpy(zero_copy_only=False)
        nonempty = words != ""
        cum = np.r_[np.int64(0), np.cumsum(nonempty)]
        per_doc = cum[offs[1:]] - cum[offs[:-1]]
        # explicit string type: an all-empty batch would otherwise
        # infer a null-typed array that cannot concat with the
        # string sentinel labels
        vc = pa.array(words[nonempty], type=pa.string()).value_counts()
        w = vc.field("values")
        n = pc.cast(vc.field("counts"), pa.int64())
        shard = _key_shards(w.to_numpy(zero_copy_only=False), nb, 47)
        sent_labels = ["#docs", "#nulls", "#words", "#maxw"]
        sent_vals = [t.num_rows, int(n_null), int(per_doc.sum()),
                     int(per_doc.max()) if len(per_doc) else 0]
        return pa.table({
            "wshard": pa.concat_arrays([
                pa.array(shard, pa.int64()),
                pa.array([-1] * 4, pa.int64())]),
            "word": pa.concat_arrays([
                w.combine_chunks() if isinstance(w, pa.ChunkedArray)
                else w, pa.array(sent_labels, pa.string())]),
            "n": pa.concat_arrays([
                n.combine_chunks() if isinstance(n, pa.ChunkedArray)
                else n, pa.array(sent_vals, pa.int64())]),
        })

    def reduce_shard(t: pa.Table) -> pa.Table:
        sid = int(t["wshard"][0].as_py())
        if sid == -1:
            is_max = pc.equal(t["word"], "#maxw")
            g = t.filter(pc.invert(is_max)) \
                .group_by("word").aggregate([("n", "sum")]) \
                .select(["word", "n_sum"]) \
                .rename_columns(["word", "n"])
            mx = pc.max(t.filter(is_max)["n"], min_count=0).as_py()
            return pa.concat_tables([g, pa.table({
                "word": pa.array(["#maxw"], pa.string()),
                "n": pa.array([int(mx or 0)], pa.int64())})])
        n_distinct = len(t.group_by("word").aggregate([("n", "sum")]))
        return pa.table({"word": pa.array(["#vocab"], pa.string()),
                         "n": pa.array([n_distinct], pa.int64())})

    rows = pa.concat_tables(
        [b for b in ds.map_batches(partial, batch_format="pyarrow")
         .groupby("wshard")
         .map_groups(reduce_shard, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows])
    vals = {"#docs": 0, "#nulls": 0, "#words": 0, "#maxw": 0,
            "#vocab": 0}
    for lbl, n in zip(rows["word"].to_pylist(), rows["n"].to_pylist()):
        if lbl == "#maxw":
            vals[lbl] = max(vals[lbl], int(n))
        else:
            vals[lbl] += int(n)
    return pa.table({
        "n_docs": pa.array([vals["#docs"]], pa.int64()),
        "n_null_text": pa.array([vals["#nulls"]], pa.int64()),
        "total_words": pa.array([vals["#words"]], pa.int64()),
        "max_doc_words": pa.array([vals["#maxw"]], pa.int64()),
        "vocab_size": pa.array([vals["#vocab"]], pa.int64()),
    })


def top_bigram_pmi(ds, text_col: str = "text", k: int = 100,
                   min_count: int = 5, num_shards: int | None = None):
    """EXACT top-k bigram collocations by pointwise mutual
    information — the corpus-linguistics staple ("new york"-style
    fixed phrases score high; chance co-occurrences score ~0).

    PMI is quantized to INTEGER milli-nats before ranking (the
    repo-wide float discipline)::

        milli_pmi = round(ln(c12·W·W / T / c1 / c2) · 1000)

    with ``c12`` the bigram count, ``c1``/``c2`` the unigram counts,
    ``W`` total words, ``T`` total bigrams — evaluated in the same
    left-associative double expression the SQL oracle writes, so the
    two agree bit-for-bit away from half-ulp boundaries.

    Scale shape: bigram counts come from :func:`ngram_frequencies`'
    combiner+exchange (partial whole-text grams of 1-word docs are
    excluded — a real bigram contains a space); the vocabulary-bounded
    word-count table broadcasts once as sorted-hash arrays
    (``ray.put`` + searchsorted probes, the LM-module contract);
    ``min_count`` prunes rare bigrams (PMI is noise below a handful of
    observations — the standard collocation practice, stated, not
    silent).  Each bigram's GLOBAL count lives wholly in one exchange
    shard, and PMI is per-row, so per-batch head-k -> final head-k is
    exact (the :func:`top_words` argument).  Ties break ascending on
    the bigram string.

    -> Dataset(ngram, n, milli_pmi) of at most k rows.
    """
    import ray

    from ..sketches import hash_strings

    freqs = word_frequencies(ds, text_col, num_shards)
    wtables = [b for b in freqs.iter_batches(batch_format="pyarrow", batch_size=None)
               if b.num_rows]
    if wtables:
        wt = pa.concat_tables(wtables)
        wh = hash_strings(wt["word"].to_numpy(zero_copy_only=False))
        wn = wt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(wh, kind="stable")
        wh, wn = wh[order], wn[order]
        total_words = int(wn.sum())
    else:
        wh = np.empty(0, np.uint64)
        wn = np.empty(0, np.int64)
        total_words = 0
    words_ref = ray.put((wh, wn))

    bigrams = ngram_frequencies(ds, text_col, 2, num_shards) \
        .map_batches(
            lambda t: t.filter(pc.match_substring(t["ngram"], " ")),
            batch_format="pyarrow").materialize()
    total_bigrams = int(bigrams.sum("n") or 0)

    def score_head(t: pa.Table) -> pa.Table:
        keys, counts = ray.get(words_ref)
        t = t.filter(pc.greater_equal(t["n"], min_count))
        if t.num_rows == 0 or total_bigrams == 0 or len(keys) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "milli_pmi": pa.array([], pa.int64())})
        parts = pc.split_pattern(t["ngram"], " ", max_splits=1)
        w1 = pc.list_element(parts, 0).to_numpy(zero_copy_only=False)
        w2 = pc.list_element(parts, 1).to_numpy(zero_copy_only=False)

        def probe(wsarr):
            h = hash_strings(wsarr)
            pos = np.clip(np.searchsorted(keys, h), 0, len(keys) - 1)
            return np.where(keys[pos] == h, counts[pos], 1)

        c1 = probe(w1).astype(np.float64)
        c2 = probe(w2).astype(np.float64)
        c12 = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        W, T = float(total_words), float(total_bigrams)
        # left-associative, matching the oracle's expression exactly
        p = c12 * W * W / T / c1 / c2
        mp = np.copysign(np.floor(np.abs(np.log(p) * 1000.0) + 0.5),
                         np.log(p) * 1000.0).astype(np.int64)
        out = pa.table({"ngram": t["ngram"],
                        "n": pc.cast(t["n"], pa.int64()),
                        "milli_pmi": pa.array(mp, pa.int64())})
        out = out.sort_by([("milli_pmi", "descending"),
                           ("ngram", "ascending")])
        return out.slice(0, k)

    cand = bigrams.map_batches(score_head, batch_format="pyarrow")
    return cand.repartition(1).map_batches(score_head,
                                           batch_format="pyarrow")


def chunk_documents(ds, text_col: str = "text", key_col: str = "doc_id",
                    width: int = 64, stride: int = 48):
    """Sliding-window document chunking — the RAG/pretraining splitter:
    each document becomes chunks of ``width`` whitespace words starting
    every ``stride`` words (``width - stride`` words of overlap; the
    tail chunk truncates).  Chunk ``cid`` covers words
    ``[cid*stride, min(cid*stride+width, n_words))``; a doc emits
    ``floor((n_words-1)/stride) + 1`` chunks (>=1 for any non-blank
    doc), so every word belongs to at least one chunk.

    Pure flat-map shape — NO exchange: one Arrow whitespace split per
    batch, chunk ranges materialized as flat word-index gathers, list
    offsets rebuilt, ``binary_join`` reassembles every chunk in one
    kernel (no per-doc Python).  Blank/null docs emit nothing.

    -> Dataset(key_col, chunk_id int64, n_words int64, chunk_text).
    """
    if stride <= 0 or width <= 0 or stride > width:
        raise ValueError("need 0 < stride <= width")

    def chunks(t: pa.Table) -> pa.Table:
        split = pc.utf8_split_whitespace(pc.fill_null(t[text_col], ""))
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
        wl = np.diff(offs)
        n_chunks = np.where(wl > 0, (wl - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        ktype = t.schema.field(key_col).type
        if total == 0:
            return pa.table({
                key_col: pa.array([], ktype),
                "chunk_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string())})
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                           n_chunks)
        from .dedup import _ranges
        cid = _ranges(n_chunks[n_chunks > 0])
        cstart = cid * stride
        clen = np.minimum(cstart + width, wl[doc_of]) - cstart
        flat_idx = np.repeat(offs[:-1][doc_of] + cstart, clen) \
            + _ranges(clen)
        chunk_words = pa.array(words[flat_idx], pa.string())
        new_offs = np.zeros(total + 1, np.int64)
        np.cumsum(clen, out=new_offs[1:])
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()), chunk_words)
        joined = pc.binary_join(lst, pa.scalar(" ", pa.string()))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(list(keys[doc_of]), ktype),
            "chunk_id": pa.array(cid, pa.int64()),
            "n_words": pa.array(clen.astype(np.int64), pa.int64()),
            "chunk_text": pc.cast(joined, pa.string())})

    return ds.map_batches(chunks, batch_format="pyarrow")


def _hash_vector_matrix(texts, dim: int, seed: int) -> np.ndarray:
    """(n, dim) float32 L2-normalized hashing-trick vectors for a
    local list/array of texts — the pure kernel behind
    :func:`hash_vectorize`, reused driver-side to build query
    matrices so both sides agree bit-for-bit."""
    from ..sketches import mix64

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
    words = words[mask]
    n = len(arr)
    if len(words) == 0:
        return np.zeros((n, dim), np.float32)
    wh = mix64(hash_strings(words), seed)
    bucket = (wh % np.uint64(dim)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    mat = np.bincount(doc_idx * dim + bucket,
                      minlength=n * dim).reshape(n, dim) \
        .astype(np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-12)


def hash_vectorize(ds, text_col: str = "text", key_col: str = "doc_id",
                   dim: int = 64, seed: int = 7,
                   out_col: str = "embedding"):
    """Feature-hashing (hashing-trick) text vectorizer: each text
    becomes an L2-normalized ``dim``-bucket word-count vector
    (bucket = hash(word) mod dim) — the classic no-vocabulary
    featurizer that needs NO training pass, no broadcast, and no
    exchange: one Arrow split + one hash pass + one bincount per
    batch.  Pairs with the ANN operators for cheap lexical
    similarity search.  -> adds ``out_col`` fixed_size_list<float32>.
    """
    def vec(t: pa.Table) -> pa.Table:
        mat = _hash_vector_matrix(t[text_col], dim, seed)
        return t.append_column(out_col, pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), dim))

    return ds.map_batches(vec, batch_format="pyarrow")


def _mg_compress(words: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression to <= k counters (Misra & Gries 1982;
    mergeable form per Agarwal et al. 2012 — public algorithms):
    subtract the (k+1)-th largest count from every counter, keep
    positives.  Each compression undercounts any item by at most the
    subtracted value, and across an entire stream of n items the
    total undercount per item is <= n/(k+1)."""
    if len(words) <= k:
        return words, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    dec = counts - kth
    keep = dec > 0
    return words[keep], dec[keep]


def heavy_hitter_words(ds, text_col: str = "text", phi: float = 0.002,
                       k: int | None = None):
    """EXACT phi-heavy-hitters (words with frequency >= phi * total)
    without a vocabulary-wide shuffle — the sketch-prune + exact-verify
    pattern:

    1. Per batch: one Arrow split + value_counts, then Misra-Gries
       compression to ``k`` counters — the stream to the driver is
       <= k rows per batch, never vocabulary-sized.
    2. Driver fold: merge partials (sum matching counters, compress
       back to k).  Mergeable-summaries bound: any word's total
       undercount <= n/(k+1).  With ``k = ceil(2/phi)`` (default),
       n/(k+1) < phi*n/2, so every true heavy hitter survives with a
       positive count — candidate recall is 1 by construction, and
       MG itself guarantees <= k candidates.
    3. Exact verify: the candidate list broadcasts once; one more
       streaming pass counts EXACTLY those words (is_in filter +
       value_counts per batch) and the phi threshold is applied to
       exact counts — so the output is byte-identical to the
       SQL GROUP BY ... HAVING answer, at sketch cost.

    Driver traffic: O(batches * k) counter rows + one k-row broadcast
    — at 100 TB with k=1000 that is ~8 MB per thousand batches,
    vs a full word-frequency exchange.  Returns pa.Table(word, n)
    sorted by word."""
    import ray

    if k is None:
        k = int(math.ceil(2.0 / phi))

    def split_words(t: pa.Table):
        col = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.fill_null(t[text_col], "")))
        words = pc.list_flatten(
            pc.split_pattern_regex(col, TOKEN_SPLIT_RE))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        return words.filter(pc.not_equal(words, ""))

    def partial(t: pa.Table) -> pa.Table:
        words = split_words(t)
        vc = words.value_counts()
        w = vc.field("values").to_numpy(zero_copy_only=False)
        n = pc.cast(vc.field("counts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        w, n = _mg_compress(w, n, k)
        # sentinel "" row carries the batch's token total (the split
        # drops empty words, so "" can never be a real counter)
        return pa.table({
            "word": pa.array(np.append(w, ""), pa.string()),
            "n": pa.array(np.append(n, len(words)), pa.int64()),
        })

    # fold the (<= k+1 row) partials on the driver; "" row = batch total
    acc_w = np.empty(0, object)
    acc_n = np.empty(0, np.int64)
    total = 0
    import pandas as pd
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        w = b["word"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        is_tot = w == ""
        total += int(n[is_tot].sum())
        s = pd.Series(np.concatenate([acc_n, n[~is_tot]]),
                      index=np.concatenate([acc_w, w[~is_tot]]))
        s = s.groupby(level=0, sort=False).sum()
        acc_w = s.index.to_numpy(dtype=object)
        acc_n = s.to_numpy(np.int64)
        acc_w, acc_n = _mg_compress(acc_w, acc_n, k)

    threshold = int(math.ceil(phi * total)) if total else 0
    # every true heavy hitter survives the fold (undercount < phi*n/2)
    cand = acc_w[acc_n > 0]
    if len(cand) == 0 or total == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    cand_ref = ray.put(pa.array(sorted(cand.tolist()), pa.string()))

    def exact(t: pa.Table) -> pa.Table:
        words = split_words(t)
        words = words.filter(pc.is_in(words, value_set=ray.get(cand_ref)))
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    ex: dict = {}
    for b in ds.map_batches(exact, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
            ex[w] = ex.get(w, 0) + n
    out = sorted((w, n) for w, n in ex.items() if n >= threshold)
    return pa.table({"word": pa.array([w for w, _ in out], pa.string()),
                     "n": pa.array([n for _, n in out], pa.int64())})
