"""Bigram-LM quality scoring (functions/lm.py): exact parity against
a pure-Python reference (same smoothing, same milli-nat quantization),
cross-corpus OOV behavior, and edge docs."""

import math

import numpy as np
import pyarrow as pa

import ray

from pyschema_ray.functions.lm import (bigram_lm_counts, bigram_lm_scores,
                                       distinct_word_count)


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _ref_model(texts):
    c12, c1, vocab = {}, {}, set()
    for t in texts:
        w = (t or "").lower().split()
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    return c12, c1, len(vocab)


def _round_half_away(x):
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


def _ref_scores(texts, train_texts):
    c12, c1, v = _ref_model(train_texts)
    out = []
    for t in texts:
        w = (t or "").lower().split()
        s = 0
        for a, b in zip(w, w[1:]):
            p = (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + max(v, 1))
            s += _round_half_away(math.log(p) * 1000.0)
        out.append((len(w), max(len(w) - 1, 0), s))
    return out


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox naps",
    "the dog jumps the fox",
    "completely different words entirely",
    "one",                     # 1 word -> 0 bigrams
    "",                        # blank -> 0 tokens
    None,                      # null -> 0 tokens
    "the the the the",         # repetition
]


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)


def test_self_scores_match_reference():
    got_t = _tbl(bigram_lm_scores(_ds(DOCS), num_shards=4)) \
        .sort_by("doc_id")
    exp = _ref_scores(DOCS, DOCS)
    got = list(zip(got_t["n_tokens"].to_pylist(),
                   got_t["n_bigrams"].to_pylist(),
                   got_t["sum_mlogp"].to_pylist()))
    assert got == exp


def test_cross_corpus_oov():
    train = DOCS[:3]
    got_t = _tbl(bigram_lm_scores(_ds(DOCS), train_ds=_ds(train),
                                  num_shards=4)).sort_by("doc_id")
    exp = _ref_scores(DOCS, train)
    got = list(zip(got_t["n_tokens"].to_pylist(),
                   got_t["n_bigrams"].to_pylist(),
                   got_t["sum_mlogp"].to_pylist()))
    assert got == exp


def test_counts_and_vocab():
    c12, c1, v = _ref_model(DOCS)
    assert distinct_word_count(_ds(DOCS), num_shards=4) == v
    t = _tbl(bigram_lm_counts(_ds(DOCS), num_shards=4))
    assert t.num_rows == len(c12)
    assert sorted(t["n"].to_pylist()) == sorted(c12.values())


def test_min_count_prunes():
    t = _tbl(bigram_lm_counts(_ds(DOCS), num_shards=4, min_count=2))
    c12, _c1, _v = _ref_model(DOCS)
    assert t.num_rows == sum(1 for n in c12.values() if n >= 2)


def _ref_novelty(texts, n=3, min_df=2):
    def grams(t):
        w = (t or "").lower().split()
        if not w:
            return set()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    gsets = [grams(t) for t in texts]
    df = {}
    for gs in gsets:
        for g in gs:
            df[g] = df.get(g, 0) + 1
    return [(len(gs), sum(1 for g in gs if df[g] >= min_df))
            for gs in gsets]


def test_ngram_novelty_matches_reference():
    from pyschema_ray.functions.lm import ngram_novelty_scores
    texts = DOCS + ["the quick brown fox jumps over the lazy dog",
                    "short doc", "short doc"]
    ds = _ds(texts)
    got_t = _tbl(ngram_novelty_scores(ds, num_shards=4)) \
        .sort_by("doc_id")
    exp = _ref_novelty(texts)
    got = list(zip(got_t["n_grams"].to_pylist(),
                   got_t["n_common"].to_pylist()))
    assert got == exp
    # every exact-duplicated doc's grams are all shared
    dup_rows = [i for i, t in enumerate(texts)
                if texts.count(t) > 1 and t]
    for i in dup_rows:
        assert exp[i][0] == exp[i][1]


def test_dsir_log_ratio_matches_reference():
    from pyschema_ray.functions.lm import bigram_lm_log_ratio

    target = ["the quick brown fox jumps over the lazy dog",
              "the quick brown fox naps"]
    out = _tbl(bigram_lm_log_ratio(_ds(DOCS), _ds(target),
                                   num_shards=4)).sort_by("doc_id")
    ref_t = _ref_scores(DOCS, target)
    ref_c = _ref_scores(DOCS, DOCS)
    assert out["n_bigrams"].to_pylist() == [r[1] for r in ref_t]
    assert out["mlogp_target"].to_pylist() == [r[2] for r in ref_t]
    assert out["mlogp_corpus"].to_pylist() == [r[2] for r in ref_c]
    assert out["mlog_ratio"].to_pylist() == \
        [t[2] - c[2] for t, c in zip(ref_t, ref_c)]
    # target-like docs rank above off-domain docs
    ranked = sorted(zip(out["mlog_ratio"].to_pylist(),
                        out["doc_id"].to_pylist()), reverse=True)
    per_bigram = {d: r for r, d in ranked}
    assert per_bigram[1] > per_bigram[3]   # in-domain > different words


def test_dsir_log_ratio_empty_target_smooths():
    from pyschema_ray.functions.lm import bigram_lm_log_ratio

    out = _tbl(bigram_lm_log_ratio(_ds(DOCS), _ds([]),
                                   num_shards=4)).sort_by("doc_id")
    ref_t = _ref_scores(DOCS, [])
    assert out["mlogp_target"].to_pylist() == [r[2] for r in ref_t]


def test_vocab_oov_matches_reference():
    from pyschema_ray.functions.lm import vocab_oov

    ref_texts = ["the quick brown fox", "jumps over the dog"]
    m_texts = ["the lazy cat naps", "fox and cat", None, ""]
    out = _tbl(vocab_oov(_ds(m_texts), _ds(ref_texts), num_shards=4))
    assert out.num_rows == 1
    vocab = {w for t in ref_texts for w in t.lower().split()}
    toks = [w for t in m_texts for w in (t or "").lower().split()]
    types = set(toks)
    want = {
        "n_tokens": len(toks),
        "n_oov_tokens": sum(1 for w in toks if w not in vocab),
        "n_types": len(types),
        "n_oov_types": sum(1 for w in types if w not in vocab)}
    assert out.to_pylist()[0] == want


def test_vocab_oov_empty_sides():
    from pyschema_ray.functions.lm import vocab_oov

    out = _tbl(vocab_oov(_ds(["a b"]), _ds([]), num_shards=2))
    assert out.to_pylist()[0] == {"n_tokens": 2, "n_oov_tokens": 2,
                                  "n_types": 2, "n_oov_types": 2}
    out = _tbl(vocab_oov(_ds([]), _ds(["a b"]), num_shards=2))
    assert out.to_pylist()[0] == {"n_tokens": 0, "n_oov_tokens": 0,
                                  "n_types": 0, "n_oov_types": 0}


def test_source_vocab_kl_matches_reference():
    from pyschema_ray.functions.lm import source_vocab_kl

    texts = ["aa bb aa", "bb cc", "aa aa aa", "dd", None, ""]
    srcs = ["s1", "s1", "s2", "s2", "s2", None]
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string())})).repartition(3)
    out = _tbl(source_vocab_kl(ds, num_shards=3)).sort_by("source")

    # pure-python reference with identical quantization
    from collections import Counter
    cgw, ng, d = {}, Counter(), Counter()
    for s, t in zip(srcs, texts):
        if s is None:
            continue
        for w in (t or "").lower().split():
            cgw[(s, w)] = cgw.get((s, w), 0) + 1
            ng[s] += 1
            d[w] += 1
    M = sum(ng.values())
    kl = Counter()
    for (s, w), c in cgw.items():
        kl[s] += c * _round_half_away(
            math.log((c * 1.0 * M) / (ng[s] * d[w])) * 1000.0)
    want = sorted((s, ng[s], int(kl[s])) for s in ng)
    got = list(zip(out["source"].to_pylist(),
                   out["n_tokens"].to_pylist(),
                   out["kl_milli"].to_pylist()))
    assert got == want
    # KL of a distribution vs itself-dominated corpus is >= 0 up to
    # quantization for the skewed source
    assert out.num_rows == 2


def test_lexical_diversity_matches_reference():
    from pyschema_ray.functions.lm import lexical_diversity

    texts = ["aa bb aa cc", "bb bb", "", None, "zz"]
    srcs = ["s1", "s1", "s2", "s2", None]
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string())})).repartition(3)
    out = _tbl(lexical_diversity(ds)).sort_by("source")
    want = {"s1": (2, 6, 4),      # docs, tokens, per-doc-distinct sum
            "s2": (2, 0, 0)}
    got = {r["source"]: (r["n_docs"], r["n_tokens"],
                         r["n_distinct_sum"])
           for r in out.to_pylist()}
    assert got == want
