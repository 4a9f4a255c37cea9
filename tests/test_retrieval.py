"""BM25 ranked retrieval: parity vs an independent per-doc Python
reference, determinism, and edge cases (absent terms, null/empty
text, top_k > matches)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyschema_ray.functions.retrieval import bm25_rank

DOCS = [
    ("d01", "apple banana apple cherry"),
    ("d02", "banana banana banana"),
    ("d03", "cherry apple"),
    ("d04", ""),
    ("d05", None),
    ("d06", "durian elderberry fig"),
    ("d07", "apple apple apple apple banana"),
    ("d08", "  apple\tbanana  \n cherry  "),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent dict-based reference (no shared code with the
    implementation under test)."""
    toks = {k: (v or "").lower().split() for k, v in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for key, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0.0:
            out[key] = round(s, 6)
    return out


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([k for k, _ in DOCS], pa.string()),
        "text": pa.array([v for _, v in DOCS], pa.string()),
    })).repartition(3)


def test_bm25_matches_reference():
    terms = ["apple", "banana", "nosuchterm"]
    got = bm25_rank(_ds(), terms, top_k=10).to_pandas()
    ref = _ref_bm25(DOCS, terms)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["doc_id"]) == [k for k, _ in want]
    assert np.allclose(got["score"], [v for _, v in want])
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_bm25_top_k_cut_and_determinism():
    a = bm25_rank(_ds(), ["apple"], top_k=2).to_pandas()
    b_ = bm25_rank(_ds(), ["apple"], top_k=2).to_pandas()
    assert len(a) == 2
    assert a.equals(b_)


def test_bm25_absent_terms_empty():
    got = bm25_rank(_ds(), ["zzz"], top_k=5)
    assert got.num_rows == 0
    assert got.schema.names == ["doc_id", "score", "rank"]


def test_bm25_integer_keys():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["x y", "y y y", "z"], pa.string()),
    }))
    got = bm25_rank(ds, ["y"], top_k=5).to_pandas()
    assert list(got["doc_id"]) == [2, 1]


def test_bm25_requires_terms():
    with pytest.raises(ValueError):
        bm25_rank(_ds(), [])


def test_corpus_report_one_pass():
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.text import corpus_report

    ds = rd.from_arrow(pa.table({"text": pa.array(
        ["a b c", "b b", None, "", "  d  ", "a " * 50])})) \
        .repartition(3)
    t = corpus_report(ds)
    assert t.to_pydict() == {
        "n_docs": [6], "n_null_text": [1], "total_words": [56],
        "max_doc_words": [50], "vocab_size": [4]}
