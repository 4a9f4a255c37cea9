"""Exact inverted-index n-gram Jaccard similarity self-join
(functions/dedup.ngram_jaccard_pairs): parity against a pure-Python
shingle-set reference, the max_df stop-shingle knob, and edge docs."""

import numpy as np
import pyarrow as pa

import ray

from pyschema_ray.functions.dedup import ngram_jaccard_pairs


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _shingle_set(text, k=3):
    w = (text or "").lower().split()
    if not w:
        return set()
    if len(w) < k:
        return {" ".join(w)}
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def _expected_pairs(docs, k=3, threshold=0.0):
    sets = {d: _shingle_set(t, k) for d, t in docs}
    keys = sorted(sets)
    out = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            uni = len(sa | sb)
            if inter / uni >= threshold:
                out[(a, b)] = (inter, uni, inter / uni)
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup
    (2, "a quick brown fox jumps over the lazy dog today"),    # near dup
    (3, "completely different words in this one entirely"),
    (4, "short doc"),                                          # < k words
    (5, "short doc"),                                          # dup of 4
    (6, None),                                                 # null text
    (7, ""),                                                   # blank
    (8, "the quick brown fox jumps over the lazy dog again "
        "and again and again"),
]


def _ds(docs, parts=3):
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string())})
    return ray.data.from_arrow(t).repartition(parts)


def test_matches_python_reference_all_pairs():
    got_t = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.01,
                                     num_shards=4))
    exp = _expected_pairs(DOCS, threshold=0.01)
    got = {}
    for r in got_t.to_pylist():
        got[(r["key_a"], r["key_b"])] = (r["n_common"], r["n_union"],
                                         r["jaccard"])
    assert set(got) == set(exp)
    for p, (i, u, j) in exp.items():
        gi, gu, gj = got[p]
        assert (gi, gu) == (i, u), p
        assert abs(gj - j) < 1e-12, p


def test_threshold_filters():
    got_t = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.9,
                                     num_shards=4))
    got = {(r["key_a"], r["key_b"]): r["jaccard"]
           for r in got_t.to_pylist()}
    exp = {p: v[2] for p, v in
           _expected_pairs(DOCS, threshold=0.9).items()}
    assert got.keys() == exp.keys()
    # exact dups at jaccard exactly 1.0
    assert got[(0, 1)] == 1.0
    assert got[(4, 5)] == 1.0


def test_max_df_drops_stop_shingles():
    # every shared shingle in the (0,1) exact-dup pair has df >= 2,
    # so max_df=1 must produce no pairs at all
    out = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.01,
                                   num_shards=4, max_df=1))
    assert out is None or out.num_rows == 0


def test_blank_and_null_docs_never_pair():
    got_t = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.0001,
                                     num_shards=4))
    ids = set()
    for r in got_t.to_pylist():
        ids.add(r["key_a"])
        ids.add(r["key_b"])
    assert 6 not in ids and 7 not in ids


def test_small_side_fast_path_parity():
    """size_hint_rows under threshold routes to the zero-exchange
    driver path; answers must be identical to the distributed plan
    (pairs, counts, jaccard) including max_df semantics, which are
    global in both paths."""
    for kw in ({}, {"max_df": 3}):
        dist = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.01,
                                        num_shards=4, **kw))
        fast = _tbl(ngram_jaccard_pairs(_ds(DOCS), threshold=0.01,
                                        num_shards=4,
                                        size_hint_rows=len(DOCS), **kw))
        def norm(t):
            if t is None:
                return {}
            return {(r["key_a"], r["key_b"]):
                    (r["n_common"], r["n_union"], round(r["jaccard"], 12))
                    for r in t.to_pylist()}
        assert norm(fast) == norm(dist)


def test_small_side_fast_path_empty_corpus():
    from pyschema_ray.functions.dedup import ngram_jaccard_pairs as f

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = f(ray.data.from_arrow(t), size_hint_rows=0)
    tab = _tbl(out)
    assert tab is None or tab.num_rows == 0
    sch = pa.schema(out.schema().base_schema)
    assert sch.names == ["key_a", "key_b", "n_common", "n_union",
                         "jaccard"]
