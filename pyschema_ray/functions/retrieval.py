"""BM25 ranked retrieval over a document corpus, Ray-Data-first.

The classic Okapi BM25 scorer (Robertson & Walker 1994; the
``(k1+1)``-numerator variant popularized by Lucene — public
algorithm) recast as ONE streaming corpus pass plus small-table math:

1. **Posting pass** (``map_batches``, Arrow in/out): one regex split
   per batch, per-doc term frequencies for the QUERY terms via
   searchsorted + bincount over composed (doc, term) codes — never a
   Python loop over rows.  Emits one row per (document, matching
   term) carrying ``tf`` and the doc length, plus one SENTINEL row
   per batch (``term=""``) carrying the batch's doc count and total
   token count, so corpus statistics (N, avgdl) ride the same pass —
   the corpus is read exactly ONCE.
2. The posting rows are ``materialize()``-d: they are the query's
   posting lists — bounded by matching docs × terms, orders of
   magnitude below corpus size for selective queries (the documented
   partitioning contract; Ray spills to the object store when they
   are large).
3. ``df`` per term, ``N`` and ``avgdl`` reduce driver-side from
   O(batches × terms) partials; idf uses the sanitized
   ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (non-negative for df ≤ N).
4. **Score + rank**: per-row BM25 term scores (numpy over the
   posting rows), per-doc sums on a bounded key-hash shard exchange,
   scores rounded to 6 decimals BEFORE ranking (ties then break
   ascending on the key) so the ranking is float-order-robust and
   SQL-oracle-reproducible; top-k via per-shard head + final head
   (exact — each doc's score lives wholly in one shard).

Tokenization matches :mod:`.text` (``TOKEN_SPLIT_RE`` whitespace
split, lowercased, empties dropped), so df/tf agree with
``word_frequencies`` / ``doc_frequencies`` by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL = ""


def _tf_pass(terms_sorted: np.ndarray, text_col: str, key_col: str):
    """Build the posting-pass batch fn for a fixed sorted term set."""
    n_terms = len(terms_sorted)

    def fn(t: pa.Table) -> pa.Table:
        from .text import TOKEN_SPLIT_RE

        col = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.fill_null(t[text_col], "")))
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets).astype(np.int64)
        flat = parts.values.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
        words = flat.to_numpy(zero_copy_only=False)
        nonempty = words != ""
        cum = np.r_[np.int64(0), np.cumsum(nonempty)]
        dl = cum[offs[1:]] - cum[offs[:-1]]          # per-doc length
        words = words[nonempty]
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offs))[nonempty]
        idx = np.searchsorted(terms_sorted, words)
        idx = np.minimum(idx, n_terms - 1)
        hit = terms_sorted[idx] == words
        codes = doc_idx[hit] * np.int64(n_terms) + idx[hit]
        tf = np.bincount(codes, minlength=t.num_rows * n_terms) \
            .astype(np.int64)
        nz = np.flatnonzero(tf)
        d, w = nz // n_terms, nz % n_terms
        keys = t[key_col].take(pa.array(d, pa.int64()))
        key_type = t.schema.field(key_col).type
        # sentinel row: batch doc count + total token count (N/avgdl
        # partials ride the same pass — corpus read once)
        sent_key = pa.array([None], key_type)
        return pa.table({
            key_col: pa.concat_arrays(
                [keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
                 else keys, sent_key]),
            "term": pa.array(
                list(terms_sorted[w]) + [_SENTINEL], pa.string()),
            "tf": pa.array(np.r_[tf[nz], np.int64(t.num_rows)],
                           pa.int64()),
            "dl": pa.array(np.r_[dl[d], dl.sum()], pa.int64()),
        })

    return fn


def bm25_rank(ds, terms, text_col: str = "text", key_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75, top_k: int = 10,
              num_shards: int | None = None):
    """Top-k documents for a bag-of-words query under BM25.

    -> pa.Table(key_col, score, rank) with ``score`` rounded to 6
    decimals and ``rank`` in 1..top_k (ties: score desc, key asc).
    """
    from .dedup import _key_shards
    from ..sketches import default_exchange_shards

    terms_sorted = np.unique(np.asarray(list(terms), dtype=object))
    if len(terms_sorted) == 0:
        raise ValueError("bm25_rank needs at least one query term")
    nb = num_shards or default_exchange_shards()

    tf = ds.map_batches(_tf_pass(terms_sorted, text_col, key_col),
                        batch_format="pyarrow").materialize()

    # ---- small-table statistics: O(batches x terms) partials ----
    def partial_stats(t: pa.Table) -> pa.Table:
        sent = pc.equal(t["term"], _SENTINEL)
        n_docs = pc.sum(pc.filter(t["tf"], sent), min_count=0).as_py()
        tot_len = pc.sum(pc.filter(t["dl"], sent), min_count=0).as_py()
        posts = t.filter(pc.invert(sent))
        vc = posts["term"].combine_chunks().value_counts() \
            if posts.num_rows else None
        dterms = vc.field("values").to_pylist() if vc is not None else []
        dcounts = (pc.cast(vc.field("counts"), pa.int64()).to_pylist()
                   if vc is not None else [])
        return pa.table({
            "term": pa.array(dterms + [_SENTINEL], pa.string()),
            "df": pa.array(dcounts + [0], pa.int64()),
            "n_docs": pa.array([0] * len(dterms) + [int(n_docs or 0)],
                               pa.int64()),
            "tot_len": pa.array([0] * len(dterms) + [int(tot_len or 0)],
                                pa.int64()),
        })

    stat_parts = [x for x in
                  tf.map_batches(partial_stats, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None) if x.num_rows]
    if stat_parts:
        stats = pa.concat_tables(stat_parts)
        n_total = pc.sum(stats["n_docs"]).as_py() or 0
        tot_len = pc.sum(stats["tot_len"]).as_py() or 0
    else:  # empty corpus: zero stats batches
        n_total = tot_len = 0
    def _key_type() -> pa.DataType:
        # derive the key type from the tf (or, when tf is all
        # fabricated empty blocks, the input) schema — hardcoding
        # string would mismatch int64 doc-id corpora
        for d in (tf, ds):
            sch = d.schema()
            if sch is None:
                continue
            base = pa.schema(sch.base_schema)
            if key_col in base.names:
                return base.field(key_col).type
        return pa.string()

    if n_total == 0:
        return pa.table({key_col: pa.array([], _key_type()),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    avgdl = tot_len / n_total
    df_tab = stats.filter(pc.not_equal(stats["term"], _SENTINEL)) \
        .group_by("term").aggregate([("df", "sum")])
    df_map = dict(zip(df_tab["term"].to_pylist(),
                      df_tab["df_sum"].to_pylist()))
    df_arr = np.array([df_map.get(t, 0) for t in terms_sorted],
                      np.float64)
    idf = np.log((n_total - df_arr + 0.5) / (df_arr + 0.5) + 1.0)

    # ---- score + bounded shard exchange + exact top-k ----
    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["term"], _SENTINEL))
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], t.schema
                                               .field(key_col).type),
                             "s": pa.array([], pa.float64()),
                             "kshard": pa.array([], pa.int64())})
        w = np.searchsorted(terms_sorted,
                            t["term"].to_numpy(zero_copy_only=False))
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dlv = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = idf[w] * tfv * (k1 + 1.0) \
            / (tfv + k1 * (1.0 - b + b * dlv / avgdl))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: t[key_col],
            "s": pa.array(s, pa.float64()),
            "kshard": pa.array(_key_shards(keys, nb, 73), pa.int64()),
        })

    def reduce_shard(t: pa.Table) -> pa.Table:
        g = t.group_by(key_col).aggregate([("s", "sum")])
        sc = np.round(g["s_sum"].to_numpy(zero_copy_only=False), 6)
        out = pa.table({key_col: g[key_col],
                        "score": pa.array(sc, pa.float64())})
        out = out.sort_by([("score", "descending"),
                           (key_col, "ascending")])
        return out.slice(0, top_k)

    cand = tf.map_batches(score, batch_format="pyarrow") \
        .groupby("kshard") \
        .map_groups(lambda t: reduce_shard(t.drop_columns(["kshard"])),
                    batch_format="pyarrow")
    parts = [x for x in cand.iter_batches(batch_format="pyarrow", batch_size=None)
             if x.num_rows]
    if not parts:
        key_type = _key_type()
        return pa.table({key_col: pa.array([], key_type),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    head = pa.concat_tables(parts)
    head = head.sort_by([("score", "descending"), (key_col, "ascending")])
    head = head.slice(0, top_k)
    return head.append_column(
        "rank", pa.array(np.arange(1, head.num_rows + 1), pa.int64()))
