"""Round-5 operators: global ntile (window-function rank), Q10/Q18
shaped pipelines."""

import duckdb
import numpy as np
import pyarrow as pa

import ray


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _ref_ntile(vals, keys, k):
    """Reference ntile: sort by (val, key), split n rows into k buckets
    with the first n%k buckets one row larger (SQL ntile semantics)."""
    order = np.lexsort((keys, vals))
    n = len(vals)
    q, rem = divmod(n, k)
    out = np.empty(n, np.int64)
    r = np.arange(n)
    cutoff = rem * (q + 1)
    if q == 0:
        b = r + 1
    else:
        b = np.where(r < cutoff, r // (q + 1),
                     rem + (r - cutoff) // q) + 1
    out[order] = b
    return out


def _check(vals, keys, k, num_shards):
    from pyschema_ray.functions.ordered import global_ntile

    t = pa.table({"v": pa.array(vals, pa.int64()),
                  "key": pa.array(keys, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = _tbl(global_ntile(ds, "v", "key", k, num_shards=num_shards))
    got = {int(r["key"]): int(r["bucket"])
           for r in out.to_pylist()}
    ref = _ref_ntile(np.asarray(vals), np.asarray(keys), k)
    want = {int(kk): int(b) for kk, b in zip(keys, ref)}
    assert got == want
    # cross-check the reference itself against DuckDB's ntile
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    sql = con.execute(
        f"SELECT key, ntile({k}) OVER (ORDER BY v, key) b FROM t"
    ).fetchall()
    assert {int(a): int(b) for a, b in sql} == want


def test_global_ntile_matches_sql_with_ties():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40, size=500)          # heavy ties
    keys = rng.permutation(500)
    _check(vals, keys, 10, num_shards=8)


def test_global_ntile_n_smaller_than_k():
    _check([5, 3, 3], [1, 2, 3], 10, num_shards=4)


def test_global_ntile_single_hot_value():
    # one distinct value: rank is decided purely by key inside one shard
    vals = np.zeros(100, np.int64)
    keys = np.arange(100)[::-1].copy()
    _check(vals, keys, 7, num_shards=8)


def test_global_ntile_more_shards_than_values():
    _check([1, 1, 2, 2, 3, 3], [6, 5, 4, 3, 2, 1], 3, num_shards=64)


def test_global_ntile_empty():
    from pyschema_ray.functions.ordered import global_ntile

    t = pa.table({"v": pa.array([], pa.int64()),
                  "key": pa.array([], pa.int64())})
    out = _tbl(global_ntile(ray.data.from_arrow(t), "v", "key", 4))
    assert out is None or out.num_rows == 0


def _duck(sf_dir):
    con = duckdb.connect()
    for tname in ("lineitem", "orders", "customer", "nation",
                  "documents"):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tname}.parquet')")
    return con


def test_returned_item_revenue_vs_duckdb():
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["returned_item_revenue"](sf).to_pandas()
    want = _duck(sf).execute(e.oracle_sql()["returned_item_revenue"]).df()
    assert list(got.columns) == list(want.columns)
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()


def test_large_volume_customers_vs_duckdb():
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["large_volume_customers"](sf).to_pandas()
    want = _duck(sf).execute(e.oracle_sql()["large_volume_customers"]).df()
    assert list(got.columns) == list(want.columns)
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["sum_qty"].tolist() == want["sum_qty"].tolist()
    assert (got["o_totalprice_cents"].tolist()
            == want["o_totalprice_cents"].tolist())


def _spans(rows, k=3, min_docs=2):
    from pyschema_ray.functions.dedup import duplicated_spans

    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = _tbl(duplicated_spans(ray.data.from_arrow(t).repartition(3),
                                k=k, min_docs=min_docs, num_shards=4))
    if out is None:
        return []
    return sorted(zip(out["doc_id"].to_pylist(),
                      out["span_start"].to_pylist(),
                      out["span_end"].to_pylist()))


def test_duplicated_spans_overlap_merges_touch_breaks():
    # docs 1/2 share "a b c d" (windows at 0,1 overlap -> one span
    # [0,3]); docs 3/4 share "p q r" and "x y z" with a non-shared
    # word between -> two spans that touch but do not merge
    rows = [(1, "a b c d e"), (2, "z a b c d"),
            (3, "p q r w x y z"), (4, "p q r v x y z")]
    got = _spans(rows)
    assert (1, 0, 3) in got
    assert (2, 1, 4) in got
    assert (3, 0, 2) in got and (3, 4, 6) in got
    assert (4, 0, 2) in got and (4, 4, 6) in got
    assert (3, 0, 6) not in got


def test_duplicated_spans_same_doc_repeat_not_dup():
    # the trigram repeats WITHIN doc 1 only: df by distinct docs = 1
    rows = [(1, "a b c q a b c"), (2, "unrelated words here")]
    assert _spans(rows) == []


def test_duplicated_spans_short_doc_whole_text():
    # 2-word docs share their whole-text window -> span covers [0,1]
    rows = [(1, "hi there"), (2, "hi there"), (3, "solo doc words")]
    got = _spans(rows)
    assert (1, 0, 1) in got and (2, 0, 1) in got
    assert all(d != 3 for d, _, _ in got)


def test_duplicated_spans_empty_and_null():
    rows = [(1, ""), (2, None), (3, "one two three")]
    assert _spans(rows) == []


def test_remove_duplicated_spans_rewrite():
    from pyschema_ray.functions.dedup import remove_duplicated_spans

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["a b c d e", "z a b c d", "Solo Words Here now",
                 "", None]})
    out = _tbl(remove_duplicated_spans(
        ray.data.from_arrow(t).repartition(3), num_shards=4))
    rows = {r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in out.to_pylist()}
    assert rows[1] == ("e", 4)
    assert rows[2] == ("z", 4)
    # original case survives the rewrite; matching is lowercased
    assert rows[3] == ("Solo Words Here now", 0)
    assert 4 not in rows and 5 not in rows


def test_remove_duplicated_spans_whole_doc_removed():
    from pyschema_ray.functions.dedup import remove_duplicated_spans

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["same tiny doc", "same tiny doc"]})
    out = _tbl(remove_duplicated_spans(ray.data.from_arrow(t),
                                       num_shards=4))
    rows = {r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in out.to_pylist()}
    assert rows == {1: ("", 3), 2: ("", 3)}


def _brute_spans(docs, k=3, min_docs=2):
    """Pure-Python reference: gram df by distinct docs, positional
    hits, strict s > prev_end island merge."""
    words = {d: t.lower().split() for d, t in docs.items() if t}
    grams = {}   # gram -> set(doc)
    doc_grams = {}
    for d, w in words.items():
        gs = []
        if len(w) >= k:
            for i in range(len(w) - k + 1):
                gs.append((i, i + k - 1, " ".join(w[i:i + k])))
        elif w:
            gs.append((0, len(w) - 1, " ".join(w)))
        doc_grams[d] = gs
        for _, _, g in gs:
            grams.setdefault(g, set()).add(d)
    dup = {g for g, s in grams.items() if len(s) >= min_docs}
    out = []
    for d, gs in doc_grams.items():
        hits = [(s, e) for s, e, g in gs if g in dup]
        cur = None
        for s, e in hits:
            if cur is not None and s <= cur[1]:
                cur = (cur[0], max(cur[1], e))
            else:
                if cur:
                    out.append((d, *cur))
                cur = (s, e)
        if cur:
            out.append((d, *cur))
    return sorted(out)


def test_duplicated_spans_random_parity():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> many dups
    docs = {i: " ".join(rng.choice(vocab,
                                   size=rng.integers(0, 15)).tolist())
            for i in range(80)}
    got = _spans(sorted(docs.items()))
    assert got == _brute_spans(docs)


def test_duplicated_spans_random_parity_k5_min3():
    rng = np.random.default_rng(23)
    vocab = [f"t{i}" for i in range(8)]
    docs = {i: " ".join(rng.choice(vocab,
                                   size=rng.integers(0, 25)).tolist())
            for i in range(60)}
    got = _spans(sorted(docs.items()), k=5, min_docs=3)
    assert got == _brute_spans(docs, k=5, min_docs=3)


def test_small_quantity_revenue_vs_duckdb():
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["small_quantity_revenue"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(e.oracle_sql()["small_quantity_revenue"]).df()
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()


def test_exact_dedup_best_keys_policy():
    from pyschema_ray.functions.dedup import exact_dedup_best_keys

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["same", "same", "same", "other", "other"],
        "q": pa.array([10, 30, 30, 5, 5], pa.int64())})
    out = _tbl(exact_dedup_best_keys(
        ray.data.from_arrow(t).repartition(3), text_col="text",
        key_col="doc_id", score_col="q", num_shards=4))
    got = sorted(zip(out["doc_id"].to_pylist(), out["q"].to_pylist()))
    # "same": max q=30 tie between 2,3 -> min key 2; "other": tie -> 4
    assert got == [(2, 30), (4, 5)]


def test_grouped_rank_topk_tie_semantics():
    from pyschema_ray.functions.analytics import grouped_rank_topk

    # group a: x:3, y:3 (both rank 1), z:1 (rank 3 -- rank SKIPS 2)
    t = pa.table({
        "g": ["a"] * 7 + ["b"] * 2,
        "i": ["x", "x", "x", "y", "y", "y", "z", "p", "q"]})
    out = _tbl(grouped_rank_topk(ray.data.from_arrow(t).repartition(3),
                                 "g", "i", k=3, num_shards=4))
    got = sorted(zip(out["g"].to_pylist(), out["i"].to_pylist(),
                     out["n"].to_pylist(), out["rnk"].to_pylist()))
    assert got == [("a", "x", 3, 1), ("a", "y", 3, 1), ("a", "z", 1, 3),
                   ("b", "p", 1, 1), ("b", "q", 1, 1)]


def test_grouped_rank_topk_k_cut_keeps_ties():
    from pyschema_ray.functions.analytics import grouped_rank_topk

    # three items tied at rank 1, k=1 -> ALL three kept
    t = pa.table({"g": ["a"] * 3, "i": ["x", "y", "z"]})
    out = _tbl(grouped_rank_topk(ray.data.from_arrow(t), "g", "i",
                                 k=1, num_shards=2))
    assert sorted(out["i"].to_pylist()) == ["x", "y", "z"]
    assert out["rnk"].to_pylist() == [1, 1, 1]


def test_chunk_documents_windows_and_tail():
    from pyschema_ray.functions.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": [words, "a b", "", None]})
    out = _tbl(chunk_documents(ray.data.from_arrow(t).repartition(2),
                               width=4, stride=3))
    rows = sorted((r["doc_id"], r["chunk_id"], r["n_words"],
                   r["chunk_text"]) for r in out.to_pylist())
    # doc1: 10 words, starts 0,3,6,9 -> lens 4,4,4,1
    assert rows == [
        (1, 0, 4, "w0 w1 w2 w3"), (1, 1, 4, "w3 w4 w5 w6"),
        (1, 2, 4, "w6 w7 w8 w9"), (1, 3, 1, "w9"),
        (2, 0, 2, "a b")]


def test_chunk_documents_every_word_covered():
    from pyschema_ray.functions.text import chunk_documents

    rng = np.random.default_rng(5)
    texts = [" ".join(f"x{i}" for i in range(n))
             for n in rng.integers(1, 200, size=50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": texts})
    out = _tbl(chunk_documents(ray.data.from_arrow(t),
                               width=64, stride=48))
    covered = {}
    for r in out.to_pylist():
        s = r["chunk_id"] * 48
        covered.setdefault(r["doc_id"], set()).update(
            range(s, s + r["n_words"]))
    for d, txt in enumerate(texts):
        assert covered[d] == set(range(len(txt.split())))


def test_hash_vectorize_matches_pure_kernel_and_normalizes():
    from pyschema_ray.functions.text import (_hash_vector_matrix,
                                             hash_vectorize)

    texts = ["alpha beta beta gamma", "alpha", "", None,
             "delta epsilon zeta eta theta"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": texts})
    out = _tbl(hash_vectorize(ray.data.from_arrow(t).repartition(2),
                              dim=16))
    got = {r["doc_id"]: np.array(r["embedding"], np.float32)
           for r in out.to_pylist()}
    ref = _hash_vector_matrix(texts, dim=16, seed=7)
    for i in range(5):
        assert np.allclose(got[i], ref[i], atol=1e-6)
    norms = np.linalg.norm(ref, axis=1)
    assert np.allclose(norms[[0, 1, 4]], 1.0, atol=1e-5)
    assert norms[2] == 0.0 and norms[3] == 0.0


def test_chunk_ann_topk_self_match_rank1():
    import __ray_entry__ as e

    out = e.queries()["chunk_ann_topk"]("/root/testdata/sf0.001") \
        .to_pandas()
    # each query is the head chunk of doc q -> its own ckey
    # (doc_id*100000 + 0) must be the rank-1 hit with cosine ~1
    doc_ids = sorted(out["query_id"].unique())
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"]).sort_by("doc_id")
    first3 = docs["doc_id"].to_pylist()[:3]
    for q in doc_ids:
        top = out[(out.query_id == q) & (out["rank"] == 1)]
        assert top["ckey"].iloc[0] == first3[q] * 100000
        assert top["score_milli"].iloc[0] == 1000


def test_curated_documents_zero_survivor_path(tmp_path):
    """Whole-corpus-boilerplate regression: every word cut -> the
    composition must return an empty, correctly-typed table instead
    of crashing on a schemaless kept-key collect."""
    import pyarrow.parquet as pq
    import __ray_entry__ as e

    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": ["the same boilerplate paragraph again"] * 12,
        "lang": ["en"] * 12, "source": ["web"] * 12,
        "n_chars": pa.array([36] * 12, pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = e.queries()["curated_documents"](str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "clean_text"]


def test_shuffle_join_full_outer_both_null_sides():
    """Native full_outer: unmatched keys from EITHER side survive with
    the key coalesced into the single output key column and the other
    side's columns null-filled (the contract daily_orders_ship_full_join
    relies on)."""
    from pyschema_ray.functions.joins import shuffle_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "b": pa.array([200, 300, 400], pa.int64())}))
    out = _tbl(shuffle_join(left, right, on="k",
                            join_type="full_outer",
                            num_partitions=2)).sort_by("k")
    assert out["k"].to_pylist() == [1, 2, 3, 4]
    assert out["a"].to_pylist() == [10, 20, 30, None]
    assert out["b"].to_pylist() == [None, 200, 300, 400]


def test_daily_full_join_query_matches_duckdb(tmp_path):
    """End-to-end parity of the full-outer day rollup on a corpus
    engineered so both one-sided directions occur."""
    import datetime as dt

    import pyarrow.parquet as pq
    import __ray_entry__ as e

    d0 = dt.datetime(2024, 1, 1)
    odays = [0, 0, 1, 3]          # day 3 is order-only
    sdays = [0, 1, 1, 5, 5, 5]    # day 5 is ship-only
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(odays)), pa.int64()),
        "o_orderdate": pa.array([d0 + dt.timedelta(days=i)
                                 for i in odays], pa.timestamp("us")),
        "o_totalprice": pa.array([10.005, 20.0, 30.5, 40.444],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(len(sdays)), pa.int64()),
        "l_shipdate": pa.array([d0 + dt.timedelta(days=i)
                                for i in sdays], pa.timestamp("us")),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                               pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    got = e.queries()["daily_orders_ship_full_join"](
        str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(
        e.oracle_sql()["daily_orders_ship_full_join"]).df()
    assert len(got) == len(want) == 4
    for c in want.columns:
        gv = got[c].tolist()
        wv = want[c].tolist()
        assert [x if x == x else None for x in gv] == \
            [x if x == x else None for x in wv], c


def test_quantile_cont_matches_duckdb_all_sizes():
    """Interpolated quantiles (quantile_cont semantics) from the
    3-scan distributed selection match DuckDB within 1e-9 across
    sizes incl. n=1 (degenerate interpolation) and heavy ties."""
    from pyschema_ray.functions.analytics import \
        exact_value_quantiles_cont

    rng = np.random.default_rng(11)
    qs = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    cases = [
        np.array([42.0]),
        np.array([1.0, 2.0]),
        np.round(rng.normal(100, 37, 999), 4),
        np.repeat([5.0, 5.0, 9.0], 200),          # heavy ties
    ]
    for v in cases:
        ds = ray.data.from_arrow(pa.table(
            {"value": pa.array(v, pa.float64())})).repartition(3)
        got = exact_value_quantiles_cont(ds, "value", qs)["value"] \
            .to_pylist()
        con = duckdb.connect()
        con.register("t", pa.table({"value": pa.array(v)}))
        want = [r[0] for r in con.execute(
            "SELECT unnest(quantile_cont(value, "
            f"{list(qs)})) FROM t").fetchall()]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), \
            (got, want)


def test_grouped_string_agg_matches_duckdb():
    from pyschema_ray.functions.analytics import grouped_string_agg

    t = pa.table({
        "g": pa.array(["a", "a", "b", None, "b", "a", "c"],
                      pa.string()),
        "v": pa.array(["z", "m", "m", "m", None, "z", "only"],
                      pa.string())})
    out = _tbl(grouped_string_agg(
        ray.data.from_arrow(t).repartition(3), "g", "v",
        num_shards=4)).sort_by("g")
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT g, string_agg(DISTINCT v, ',' ORDER BY v) AS vals "
        "FROM t WHERE g IS NOT NULL AND v IS NOT NULL "
        "GROUP BY g ORDER BY g").fetchall()
    assert list(zip(out["g"].to_pylist(),
                    out["values"].to_pylist())) == want


def test_grouped_corr_exact_and_degenerate():
    """corr from integer moments: matches duckdb's HUGEINT-moment
    expression bit-for-bit; constant-x group yields null."""
    from pyschema_ray.functions.analytics import grouped_corr

    rng = np.random.default_rng(3)
    n = 5000
    g = np.where(rng.random(n) < 0.5, "p", "q").astype(object)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = 3.0 * x + rng.normal(0, 10, n)
    # a degenerate group: constant x -> zero variance -> NULL
    g2 = np.array(["z"] * 7, object)
    t = pa.table({
        "g": pa.array(np.r_[g, g2], pa.string()),
        "x": pa.array(np.r_[x, np.full(7, 4.0)], pa.float64()),
        "y": pa.array(np.r_[y, rng.normal(0, 1, 7)], pa.float64())})
    out = grouped_corr(ray.data.from_arrow(t).repartition(4),
                       "g", "x", "y")
    got = dict(zip(out["g"].to_pylist(), out["corr"].to_pylist()))
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        WITH v AS (SELECT g, CAST(round(x) AS HUGEINT) xx,
                          CAST(round(y) AS HUGEINT) yy FROM t),
        m AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(xx) sx,
                     sum(yy) sy, sum(xx*xx) sxx, sum(yy*yy) syy,
                     sum(xx*yy) sxy FROM v GROUP BY g)
        SELECT g, CASE WHEN n*sxx-sx*sx <= 0 OR n*syy-sy*sy <= 0
                       THEN NULL
                       ELSE CAST(n*sxy-sx*sy AS DOUBLE)
                            / (sqrt(CAST(n*sxx-sx*sx AS DOUBLE))
                               * sqrt(CAST(n*syy-sy*sy AS DOUBLE)))
                  END FROM m ORDER BY g""").fetchall()
    for gname, w in want:
        if w is None:
            assert got[gname] is None
        else:
            assert got[gname] == w, (gname, got[gname], w)
    assert got["z"] is None


def test_grouped_linreg_matches_duckdb_and_degenerate():
    from pyschema_ray.functions.analytics import grouped_linreg

    rng = np.random.default_rng(5)
    n = 4000
    g = np.where(rng.random(n) < 0.5, "p", "q").astype(object)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = -2.0 * x + 17 + rng.normal(0, 8, n)
    g2 = np.array(["z"] * 5, object)  # constant x -> null line
    t = pa.table({
        "g": pa.array(np.r_[g, g2], pa.string()),
        "x": pa.array(np.r_[x, np.full(5, 9.0)], pa.float64()),
        "y": pa.array(np.r_[y, rng.normal(0, 1, 5)], pa.float64())})
    out = grouped_linreg(ray.data.from_arrow(t).repartition(4),
                         "g", "x", "y")
    got = {r["g"]: (r["slope"], r["intercept"])
           for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        WITH v AS (SELECT g, CAST(round(x) AS HUGEINT) xx,
                          CAST(round(y) AS HUGEINT) yy FROM t),
        m AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(xx) sx,
                     sum(yy) sy, sum(xx*xx) sxx, sum(xx*yy) sxy
                FROM v GROUP BY g),
        s AS (SELECT g, n, sx, sy,
                     CASE WHEN n*sxx-sx*sx <= 0 THEN NULL
                          ELSE CAST(n*sxy-sx*sy AS DOUBLE)
                               / CAST(n*sxx-sx*sx AS DOUBLE)
                     END AS slope FROM m)
        SELECT g, slope,
               CASE WHEN slope IS NULL THEN NULL
                    ELSE (CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE) END
          FROM s ORDER BY g""").fetchall()
    for gname, slope, inter in want:
        assert got[gname] == (slope, inter), gname
    assert got["z"] == (None, None)


def test_grouped_entropy_known_values_and_nulls():
    """Uniform 4-way mix -> ln(4) micro-nats; single value -> 0;
    nulls dropped; int parity with the pure formula."""
    import math

    from pyschema_ray.functions.analytics import grouped_entropy

    vals = (["a", "b", "c", "d"] * 25          # g=u uniform over 4
            + ["x"] * 10                        # g=s single value
            + ["m"] * 30 + ["n"] * 10)          # g=w skewed 3:1
    gs = ["u"] * 100 + ["s"] * 10 + ["w"] * 40
    t = pa.table({
        "g": pa.array(gs + [None, "u"], pa.string()),
        "v": pa.array(vals + ["zz", None], pa.string())})
    out = grouped_entropy(ray.data.from_arrow(t).repartition(5),
                          "g", "v", num_shards=4)
    got = {r["g"]: (r["ndv"], r["entropy_micronat"])
           for b in out.iter_batches(batch_format="pyarrow",
                                     batch_size=None)
           for r in b.to_pylist()}

    def ref(counts):
        n = sum(counts)
        return sum(round(c / n * math.log(n / c) * 1e6)
                   for c in counts)

    assert got["u"] == (4, ref([25, 25, 25, 25]))
    assert abs(got["u"][1] - round(math.log(4) * 1e6)) <= 2
    assert got["s"] == (1, 0)
    assert got["w"] == (2, ref([30, 10]))


def test_global_rank_stats_matches_duckdb_with_ties_and_nulls():
    from pyschema_ray.functions.ordered import global_rank_stats

    rng = np.random.default_rng(13)
    v = rng.integers(0, 12, 300).astype(object)
    v[::37] = None                 # null values drop out of the frame
    t = pa.table({"k": pa.array(range(300), pa.int64()),
                  "v": pa.array(list(v), pa.int64())})
    out = _tbl(global_rank_stats(
        ray.data.from_arrow(t).repartition(4), "v", "k")) \
        .sort_by("k")
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        SELECT k, percent_rank() OVER (ORDER BY v) pr,
               cume_dist() OVER (ORDER BY v) cd
          FROM t WHERE v IS NOT NULL ORDER BY k""").fetchall()
    got = list(zip(out["k"].to_pylist(),
                   out["percent_rank"].to_pylist(),
                   out["cume_dist"].to_pylist()))
    assert len(got) == len(want)
    for (gk, gpr, gcd), (wk, wpr, wcd) in zip(got, want):
        assert gk == wk and gpr == wpr and gcd == wcd, (gk, wk)


def test_global_rank_stats_single_row_and_empty():
    from pyschema_ray.functions.ordered import global_rank_stats

    one = pa.table({"k": pa.array([7], pa.int64()),
                    "v": pa.array([5], pa.int64())})
    out = _tbl(global_rank_stats(ray.data.from_arrow(one), "v", "k"))
    assert out.to_pylist() == [{"k": 7, "v": 5, "percent_rank": 0.0,
                                "cume_dist": 1.0}]
    nothing = pa.table({"k": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64())})
    out2 = _tbl(global_rank_stats(ray.data.from_arrow(nothing),
                                  "v", "k"))
    assert out2 is None or out2.num_rows == 0


def test_grouped_weighted_avg_matches_duckdb_and_zero_weight():
    from pyschema_ray.functions.analytics import grouped_weighted_avg

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b", "z", "z"], pa.string()),
        "w": pa.array([10.0, 30.0, 5.0, 0.0, 0.0, 0.0], pa.float64()),
        "x": pa.array([1.0, 3.0, 7.0, 100.0, 4.0, 5.0], pa.float64())})
    out = grouped_weighted_avg(ray.data.from_arrow(t).repartition(3),
                               "g", "w", "x")
    got = dict(zip(out["g"].to_pylist(), out["wavg"].to_pylist()))
    # a: (10*1 + 30*3)/40 = 2.5 ; b: (5*7 + 0*100)/5 = 7 ; z: null
    assert got["a"] == 2.5
    assert got["b"] == 7.0
    assert got["z"] is None


def test_grouped_stddev_matches_duckdb_expression():
    from pyschema_ray.functions.analytics import grouped_stddev

    rng = np.random.default_rng(17)
    g = np.where(rng.random(500) < 0.5, "p", "q").astype(object)
    x = rng.integers(-30, 120, 500).astype(np.float64)
    t = pa.table({"g": pa.array(np.r_[g, ["solo"]], pa.string()),
                  "x": pa.array(np.r_[x, [9.0]], pa.float64())})
    out = grouped_stddev(ray.data.from_arrow(t).repartition(4),
                         "g", "x")
    got = {r["g"]: (r["stddev_samp"], r["stddev_pop"])
           for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        WITH v AS (SELECT g, CAST(round(x) AS HUGEINT) xx FROM t),
        m AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(xx) sx,
                     sum(xx*xx) sxx FROM v GROUP BY g)
        SELECT g,
               CASE WHEN n < 2 THEN NULL
                    ELSE sqrt(CAST(n*sxx-sx*sx AS DOUBLE)
                              / CAST(n*(n-1) AS DOUBLE)) END,
               sqrt(CAST(n*sxx-sx*sx AS DOUBLE)
                    / CAST(n*n AS DOUBLE))
          FROM m ORDER BY g""").fetchall()
    for gname, ws, wp in want:
        assert got[gname] == (ws, wp), gname
    assert got["solo"] == (None, 0.0)


def test_grouped_quantile_cont_unbounded_matches_duckdb():
    """Grouped 3-scan selection over unbounded doubles: parity with
    duckdb quantile_cont per group incl. a singleton group, nulls,
    NaNs, and a heavy-tie group (bucket fast path)."""
    from pyschema_ray.functions.analytics import \
        grouped_value_quantiles_cont

    rng = np.random.default_rng(23)
    n = 3000
    g = rng.choice(["a", "b"], n).astype(object)
    v = np.round(rng.normal(50, 20, n), 3)
    g2 = np.r_[g, ["solo"], ["ties"] * 50, [None], ["a"]]
    v2 = np.r_[v, [7.25], np.full(50, 4.0), [5.0], [np.nan]]
    t = pa.table({"g": pa.array(list(g2), pa.string()),
                  "v": pa.array(v2, pa.float64())})
    out = grouped_value_quantiles_cont(
        ray.data.from_arrow(t).repartition(5), "g", "v",
        (0.1, 0.5, 0.9), n_buckets=64)
    got = {r["g"]: (r["q_0.1"], r["q_0.5"], r["q_0.9"])
           for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        SELECT g, quantile_cont(v, 0.1), quantile_cont(v, 0.5),
               quantile_cont(v, 0.9)
          FROM t WHERE g IS NOT NULL AND v IS NOT NULL
           AND NOT isnan(v)
         GROUP BY g ORDER BY g""").fetchall()
    assert len(got) == len(want)
    for gname, a, b, c in want:
        for x, y in zip(got[gname], (a, b, c)):
            assert abs(x - y) < 1e-9, (gname, got[gname], (a, b, c))
    assert got["solo"] == (7.25, 7.25, 7.25)
    assert got["ties"] == (4.0, 4.0, 4.0)


def test_grouped_covar_matches_duckdb_expression():
    from pyschema_ray.functions.analytics import grouped_covar

    rng = np.random.default_rng(29)
    g = np.where(rng.random(400) < 0.5, "p", "q").astype(object)
    x = rng.integers(0, 60, 400).astype(np.float64)
    y = 2.0 * x + rng.normal(0, 5, 400)
    t = pa.table({"g": pa.array(np.r_[g, ["solo"]], pa.string()),
                  "x": pa.array(np.r_[x, [3.0]], pa.float64()),
                  "y": pa.array(np.r_[y, [4.0]], pa.float64())})
    out = grouped_covar(ray.data.from_arrow(t).repartition(4),
                        "g", "x", "y")
    got = {r["g"]: (r["covar_samp"], r["covar_pop"])
           for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        WITH v AS (SELECT g, CAST(round(x) AS HUGEINT) xx,
                          CAST(round(y) AS HUGEINT) yy FROM t),
        m AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(xx) sx,
                     sum(yy) sy, sum(xx*yy) sxy FROM v GROUP BY g)
        SELECT g,
               CASE WHEN n < 2 THEN NULL
                    ELSE CAST(n*sxy-sx*sy AS DOUBLE)
                         / CAST(n*(n-1) AS DOUBLE) END,
               CAST(n*sxy-sx*sy AS DOUBLE) / CAST(n*n AS DOUBLE)
          FROM m ORDER BY g""").fetchall()
    for gname, ws, wp in want:
        assert got[gname] == (ws, wp), gname
    assert got["solo"] == (None, 0.0)
