"""Tests for the training-data ops: text analysis, dedup (exact /
MinHash-LSH / SimHash / Jaccard), similarity search, multimodal
plumbing."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray.functions import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents_ds():
    import ray.data
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_token_count_matches_sql(documents_ds):
    got = pa.concat_tables(
        documents_ds.map_batches(text.token_count_batch,
                                 batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    con = duckdb.connect()
    want = con.execute(
        f"SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) "
        f"AS n_tokens FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).arrow()
    assert got["n_tokens"].to_pylist() == want["n_tokens"].to_pylist()


def test_quality_features_and_score(documents_ds):
    out = pa.concat_tables(
        documents_ds.map_batches(text.quality_score_batch,
                                 batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    assert out.num_rows == documents_ds.count()
    scores = out["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    # word-soup docs with 10+ words and no digits should score high
    n_words = out["n_words"].to_pylist()
    for s, w in zip(scores, n_words):
        if w >= 10:
            assert s > 0.5


def test_lang_id_deterministic_and_closed_domain(documents_ds):
    out1 = pa.concat_tables(
        documents_ds.map_batches(text.LangIdScorer, concurrency=2,
                                 batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    out2 = pa.concat_tables(
        documents_ds.map_batches(text.LangIdScorer, concurrency=2,
                                 batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    assert out1["lang_pred"].to_pylist() == out2["lang_pred"].to_pylist()
    domain = set(text._LANG_MARKERS) | {"und"}
    assert set(out1["lang_pred"].to_pylist()) <= domain


def test_lang_id_on_real_phrases():
    t = pa.table({"text": pa.array([
        "the cat is on the mat and the dog was here",
        "el perro y la casa que una vez por el camino",
        "der Hund und die Katze ist nicht ein Problem",
        "le chat est dans la maison pour les enfants",
        "我是他的朋友 他不在了",
    ])})
    out = text.LangIdScorer()(t)
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "fr", "zh"]


def test_fingerprint_equal_iff_equal_text():
    t = pa.table({"text": pa.array(["aaa", "bbb", "aaa"])})
    out = text.fingerprint_batch(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[2] != fp[1]
    assert all(len(f) == 16 for f in fp)


def test_winnow_fingerprints_substring_guarantee():
    """The winnowing guarantee: documents sharing a substring of length
    >= window + k - 1 share at least one fingerprint; identical docs
    have identical fingerprint sets; disjoint-alphabet docs share none.
    Also position-invariant for the shared block."""
    import numpy as np

    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    a = "PREFIX AAAA " + shared + " SUFFIX BBBB"
    b = "zzz 123456 " + shared + " qqq other tail"
    c = "completely different content with no overlap whatsoever 999"
    t = pa.table({"text": pa.array([a, b, c, a, "", "x"])})
    out = text.winnow_fingerprints_batch(t, k=8, window=16)
    fps = [set(x) for x in out["fingerprints"].to_pylist()]
    assert fps[0] & fps[1]            # shared substring -> shared prints
    assert not (fps[0] & fps[2])      # disjoint content -> none shared
    assert fps[0] == fps[3]           # identical text -> identical set
    assert fps[4] == set()            # empty text
    assert len(fps[5]) == 1           # shorter than k: one whole-text hash
    # sets are sorted unique int64 lists
    raw = out["fingerprints"].to_pylist()[0]
    assert raw == sorted(set(raw))
    assert all(isinstance(v, int) for v in raw)
    # deterministic across calls
    out2 = text.winnow_fingerprints_batch(t, k=8, window=16)
    assert out["fingerprints"].to_pylist() == \
        out2["fingerprints"].to_pylist()
    # coverage density ~ 2/(window+1) of grams (winnowing property)
    n_grams = len(a.encode()) - 8 + 1
    assert len(fps[0]) <= n_grams
    assert len(fps[0]) >= n_grams // (16 + 1)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dup_docs():
    """10 unique docs; doc 3/13 exact dups; 5/15 near dups (one word
    changed); the rest distinct."""
    base = ("spark batch window order data column agg join small line "
            "customer query value table key scan fast merge sort stream")
    texts, ids = [], []
    for i in range(10):
        words = base.split()
        words = words[i:] + words[:i]
        texts.append(" ".join(words))
        ids.append(i)
    texts.append(texts[3])          # exact dup of 3
    ids.append(13)
    near = texts[5].split()
    near[10] = "changed"            # near dup of 5
    texts.append(" ".join(near))
    ids.append(15)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_exact_dedup(dup_docs):
    import ray.data
    ds = ray.data.from_arrow(dup_docs)
    kept = sorted(r["doc_id"] for r in
                  dedup.exact_dedup_keys(ds).take_all())
    assert kept == sorted([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 15])
    groups = dedup.exact_duplicate_groups(ds).take_all()
    assert len(groups) == 1 and groups[0]["dup_count"] == 2


def test_minhash_lsh_finds_near_dups(dup_docs):
    import ray.data
    ds = ray.data.from_arrow(dup_docs)
    cand = dedup.minhash_lsh_candidates(ds, num_hashes=64, bands=16,
                                        concurrency=2)
    pairs = {(r["key_a"], r["key_b"]) for r in cand.take_all()}
    assert (3, 13) in pairs        # exact dup always co-buckets
    assert (5, 15) in pairs        # near dup co-buckets in >=1 band
    verified = dedup.jaccard_verify_pairs(
        pa.table({"key_a": pa.array([a for a, _ in pairs], pa.int64()),
                  "key_b": pa.array([b for _, b in pairs], pa.int64())}),
        dup_docs, threshold=0.5)
    vp = {(a, b) for a, b in zip(verified["key_a"].to_pylist(),
                                 verified["key_b"].to_pylist())}
    assert (3, 13) in vp and (5, 15) in vp
    jac = dict(zip(zip(verified["key_a"].to_pylist(),
                       verified["key_b"].to_pylist()),
                   verified["jaccard"].to_pylist()))
    assert jac[(3, 13)] == 1.0
    assert 0.5 <= jac[(5, 15)] < 1.0


def test_simhash_near_dups(dup_docs):
    import ray.data
    ds = ray.data.from_arrow(dup_docs)
    sigs = pa.concat_tables(
        ds.map_batches(dedup.SimHasher, concurrency=2,
                       batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    s = dict(zip(sigs["doc_id"].to_pylist(), sigs["simhash"].to_pylist()))
    assert s[3] == s[13]  # identical text -> identical signature
    ham_near = bin(s[5] ^ s[15]).count("1")
    assert ham_near <= 8  # one word changed out of 20
    pairs = dedup.simhash_near_dups(ds, max_hamming=3, concurrency=2)
    got = {(r["key_a"], r["key_b"]) for r in pairs.take_all()}
    assert (3, 13) in got


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def test_brute_force_topk_self_is_top1():
    import ray.data
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    first = ds.take(3)
    q = np.stack([np.asarray(r["embedding"], dtype=np.float32)
                  for r in first])
    out = similarity.brute_force_topk(ds, q, k=5)
    for qi, r in enumerate(first):
        sel = out.filter(pa.compute.equal(out["query_id"], qi))
        assert sel.num_rows == 5
        top = sel.filter(pa.compute.equal(sel["rank"], 1))
        assert top["vec_id"][0].as_py() == r["vec_id"]
        assert abs(top["score"][0].as_py() - 1.0) < 1e-5
        scores = sel.sort_by("rank")["score"].to_pylist()
        assert scores == sorted(scores, reverse=True)


def test_lsh_topk_contains_self():
    import ray.data
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    first = ds.take(2)
    q = np.stack([np.asarray(r["embedding"], dtype=np.float32)
                  for r in first])
    out = similarity.lsh_topk(ds, q, k=5, n_planes=4)
    for qi, r in enumerate(first):
        sel = out.filter(pa.compute.equal(out["query_id"], qi))
        top = sel.filter(pa.compute.equal(sel["rank"], 1))
        assert top["vec_id"][0].as_py() == r["vec_id"]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_fake_pipeline():
    import ray.data
    t = multimodal.synth_media_table(48)
    assert t.schema.equals(multimodal.MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    out = pa.concat_tables(
        multimodal.decode_images(ds, fake=True, concurrency=2, batch_size=16)
        .iter_batches(batch_format="pyarrow"))
    assert out.num_rows == 48
    assert "payload" not in out.column_names  # payload dropped post-decode
    assert out["image_features"].type.list_size == 8
    # determinism: same payload -> same features
    out2 = pa.concat_tables(
        multimodal.decode_images(ray.data.from_arrow(t), fake=True,
                                 concurrency=2, batch_size=16)
        .iter_batches(batch_format="pyarrow"))
    assert out.sort_by("media_id").equals(out2.sort_by("media_id"))

    audio = pa.concat_tables(
        multimodal.sample_audio_frames(ds, fake=True, concurrency=2)
        .iter_batches(batch_format="pyarrow"))
    assert audio["frame_energy"].type.list_size == 4


def test_multimodal_real_path_raises():
    dec = multimodal.ImageDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"\x00\x01")
    vs = multimodal.VideoFrameSampler(fake=False)
    with pytest.raises(NotImplementedError):
        vs._decode_one(b"\x00\x01", 0)


def test_video_frame_explode_and_embed():
    """Video frame-sampling explodes one row per frame; the embedding
    stage consumes feature columns with one batched matmul."""
    import ray.data

    t = multimodal.synth_media_table(12)
    t = t.set_column(t.schema.get_field_index("media_type"), "media_type",
                     pa.array(["video"] * 12, pa.string()))
    t = t.set_column(t.schema.get_field_index("duration_ms"), "duration_ms",
                     pa.array([8000] * 12, pa.int32()))
    ds = ray.data.from_arrow(t)
    frames = pa.concat_tables(
        multimodal.sample_video_frames(ds, n_frames=4, fake=True,
                                       concurrency=2)
        .iter_batches(batch_format="pyarrow"))
    assert frames.num_rows == 12 * 4
    assert frames["frame_features"].type.list_size == 8
    by_media = frames.group_by("media_id").aggregate(
        [("frame_index", "count")])
    assert set(by_media["frame_index_count"].to_pylist()) == {4}
    # timestamps evenly spaced over duration
    import pyarrow.compute as pc
    one = frames.filter(pc.equal(frames["media_id"], "m-000000")) \
                .sort_by("frame_index")
    assert one["timestamp_ms"].to_pylist() == [0, 2000, 4000, 6000]

    emb = pa.concat_tables(
        multimodal.embed_features(
            ray.data.from_arrow(frames), in_dim=8, out_dim=16,
            features_col="frame_features", concurrency=2)
        .iter_batches(batch_format="pyarrow"))
    assert emb["embedding"].type.list_size == 16
    assert emb.num_rows == 48
    # deterministic: same weights on every actor, no broadcast needed
    m = multimodal.EmbeddingModel(features_col="frame_features")
    direct = m(frames.slice(0, 5))
    got = emb.sort_by([("media_id", "ascending"),
                       ("frame_index", "ascending")]).slice(0, 5)
    want = direct.sort_by([("media_id", "ascending"),
                           ("frame_index", "ascending")])
    assert np.allclose(np.asarray(got["embedding"].to_pylist()),
                       np.asarray(want["embedding"].to_pylist()),
                       rtol=1e-5, atol=1e-5)


def test_cosine_near_dup_pairs_and_lsh():
    import ray.data
    from pyschema_ray.functions.similarity import (cosine_near_dup_pairs,
                                                   cosine_near_dups_lsh)
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_near_dup_pairs(ds, threshold=0.5)
    got = set(zip(exact["key_a"].to_pylist(), exact["key_b"].to_pylist()))
    # brute-force numpy reference
    t = __import__("pyarrow.parquet", fromlist=["pq"]).read_table(
        f"{SF_DIR}/embeddings.parquet")
    m = np.stack([np.asarray(v, np.float32)
                  for v in t["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    keys = np.asarray(t["vec_id"].to_pylist())
    sims = m @ m.T
    ai, bi = np.nonzero(np.triu(sims >= 0.5, k=1))
    want = {(min(keys[a], keys[b]), max(keys[a], keys[b]))
            for a, b in zip(ai, bi)}
    assert got == want
    # LSH variant returns a subset (recall <= 1) of the exact pairs
    lsh = cosine_near_dups_lsh(ds, threshold=0.5, n_planes=4)
    lp = {(r["key_a"], r["key_b"]) for r in lsh.take_all()}
    assert lp <= want


# ---------------------------------------------------------------------------
# joins + sessionization
# ---------------------------------------------------------------------------

def test_broadcast_and_shuffle_join_agree():
    import ray.data
    from pyschema_ray.functions.joins import broadcast_join, shuffle_join
    import pyarrow.parquet as pq
    cust = ray.data.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pq.read_table(f"{SF_DIR}/nation.parquet")
    b = pa.concat_tables(
        broadcast_join(cust, nation, keys="c_nationkey",
                       right_keys="n_nationkey")
        .iter_batches(batch_format="pyarrow"))
    nation_ds = ray.data.read_parquet(f"{SF_DIR}/nation.parquet")
    s = pa.concat_tables(
        shuffle_join(cust, nation_ds, on="c_nationkey",
                     right_on="n_nationkey", num_partitions=4)
        .iter_batches(batch_format="pyarrow"))
    assert b.num_rows == s.num_rows == cust.count()
    bk = sorted(zip(b["c_custkey"].to_pylist(), b["n_name"].to_pylist()))
    sk = sorted(zip(s["c_custkey"].to_pylist(), s["n_name"].to_pylist()))
    assert bk == sk


def test_sessionize_detail():
    import ray.data
    from pyschema_ray.functions.joins import sessionize
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        {"uid": 1, "ts": t0},
        {"uid": 1, "ts": t0 + dt.timedelta(minutes=5)},
        {"uid": 1, "ts": t0 + dt.timedelta(hours=2)},   # new session
        {"uid": 2, "ts": t0},
    ]
    ds = ray.data.from_items(rows)
    out = pa.concat_tables(
        sessionize(ds, "uid", "ts", gap_seconds=1800)
        .iter_batches(batch_format="pyarrow"))
    got = sorted(zip(out["uid"].to_pylist(), out["session_id"].to_pylist(),
                     out["n_events"].to_pylist()))
    assert got == [(1, 0, 2), (1, 1, 1), (2, 0, 1)]


def test_dedup_keep_keys_composed():
    import ray.data
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(6):  # six genuinely distinct docs (disjoint-ish words)
        words = list(rng.choice(vocab, size=30, replace=False))
        texts.append(" ".join(words))
        ids.append(i)
    texts.append(texts[2])                      # 10: exact dup of 2
    ids.append(10)
    near = texts[4].split()
    near[7] = "zzz"                             # 11: near dup of 4
    texts.append(" ".join(near))
    ids.append(11)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    keep = dedup.dedup_keep_keys(ds, jaccard_threshold=0.5, concurrency=2)
    # exact dup 10 (of 2) and near dup 11 (of 4) dropped; rest kept
    assert keep["doc_id"].to_pylist() == [0, 1, 2, 3, 4, 5]


def test_ivf_topk_recall():
    import ray.data
    from pyschema_ray.functions.similarity import (build_ivf_centroids,
                                                   brute_force_topk,
                                                   ivf_topk)
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    cents = build_ivf_centroids(ds, n_cells=8, sample_size=500)
    assert cents.shape == (8, 64)
    first = ds.take(3)
    q = np.stack([np.asarray(r["embedding"], dtype=np.float32)
                  for r in first])
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, cents, k=5, nprobe=4)
    for qi, r in enumerate(first):
        sel = approx.filter(pa.compute.equal(approx["query_id"], qi))
        top = sel.filter(pa.compute.equal(sel["rank"], 1))
        assert top["vec_id"][0].as_py() == r["vec_id"]  # self found
        ex = exact.filter(pa.compute.equal(exact["query_id"], qi))
        recall = len(set(sel["vec_id"].to_pylist())
                     & set(ex["vec_id"].to_pylist())) / 5
        assert recall >= 0.4, (qi, recall)  # half the cells probed


def test_asof_join():
    import ray.data
    import datetime as dt
    from pyschema_ray.functions.joins import asof_join
    t0 = dt.datetime(2026, 1, 1)

    trades = ray.data.from_items([
        {"sym": "A", "ts": t0 + dt.timedelta(seconds=s), "qty": q}
        for s, q in [(10, 1), (35, 2), (70, 3)]
    ] + [{"sym": "B", "ts": t0 + dt.timedelta(seconds=20), "qty": 9}])
    quotes = ray.data.from_items([
        {"sym": "A", "ts": t0 + dt.timedelta(seconds=s), "px": p}
        for s, p in [(0, 100.0), (30, 101.0), (60, 102.0)]
    ] + [{"sym": "B", "ts": t0, "px": 50.0}])

    out = pa.concat_tables(
        asof_join(trades, quotes, "sym", "ts")
        .iter_batches(batch_format="pyarrow"))
    rows = sorted(((r["sym"], r["qty"], r["px"])
                   for r in out.to_pylist()))
    assert rows == [("A", 1, 100.0), ("A", 2, 101.0), ("A", 3, 102.0),
                    ("B", 9, 50.0)]


def test_redact_pii_batch():
    t = pa.table({"text": pa.array([
        "mail me at jane.doe+x@sub.example.co.uk today",
        "call 555-867-5309 or 555 123 4567",
        "server at 192.168.1.100 port 80",
        "ssn 123-45-6789 leaked",
        "nothing sensitive here",
        None,
    ])})
    out = text.redact_pii_batch(t)["text"].to_pylist()
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "call <PHONE> or <PHONE>"
    assert out[2] == "server at <IP> port 80"
    assert out[3] == "ssn <SSN> leaked"
    assert out[4] == "nothing sensitive here"
    assert out[5] is None


def test_normalize_text_batch():
    t = pa.table({"text": pa.array([
        "  a\t\tb\n c  ",
        "école",          # decomposed e + combining acute
        "already clean",
        None,
    ])})
    out = text.normalize_text_batch(t)["text"].to_pylist()
    assert out[0] == "a b c"
    assert out[1] == "école"  # precomposed after NFC
    assert out[2] == "already clean"
    assert out[3] is None


def test_sliding_window_aggregate_invariants():
    """Each event contributes to exactly window/slide windows; sums are
    exact int arithmetic."""
    import datetime as dt
    import ray.data
    from pyschema_ray.functions.windows import sliding_window_aggregate

    rows = []
    base = dt.datetime(2024, 1, 1, 0, 30)
    for i in range(100):
        rows.append({"event_type": "a" if i % 2 else "b",
                     "ts": base + dt.timedelta(minutes=7 * i),
                     "value": float(i) / 4})
    ds = ray.data.from_items(rows)
    out = pa.concat_tables(
        sliding_window_aggregate(ds, window_s=7200, slide_s=3600)
        .iter_batches(batch_format="pyarrow"))
    # every event counted twice (2h window / 1h slide)
    assert sum(out["n_events"].to_pylist()) == 200
    assert sum(out["sum_scaled"].to_pylist()) == \
        2 * sum(round(i / 4 * 100) for i in range(100))
    # window starts are slide-aligned
    assert all(w % 3600 == 0 for w in out["window_start"].to_pylist())
    with pytest.raises(ValueError):
        sliding_window_aggregate(ds, window_s=5000, slide_s=3600)


def test_grouped_topk_matches_pandas():
    import ray.data
    from pyschema_ray.functions.analytics import grouped_topk

    rng = np.random.default_rng(9)
    n = 5000
    t = pa.table({
        "grp": pa.array(rng.choice(["x", "y", "z", "w"], size=n)),
        "score": pa.array(rng.integers(0, 50, size=n), pa.int64()),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = grouped_topk(ds, "grp", "score", k=5, tiebreak_col="id")
    got = sorted((r["grp"], r["id"], r["score"]) for r in out.take_all())
    df = t.to_pandas().sort_values(["grp", "score", "id"],
                                   ascending=[True, False, True])
    want = sorted(map(tuple, df.groupby("grp").head(5)
                      [["grp", "id", "score"]].itertuples(index=False)))
    assert got == want


def test_broadcast_range_join_count():
    import datetime as dt
    import ray.data
    from pyschema_ray.functions.joins import broadcast_range_join_count

    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(minutes=m) for m in range(0, 300, 5)]  # 60
    ds = ray.data.from_items([{"ts": t} for t in ts]).repartition(4)
    intervals = pa.table({
        "interval_id": pa.array([0, 1, 2], pa.int64()),
        "start": pa.array([base, base + dt.timedelta(hours=1),
                           base + dt.timedelta(hours=10)],
                          pa.timestamp("us")),
        "end": pa.array([base + dt.timedelta(hours=1),
                         base + dt.timedelta(hours=3),
                         base + dt.timedelta(hours=11)],
                        pa.timestamp("us")),
    })
    out = broadcast_range_join_count(ds, intervals).sort_by("interval_id")
    # [0,1h): minutes 0..55 -> 12 events; [1h,3h): 60..175 -> 24;
    # [10h,11h): none (zero-count interval still present)
    assert out["interval_id"].to_pylist() == [0, 1, 2]
    assert out["n_events"].to_pylist() == [12, 24, 0]


def test_copartition_range_join_matches_broadcast():
    """The co-partitioned (non-broadcast) range join must produce
    exactly the broadcast variant's counts — including intervals that
    span multiple time buckets (clipped replication, no double count)
    and zero-match intervals."""
    import ray.data

    from pyschema_ray.functions.joins import (broadcast_range_join_count,
                                              copartition_range_join_count)

    rng = np.random.default_rng(5)
    base = 1_700_000_000_000_000  # µs epoch
    ts = base + rng.integers(0, 48 * 3600, size=2000) * 1_000_000
    events = pa.table({"ts": pa.array(ts.astype("datetime64[us]"))})

    starts, ends, ids = [], [], []
    for i in range(40):
        s = base + int(rng.integers(0, 40 * 3600)) * 1_000_000
        # lengths from minutes to 9 hours — many span several 1h buckets
        ln = int(rng.integers(60, 9 * 3600)) * 1_000_000
        ids.append(i)
        starts.append(s)
        ends.append(s + ln)
    ids.append(999)  # zero-match interval far outside the event range
    starts.append(base + 400 * 3600 * 1_000_000)
    ends.append(base + 401 * 3600 * 1_000_000)
    intervals = pa.table({
        "interval_id": pa.array(ids, pa.int64()),
        "start": pa.array(np.array(starts, "datetime64[us]")),
        "end": pa.array(np.array(ends, "datetime64[us]")),
    })

    want = broadcast_range_join_count(ray.data.from_arrow(events),
                                      intervals)
    got_ds = copartition_range_join_count(
        ray.data.from_arrow(events), ray.data.from_arrow(intervals),
        bucket_s=3600, num_shards=8)
    got = {r["interval_id"]: r["n_events"] for r in got_ds.take_all()}
    ref = dict(zip(want["interval_id"].to_pylist(),
                   want["n_events"].to_pylist()))
    assert got == ref
    assert got[999] == 0
    assert sum(got.values()) > 0


def test_word_frequencies_matches_counter():
    """Distributed vocab builder == a driver-side Counter on the same
    texts (including empty/null text and shard-count invariance)."""
    import collections

    import ray.data

    from pyschema_ray.functions.text import word_frequencies

    texts = ["the cat sat", "THE the dog", None, "", "  cat  runs  ",
             "dog dog dog"]
    want = collections.Counter(
        w for s in texts if s for w in s.lower().split())
    t = pa.table({"text": pa.array(texts, pa.string())})
    for ns in (4, 16):
        out = word_frequencies(ray.data.from_arrow(t), num_shards=ns)
        got = {r["word"]: r["n"] for r in out.take_all()}
        assert got == dict(want), ns
    out2 = word_frequencies(ray.data.from_arrow(t), num_shards=4,
                            min_count=3)
    got2 = {r["word"]: r["n"] for r in out2.take_all()}
    assert got2 == {"the": 3, "dog": 4}


def test_duplicate_composite_keys_null_and_counts():
    import ray.data

    from pyschema_ray.stages.unique import duplicate_composite_keys

    t = pa.table({
        "a": pa.array([1, 1, 1, 2, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "x", "y", "x", "x", "x", None], pa.string()),
    })
    out = duplicate_composite_keys(ray.data.from_arrow(t), ["a", "b"],
                                   num_buckets=4)
    got = {(r["a"], r["b"]): r["dup_count"] for r in out.take_all()}
    # (1,x) twice, (2,x) twice; null components dropped
    assert got == {(1, "x"): 2, (2, "x"): 2}


def test_grouped_exact_quantiles_matches_numpy():
    """Exact grouped quantiles via the bounded-domain count-vector
    pattern == np.quantile (linear interpolation) per group, at any
    batch partitioning."""
    import ray.data

    from pyschema_ray.functions.analytics import grouped_exact_quantiles

    rng = np.random.default_rng(9)
    groups = rng.choice(["a", "b", "c"], size=4000)
    vals = rng.integers(0, 120, size=4000)
    # nulls must be ignored like SQL aggregates
    gcol = pa.array(list(groups[:-1]) + [None], pa.string())
    vcol = pa.array(list(vals[:-1]) + [None], pa.int64())
    ds = ray.data.from_arrow(pa.table({"g": gcol, "v": vcol})) \
        .repartition(7)
    out = grouped_exact_quantiles(ds, "g", "v", quantiles=(0.5, 0.9))
    got = {r["g"]: (r["q_0.5"], r["q_0.9"]) for r in out.take_all()}
    for g in "abc":
        sel = vals[:-1][groups[:-1] == g]
        assert got[g][0] == np.quantile(sel, 0.5), g
        assert abs(got[g][1] - np.quantile(sel, 0.9)) < 1e-9, g


def test_ngram_frequencies_matches_counter():
    import collections

    import ray.data

    from pyschema_ray.functions.text import ngram_frequencies

    texts = ["the cat sat on the mat", "the cat ran", "dog", None, ""]

    def grams(s, n=2):
        w = s.lower().split()
        if not w:
            return []
        if len(w) < n:
            return [" ".join(w)]
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    want = collections.Counter(g for s in texts if s for g in grams(s))
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    out = ngram_frequencies(ds, n=2, num_shards=4)
    got = {r["ngram"]: r["n"] for r in out.take_all()}
    assert got == dict(want)
    assert got["the cat"] == 2
    assert got["dog"] == 1  # shorter-than-n doc contributes whole text


def test_grouped_ndv_exact():
    """Exact per-group distinct counts: dedup combiner + key-shard
    exchange must equal pandas nunique under any partitioning, with a
    key whose duplicates span blocks."""
    import ray.data

    from pyschema_ray.functions.analytics import grouped_ndv

    rng = np.random.default_rng(13)
    groups = rng.choice(["a", "b", "c"], size=3000)
    keys = rng.integers(0, 200, size=3000)  # heavy cross-block dup
    t = pa.table({"g": pa.array(list(groups[:-1]) + [None], pa.string()),
                  "k": pa.array(list(keys[:-1]) + [None], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(9)
    out = grouped_ndv(ds, "g", "k", num_shards=8)
    got = {r["g"]: r["ndv"] for r in out.take_all()}
    import pandas as pd
    want = pd.DataFrame({"g": groups[:-1], "k": keys[:-1]}) \
        .groupby("g")["k"].nunique().to_dict()
    assert got == want


def test_top_words_exact_heavy_hitters():
    import collections

    import ray.data

    from pyschema_ray.functions.text import top_words

    rng = np.random.default_rng(17)
    vocab = [f"w{i:03d}" for i in range(80)]
    weights = np.arange(1, 81, dtype=np.float64)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=50, p=weights))
             for _ in range(100)]
    counter = collections.Counter(w for s in texts for w in s.split())
    want = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})).repartition(6)
    out = top_words(ds, k=10, num_shards=8)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    t = t.sort_by([("n", "descending"), ("word", "ascending")])
    got = list(zip(t["word"].to_pylist(), t["n"].to_pylist()))
    assert got == want


def test_grouped_ndv_hll_within_tolerance():
    """Per-group HLL estimates within 3 sigma (~0.8%/register error at
    p=14) of exact nunique."""
    import ray.data

    from pyschema_ray.functions.analytics import grouped_ndv_hll

    rng = np.random.default_rng(19)
    groups = rng.choice(["a", "b"], size=20000)
    keys = rng.integers(0, 5000, size=20000)
    t = pa.table({"g": pa.array(groups), "k": pa.array(keys, pa.int64())})
    est = grouped_ndv_hll(ray.data.from_arrow(t).repartition(5), "g", "k")
    import pandas as pd
    want = pd.DataFrame({"g": groups, "k": keys}) \
        .groupby("g")["k"].nunique().to_dict()
    for g, w in want.items():
        assert abs(est[g] - w) / w < 0.03, (g, est[g], w)


def test_tokenize_hash_batch_matches_python_split_loop():
    from pyschema_ray.functions.text import tokenize_hash_batch
    from pyschema_ray.sketches import hash_strings

    texts = ["a  b", "  lead", "trail  ", "", None, "one",
             "tab\tx\nnl", "é  ü", "   ", "x " * 500]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = tokenize_hash_batch(t)["tokens"].to_pylist()

    want = []
    for s in texts:
        words = (s or "").split()
        ids = (hash_strings(np.asarray(words, dtype=object))
               % np.uint64(50_000)).astype(np.int64).tolist() if words else []
        want.append(ids)
    assert got == want


def test_ngram_contamination_matches_reference():
    import collections

    import ray.data

    from pyschema_ray.functions.text import ngram_contamination

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(40)] + ["short one", "", None]
    ids = list(range(len(texts)))
    eval_texts = texts[:5]  # first five docs are the "benchmark"

    def grams(s, n=8):
        w = (s or "").lower().split()
        if not w:
            return []
        if len(w) < n:
            return [" ".join(w)]
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    eset = {g for s in eval_texts for g in grams(s)}
    want = {}
    for i, s in enumerate(texts):
        gs = grams(s)
        if gs:
            want[i] = (len(gs), sum(g in eset for g in gs))

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}))
    out = pa.concat_tables(
        [b for b in ngram_contamination(ds, eval_texts)
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    got = {d: (g, c) for d, g, c in zip(out["doc_id"].to_pylist(),
                                        out["n_grams"].to_pylist(),
                                        out["n_contaminated"].to_pylist())}
    assert got == want
    # the five benchmark docs are fully contaminated
    for i in range(5):
        assert got[i][0] == got[i][1]


def test_doc_frequencies_matches_counter():
    import collections

    import ray.data

    from pyschema_ray.functions.text import doc_frequencies

    texts = ["the cat the hat", "a cat", "", None, "THE the tHe", "dog  dog"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = pa.concat_tables(
        [b for b in doc_frequencies(ds).iter_batches(batch_format="pyarrow")
         if b.num_rows])
    got = dict(zip(out["word"].to_pylist(), out["df"].to_pylist()))
    want = collections.Counter()
    for s in texts:
        for w in set((s or "").lower().split()):
            want[w] += 1
    assert got == dict(want)
    assert got["the"] == 2 and got["cat"] == 2 and got["dog"] == 1


def test_novel_keys_vs_existing():
    import ray.data

    from pyschema_ray.functions.dedup import novel_keys_vs_existing

    existing = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha", "beta", None])})
    new = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array(["alpha", "gamma", "gamma", None, "beta"])})
    out = pa.concat_tables(
        [b for b in novel_keys_vs_existing(
            ray.data.from_arrow(new), ray.data.from_arrow(existing),
            num_shards=4).iter_batches(batch_format="pyarrow")
         if b.num_rows])
    # 'alpha'/'beta' exist; both 'gamma' copies are novel; null text drops
    assert sorted(out["doc_id"].to_pylist()) == [11, 12]


def test_top_terms_per_doc_ranking():
    import ray.data

    from pyschema_ray.functions.text import top_terms_per_doc

    texts = ["apple apple banana zebra", "banana banana banana apple",
             None, ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts)}))
    out = pa.concat_tables(
        [b for b in top_terms_per_doc(ds, k=2)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by([("doc_id", "ascending"), ("rank", "ascending")])
    rows = list(zip(out["doc_id"].to_pylist(), out["term"].to_pylist(),
                    out["tf"].to_pylist(), out["df"].to_pylist(),
                    out["rank"].to_pylist()))
    # doc 0: apple tf=2; then zebra beats banana on df (1 < 2)
    assert rows[0] == (0, "apple", 2, 2, 1)
    assert rows[1] == (0, "zebra", 1, 1, 2)
    # doc 1: banana tf=3, apple tf=1
    assert rows[2] == (1, "banana", 3, 2, 1)
    assert rows[3] == (1, "apple", 1, 2, 2)
    assert len(rows) == 4  # null/empty docs emit nothing
