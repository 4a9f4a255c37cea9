"""Distributed dedup machinery: connected components by min-label
propagation, shuffle-based Jaccard verification, and the composed
keep-list — all checked against driver-side reference implementations
(the round-1 union-find semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray.functions import dedup

SF_DIR = "/root/testdata/sf0.01"


def _reference_components(pairs):
    """Union-find with min-root (the round-1 driver-side semantics)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    nodes = {x for p in pairs for x in p}
    return {n: find(n) for n in nodes}


def _cc_labels(pairs_table, **kw):
    """Run BOTH the adaptive small-graph fast path (default) and the
    distributed propagation path (small_edges_threshold=0) and assert
    they agree — every CC test covers both."""
    import ray.data
    fast = {r["node"]: r["label"] for r in dedup.connected_components(
        ray.data.from_arrow(pairs_table), **kw).take_all()}
    dist = {r["node"]: r["label"] for r in dedup.connected_components(
        ray.data.from_arrow(pairs_table), small_edges_threshold=0,
        **kw).take_all()}
    assert fast == dist
    return fast


def test_connected_components_cliques_and_chain():
    # two cliques, one 6-node chain (worst case for propagation), one
    # isolated pair — int keys
    edges = [(10, 11), (11, 12), (10, 12),          # clique
             (20, 21),                              # pair
             (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]  # chain
    t = pa.table({"key_a": pa.array([a for a, _ in edges], pa.int64()),
                  "key_b": pa.array([b for _, b in edges], pa.int64())})
    got = _cc_labels(t, num_shards=8)
    assert got == _reference_components(edges)
    # chain collapses to min label 1 across all 6 nodes
    assert all(got[n] == 1 for n in range(1, 7))


def test_connected_components_string_keys_random_graph():
    rng = np.random.default_rng(7)
    nodes = [f"doc-{i:04d}" for i in range(200)]
    edges = []
    for _ in range(150):
        a, b = rng.choice(200, size=2, replace=False)
        edges.append((nodes[a], nodes[b]))
    t = pa.table({"key_a": pa.array([a for a, _ in edges]),
                  "key_b": pa.array([b for _, b in edges])})
    got = _cc_labels(t, num_shards=16)
    assert got == _reference_components(edges)


def test_connected_components_long_chain_log_rounds():
    """Pointer jumping collapses a 300-deep chain within ~log2(300)
    rounds — plain neighbor propagation would need ~300."""
    edges = [(i, i + 1) for i in range(300)]
    t = pa.table({"key_a": pa.array([a for a, _ in edges], pa.int64()),
                  "key_b": pa.array([b for _, b in edges], pa.int64())})
    got = _cc_labels(t, num_shards=8, max_rounds=15)
    assert got == {n: 0 for n in range(301)}


def test_connected_components_raises_on_round_cap():
    edges = [(i, i + 1) for i in range(20)]  # depth-20 chain
    t = pa.table({"key_a": pa.array([a for a, _ in edges], pa.int64()),
                  "key_b": pa.array([b for _, b in edges], pa.int64())})
    import ray.data
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(ray.data.from_arrow(t), num_shards=4,
                                   max_rounds=3, small_edges_threshold=0)


def test_jaccard_verify_ds_matches_table_variant():
    """The distributed shuffle verification must produce exactly the
    pairs + jaccard values of the driver-side reference."""
    import ray.data
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(30):
        words = list(rng.choice(vocab, size=25, replace=False))
        texts.append(" ".join(words))
        ids.append(i)
    # overlapping docs
    texts.append(texts[3]); ids.append(103)                  # identical
    mod = texts[7].split(); mod[5] = "x"; mod[11] = "y"
    texts.append(" ".join(mod)); ids.append(107)             # near
    texts.append(""); ids.append(199)                        # empty text
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})
    cand = [(3, 103), (7, 107), (0, 1), (5, 199), (42, 3)]  # 42 missing
    pairs = pa.table({"key_a": pa.array([a for a, _ in cand], pa.int64()),
                      "key_b": pa.array([b for _, b in cand], pa.int64())})

    ref = dedup.jaccard_verify_pairs(pairs, docs, threshold=0.5)
    got_ds = dedup.jaccard_verify_pairs_ds(
        ray.data.from_arrow(pairs), ray.data.from_arrow(docs),
        threshold=0.5, num_shards=8)
    got = {(r["key_a"], r["key_b"]): r["jaccard"]
           for r in got_ds.take_all()}
    # the shuffle semi-join path must agree with the broadcast fast path
    dist_ds = dedup.jaccard_verify_pairs_ds(
        ray.data.from_arrow(pairs), ray.data.from_arrow(docs),
        threshold=0.5, num_shards=8, small_pairs_threshold=0)
    assert {(r["key_a"], r["key_b"]): r["jaccard"]
            for r in dist_ds.take_all()} == got
    want = {(a, b): j for a, b, j in zip(ref["key_a"].to_pylist(),
                                         ref["key_b"].to_pylist(),
                                         ref["jaccard"].to_pylist())}
    assert got == want
    assert (3, 103) in got and got[(3, 103)] == 1.0


def test_dedup_keep_keys_matches_reference_on_documents():
    """Composed distributed dedup over the sf0.01 documents table ==
    the round-1 driver-side algorithm (exact keep-min, LSH candidates,
    Jaccard verify, union-find drop)."""
    import ray.data
    import pyarrow.parquet as pq
    from pyschema_ray.sketches import hash_strings

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ray.data.from_arrow(docs)

    keep = dedup.dedup_keep_keys(ds, jaccard_threshold=0.8, concurrency=2)
    got = keep["doc_id"].to_pylist()

    # reference: exact keep-min per content hash
    h = hash_strings(docs["text"].to_numpy(zero_copy_only=False))
    kept_exact: dict = {}
    for key, hh in zip(docs["doc_id"].to_pylist(), h.tolist()):
        if hh not in kept_exact or key < kept_exact[hh]:
            kept_exact[hh] = key
    kept_set = set(kept_exact.values())
    # reference near-dup: same candidates (deterministic pipeline) +
    # driver verify + union-find
    cand = dedup.minhash_lsh_candidates(ds, concurrency=2)
    cand_tbl = pa.table({
        "key_a": pa.array([r["key_a"] for r in cand.take_all()], pa.int64()),
        "key_b": pa.array([r["key_b"] for r in cand.take_all()], pa.int64()),
    })
    verified = dedup.jaccard_verify_pairs(cand_tbl, docs, threshold=0.8)
    labels = _reference_components(list(zip(verified["key_a"].to_pylist(),
                                            verified["key_b"].to_pylist())))
    drop = {k for k in kept_set if labels.get(k, k) != k}
    assert sorted(got) == sorted(kept_set - drop)


def test_dedup_keep_keys_high_duplication_bounded():
    """30%+ duplication at 20k docs: the keep-list must be exact and the
    whole path distributed (no driver union-find) — this corpus has
    ~6k duplicate pairs."""
    import ray.data
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(2000)]
    n_base = 14_000
    texts = [" ".join(rng.choice(vocab, size=20, replace=False))
             for _ in range(n_base)]
    ids = list(range(n_base))
    # 30% exact duplicates of random base docs
    n_dup = 6_000
    dup_of = rng.integers(0, n_base, size=n_dup)
    for j, src in enumerate(dup_of):
        texts.append(texts[src])
        ids.append(n_base + j)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(8)

    keep = dedup.dedup_keep_keys_ds(ds, jaccard_threshold=0.9,
                                    concurrency=2)
    got = sorted(r["doc_id"] for r in keep.take_all())
    # every base doc survives (duplicates all have larger keys); no
    # injected duplicate survives
    assert got == list(range(n_base))


def test_connected_components_empty_preserves_key_dtype():
    """Regression: the empty-input fast path used to hardcode string
    node/label columns regardless of the key dtype."""
    import ray.data

    empty = pa.table({"key_a": pa.array([], pa.int64()),
                      "key_b": pa.array([], pa.int64())})
    out = dedup.connected_components(ray.data.from_arrow(empty))
    schema = pa.schema(out.schema().base_schema)
    assert schema.field("node").type == pa.int64()
    assert schema.field("label").type == pa.int64()
    assert out.count() == 0


def test_connected_components_randomized_multi_seed():
    """Five random graph shapes (sparse, dense, star-heavy, disjoint
    cliques, mixed-size) — distributed CC must equal union-find on all
    of them."""
    for seed, n_nodes, n_edges in [(1, 60, 30), (2, 40, 120),
                                   (3, 80, 79), (4, 50, 50),
                                   (5, 120, 100)]:
        rng = np.random.default_rng(seed)
        edges = []
        if seed == 3:  # star-heavy: hubs 0..3 connect to everyone
            for i in range(1, 80):
                edges.append((int(rng.integers(0, 4)), i))
        else:
            for _ in range(n_edges):
                a, b = rng.choice(n_nodes, size=2, replace=False)
                edges.append((int(a), int(b)))
        t = pa.table({"key_a": pa.array([a for a, _ in edges], pa.int64()),
                      "key_b": pa.array([b for _, b in edges], pa.int64())})
        got = _cc_labels(t, num_shards=8)
        assert got == _reference_components(edges), f"seed {seed}"


def test_pair_sets_invariant_across_shard_counts():
    """The exchange shard count is physical layout only: LSH / SimHash
    dup-pair sets and the composed keep-list must be IDENTICAL at any
    ``num_shards`` (regression for the round-2 hardcoded 64-shard
    exchanges)."""
    import ray.data

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(400)]
    ids, texts = [], []
    for i in range(60):
        words = list(rng.choice(vocab, size=30, replace=False))
        ids.append(i)
        texts.append(" ".join(words))
        if i % 6 == 0:  # exact duplicate under a fresh id
            ids.append(1000 + i)
            texts.append(texts[-1])
    docs_t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                       "text": pa.array(texts, pa.string())})

    def run(ns):
        docs = ray.data.from_arrow(docs_t)
        mh = dedup.filter_exact_text_pairs(
            dedup.minhash_lsh_candidates(docs, num_shards=ns),
            docs, num_shards=ns)
        mh_pairs = {(r["key_a"], r["key_b"]) for r in mh.take_all()}
        sh = dedup.simhash_near_dups(docs, max_hamming=0, num_shards=ns)
        sh_pairs = {(r["key_a"], r["key_b"]) for r in sh.take_all()}
        keep = dedup.dedup_keep_keys_ds(docs, num_shards=ns)
        kept = {r["doc_id"] for r in keep.take_all()}
        return mh_pairs, sh_pairs, kept

    a = run(8)
    b = run(32)
    assert a == b
    mh_pairs, sh_pairs, kept = a
    assert len(mh_pairs) == 10          # one pair per injected dup
    assert mh_pairs <= sh_pairs         # simhash hamming-0 finds them too
    assert kept == set(range(60))       # injected ids (1000+) dropped


def test_exact_dedup_survives_64bit_hash_collision():
    """Two DISTINCT texts with a forced-equal first 64-bit hash must
    stay distinct (the 128-bit content identity): a 64-bit-only
    identity silently merges ~27k non-duplicates at 10^12 docs."""
    import ray.data
    from pyschema_ray.sketches import hash_strings2

    def collide(values):
        arr = np.asarray(values, dtype=object)
        return np.full(len(arr), 0xDEADBEEF, dtype=np.uint64)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha bravo", "charlie delta", "alpha bravo"],
    })
    kept = dedup.exact_dedup_keys(
        ray.data.from_arrow(docs), num_shards=4,
        _hash_fns=(collide, hash_strings2))
    got = sorted(r["doc_id"] for r in kept.take_all())
    # doc 3 is a true dup of doc 1 (dropped); doc 2 only collides on
    # the first hash and must survive
    assert got == [1, 2]


def test_exact_pair_filter_survives_64bit_hash_collision():
    import ray.data
    from pyschema_ray.sketches import hash_strings2

    def collide(values):
        arr = np.asarray(values, dtype=object)
        return np.full(len(arr), 0xDEADBEEF, dtype=np.uint64)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha bravo", "charlie delta", "alpha bravo"],
    })
    cand = pa.table({"key_a": pa.array([1, 1], pa.int64()),
                     "key_b": pa.array([2, 3], pa.int64())})
    for thresh in (100_000, 0):   # broadcast fast path AND semi-join
        out = dedup.filter_exact_text_pairs(
            ray.data.from_arrow(cand), ray.data.from_arrow(docs),
            num_shards=4, _hash_fns=(collide, hash_strings2),
            small_pairs_threshold=thresh)
        got = sorted((r["key_a"], r["key_b"]) for r in out.take_all())
        # (1,2) collides on the 64-bit hash but texts differ -> excluded
        assert got == [(1, 3)]


def test_winnow_candidates_finds_containment():
    """The winnowing generator must surface a COPIED PARAGRAPH inside
    an otherwise different document (containment — the case whole-doc
    MinHash misses at low Jaccard), and stay shard-count invariant."""
    import ray.data

    rng = np.random.default_rng(31)
    vocab = [f"tok{i}" for i in range(500)]

    def words(n):
        return " ".join(rng.choice(vocab, size=n, replace=True))

    para = words(40)  # >= window + k - 1 words shared
    texts = {
        1: words(200),
        2: words(200) + " " + para + " " + words(200),  # contains para
        3: para,                                        # is para
        4: words(150),
    }
    docs = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                     "text": pa.array(list(texts.values()), pa.string())})

    # k is in BYTES: at the default k=8 random docs over a small vocab
    # share plenty of 8-char substrings (candidates are meant to be
    # verified downstream); k=32 makes spurious matches improbable so
    # the test can assert precision too
    got = {}
    for ns in (8, 32):
        out = dedup.winnow_candidates(ray.data.from_arrow(docs),
                                      k=32, window=16, num_shards=ns)
        got[ns] = {(r["key_a"], r["key_b"]) for r in out.take_all()}
    assert got[8] == got[32]
    assert (2, 3) in got[8]          # containment found
    assert (1, 4) not in got[8]      # unrelated docs not paired


def test_verify_paths_handle_zero_candidate_pairs():
    """Regression: the broadcast fast path crashed on an empty pair
    dataset (pa.concat_tables of zero key batches)."""
    import ray.data

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": ["alpha", "beta"]})
    empty = pa.table({"key_a": pa.array([], pa.int64()),
                      "key_b": pa.array([], pa.int64())})
    for fn, extra in ((dedup.jaccard_verify_pairs_ds, {}),
                      (dedup.filter_exact_text_pairs, {})):
        out = fn(ray.data.from_arrow(empty), ray.data.from_arrow(docs),
                 **extra)
        assert out.count() == 0
