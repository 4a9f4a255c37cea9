"""Sketch correctness per SURVEY.md §5.2: rank-error tolerance vs exact
quantiles, HLL within 3 sigma of exact nunique, merge associativity
(merge of shard sketches == sketch of concatenation, tolerance), and
serialization round-trips."""

import numpy as np

from pyschema_ray.sketches import (GroupedHistogram, HyperLogLog, TDigest,
                                   hash_strings, kl_divergence, mix64, psi)


def test_tdigest_accuracy_vs_exact():
    rng = np.random.default_rng(0)
    data = rng.lognormal(5.0, 0.6, 200_000)
    td = TDigest()
    for chunk in np.array_split(data, 20):
        td.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        exact = np.quantile(data, q)
        est = td.quantile(q)
        # rank error: the estimated value's true rank must be within 1%
        rank = (data <= est).mean()
        assert abs(rank - q) < 0.01, (q, exact, est, rank)


def test_tdigest_merge_associative():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 60_000)
    whole = TDigest().add(data)
    shards = [TDigest().add(c) for c in np.array_split(data, 6)]
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.merge(s)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.05
    assert merged.count == whole.count == data.size
    assert merged.min == whole.min and merged.max == whole.max


def test_tdigest_serialization_and_edges():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add(np.array([7.0]))
    assert td.quantile(0.5) == 7.0
    b = td.to_bytes()
    td2 = TDigest.from_bytes(b)
    assert td2.quantile(0.5) == 7.0 and td2.count == 1


def test_hll_accuracy_and_merge():
    n = 100_000
    ids = np.array([f"doc-{i:012d}" for i in range(n)], dtype=object)
    h = HyperLogLog(14)
    h.add_strings(ids)
    est = h.estimate()
    # standard error for p=14 is ~0.81% -> 3 sigma ~ 2.5%
    assert abs(est - n) / n < 0.025, est

    shards = [HyperLogLog(14).add_strings(c) for c in np.array_split(ids, 7)]
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.merge(s)
    assert merged.estimate() == est  # register-max merge is exact

    # duplicates do not inflate
    h2 = HyperLogLog(14).add_strings(ids[:1000]).add_strings(ids[:1000])
    assert abs(h2.estimate() - 1000) / 1000 < 0.05


def test_hll_small_range_linear_counting():
    h = HyperLogLog(14)
    h.add_strings([f"x{i}" for i in range(50)])
    assert abs(h.estimate() - 50) < 5
    b = h.to_bytes()
    assert HyperLogLog.from_bytes(b).estimate() == h.estimate()


def test_hash_stability():
    a = hash_strings(["a", "b", "a"])
    assert a[0] == a[2] != a[1]
    # must be the documented stable pandas SipHash values (process-independent)
    b = hash_strings(np.array(["a", "b", "a"], dtype=object))
    assert (a == b).all()
    m0, m1 = mix64(a, 0), mix64(a, 1)
    assert (m0 != m1).any() and m0[0] == m0[2]


def test_grouped_histogram_and_drift():
    rng = np.random.default_rng(2)
    g = GroupedHistogram(0, 100, 10)
    keys = np.array(["a"] * 500 + ["b"] * 300, dtype=object)
    vals = np.concatenate([rng.uniform(0, 100, 500), rng.uniform(0, 100, 300)])
    g.add(keys, vals)
    assert int(g.groups["a"].sum()) == 500
    assert int(g.groups["b"].sum()) == 300
    # under/overflow bins
    g.add(np.array(["a"], dtype=object), np.array([-5.0]))
    g.add(np.array(["a"], dtype=object), np.array([150.0]))
    assert g.groups["a"][0] == 1 and g.groups["a"][-1] == 1

    # merge == single pass
    g1 = GroupedHistogram(0, 100, 10).add(keys[:400], vals[:400])
    g2 = GroupedHistogram(0, 100, 10).add(keys[400:], vals[400:])
    merged = g1.merge(g2)
    for k in ("a", "b"):
        np.testing.assert_array_equal(
            merged.groups[k],
            GroupedHistogram(0, 100, 10).add(keys, vals).groups[k])

    b = merged.to_bytes()
    assert GroupedHistogram.from_bytes(b).groups.keys() == merged.groups.keys()

    # drift measures: identical -> ~0; shifted -> large
    same = kl_divergence(g.groups["a"], g.groups["a"])
    assert same < 1e-9
    shifted = np.roll(g.groups["a"], 4)
    assert psi(g.groups["a"], shifted) > 0.25
    assert psi(g.groups["a"], g.groups["a"]) < 1e-9


def test_grouped_histogram_skips_nulls():
    g = GroupedHistogram(0, 10, 5)
    g.add(np.array(["a", None, "b"], dtype=object),
          np.array([1.0, 2.0, np.nan]))
    assert int(g.total().sum()) == 1


def test_tree_merge_hex_matches_flat():
    """Tree reduce of many per-shard digests == flat driver merge:
    byte-identical for HLL (register max) and histogram (vector add);
    within sketch accuracy for t-digest (compression is
    order-sensitive).  Uses a tiny threshold so the Ray-task tree path
    actually runs over the 1000 partials."""
    from pyschema_ray.stages.stats import tree_merge_hex

    rng = np.random.default_rng(42)
    hll_hexes, hist_hexes, td_hexes = [], [], []
    all_vals = []
    for i in range(1000):
        vals = rng.normal(100.0, 15.0, 200)
        all_vals.append(vals)
        h = HyperLogLog(10)
        h.add_strings([f"u{i}-{j}" for j in range(50)])
        hll_hexes.append(h.to_bytes().hex())
        g = GroupedHistogram(0.0, 200.0, 16)
        g.add(["s0" if i % 2 else "s1"] * len(vals), vals)
        hist_hexes.append(g.to_bytes().hex())
        td = TDigest().add(vals)
        td_hexes.append(td.to_bytes().hex())

    flat_hll = tree_merge_hex(hll_hexes, HyperLogLog, threshold=2000)
    tree_hll = tree_merge_hex(hll_hexes, HyperLogLog, threshold=16,
                              fanout=32)
    assert tree_hll.to_bytes() == flat_hll.to_bytes()

    flat_hist = tree_merge_hex(hist_hexes, GroupedHistogram, threshold=2000)
    tree_hist = tree_merge_hex(hist_hexes, GroupedHistogram, threshold=16,
                               fanout=32)
    assert set(tree_hist.groups) == set(flat_hist.groups)
    for k in tree_hist.groups:
        assert (tree_hist.groups[k] == flat_hist.groups[k]).all()

    tree_td = tree_merge_hex(td_hexes, TDigest, threshold=16, fanout=32)
    exact = np.concatenate(all_vals)
    for q in (0.1, 0.5, 0.9):
        assert abs(tree_td.quantile(q) - np.quantile(exact, q)) \
            < 0.02 * np.quantile(exact, q)

    assert tree_merge_hex([], HyperLogLog) is None


def test_count_min_guarantees():
    import numpy as np

    from pyschema_ray.sketches import CountMinSketch

    rng = np.random.default_rng(5)
    # zipf-ish corpus of 20k tokens over 500 distinct words
    words = np.array([f"w{int(i)}" for i in
                      rng.zipf(1.5, 20_000) % 500], dtype=object)
    from collections import Counter
    truth = Counter(words.tolist())
    cms = CountMinSketch(depth=4, width=2048)
    # split into chunks and merge, to exercise mergeability
    parts = np.array_split(words, 7)
    sk = [CountMinSketch(depth=4, width=2048).update(p) for p in parts]
    for s in sk[1:]:
        sk[0].merge(s)
    cms = sk[0]
    keys = np.array(list(truth), dtype=object)
    est = cms.query(keys)
    true = np.array([truth[k] for k in keys])
    assert (est >= true).all()            # never undercounts
    n = len(words)
    eps = np.e / 2048
    assert (est - true <= 3 * eps * n).all()
    assert np.median(est - true) <= eps * n


def test_count_min_roundtrip_rows():
    import numpy as np
    import pyarrow as pa

    from pyschema_ray.sketches import CountMinSketch

    a = CountMinSketch(2, 64).update(np.array(["x", "y", "x"], object))
    b = CountMinSketch(2, 64).update(np.array(["y"], object))
    t = pa.concat_tables([a.to_row(), b.to_row()])
    m = CountMinSketch.from_rows(t)
    assert m.query(np.array(["x"], object))[0] >= 2
    assert m.query(np.array(["y"], object))[0] >= 2


def test_cms_word_counts_vs_exact():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.text import cms_word_counts

    docs = ["the cat sat", "the dog ran", "the cat ran fast"] * 50
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(4)
    cms = cms_word_counts(ds, width=1024)
    est = cms.query(np.array(["the", "cat", "zzz"], object))
    assert est[0] >= 150 and est[1] >= 100
    n_tokens = sum(len(d.split()) for d in docs)
    assert est[2] <= np.e / 1024 * n_tokens * 3
