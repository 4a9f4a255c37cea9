"""Sequence packing and deterministic sampling operators."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.pack import pack_sequences
from pyschema_ray.functions.sample import (hash_sample, mod_sample,
                                           stratified_sample)


def _token_corpus(n_docs=200, seed=3):
    rng = np.random.default_rng(seed)
    lens = rng.integers(5, 400, size=n_docs)
    toks = [rng.integers(0, 50_000, size=m).astype(np.int64).tolist()
            for m in lens]
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "tokens": pa.array(toks, pa.list_(pa.int64())),
    })


def test_pack_sequences_invariants():
    import ray.data

    t = _token_corpus()
    total = sum(len(x) for x in t["tokens"].to_pylist())
    ds = ray.data.from_arrow(t).repartition(4)
    packed = pack_sequences(ds, max_len=512, num_shards=8).take_all()

    # every token is packed exactly once
    assert sum(r["n_tokens"] for r in packed) == total
    # every window <= max_len; all but the final window per shard full
    by_shard: dict = {}
    for r in packed:
        assert len(r["tokens"]) == r["n_tokens"] <= 512
        shard, idx = r["pack_id"].split("-")
        by_shard.setdefault(int(shard), []).append((int(idx), r))
    for shard, rows in by_shard.items():
        rows.sort()
        assert [i for i, _ in rows] == list(range(len(rows)))
        for i, r in rows[:-1]:
            assert r["n_tokens"] == 512
    # doc lineage covers every doc exactly (windows partition the
    # concatenated stream, docs overlap adjacent windows)
    seen = set()
    for r in packed:
        assert r["n_docs"] == len(r["doc_ids"])
        seen.update(r["doc_ids"])
    assert seen == set(range(200))
    # token content round-trips per shard
    shard_stream: dict = {}
    for shard, rows in by_shard.items():
        shard_stream[shard] = np.concatenate(
            [np.asarray(r["tokens"]) for _, r in sorted(rows)])
    # rebuild expected stream: docs sorted by key within their shard
    from pyschema_ray.functions.dedup import _key_shards
    shards = _key_shards(t["doc_id"].to_numpy(), 8, 31)
    for shard in shard_stream:
        ids = np.sort(t["doc_id"].to_numpy()[shards == shard])
        toks = t["tokens"].to_pylist()
        want = np.concatenate([np.asarray(toks[i], dtype=np.int64)
                               for i in ids])
        assert (shard_stream[shard] == want).all()


def test_pack_sequences_padding():
    import ray.data

    t = _token_corpus(n_docs=10, seed=5)
    ds = ray.data.from_arrow(t)
    packed = pack_sequences(ds, max_len=256, num_shards=2,
                            pad_id=-1).take_all()
    for r in packed:
        assert len(r["tokens"]) == 256
        real = r["n_tokens"]
        win = np.asarray(r["tokens"])
        assert (win[real:] == -1).all()
        assert (win[:real] != -1).all() or real == 0


def test_hash_sample_deterministic_and_uniform():
    import ray.data

    n = 20_000
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(t)
    s1 = sorted(r["doc_id"] for r in
                hash_sample(ds, fraction=0.2, seed=7).take_all())
    s2 = sorted(r["doc_id"] for r in
                hash_sample(ds.repartition(8), fraction=0.2,
                            seed=7).take_all())
    assert s1 == s2  # partitioning-independent
    assert abs(len(s1) / n - 0.2) < 0.01  # ~binomial(n, .2) 3-sigma
    # nested fractions are nested samples (same seed)
    s_small = set(r["doc_id"] for r in
                  hash_sample(ds, fraction=0.05, seed=7).take_all())
    assert s_small <= set(s1)
    # different seeds ~independent
    s3 = set(r["doc_id"] for r in
             hash_sample(ds, fraction=0.2, seed=8).take_all())
    overlap = len(s3 & set(s1)) / n
    assert abs(overlap - 0.04) < 0.01


def test_stratified_sample_fractions():
    import ray.data

    n = 30_000
    rng = np.random.default_rng(0)
    src = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "source": pa.array(src)})
    ds = ray.data.from_arrow(t)
    out = stratified_sample(ds, "source", {"a": 0.1, "b": 0.5},
                            default_fraction=1.0).take_all()
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    base = {s: int((src == s).sum()) for s in "abc"}
    assert abs(got["a"] / base["a"] - 0.1) < 0.02
    assert abs(got["b"] / base["b"] - 0.5) < 0.02
    assert got["c"] == base["c"]  # default 1.0 keeps everything


def test_mod_sample_matches_filter():
    import ray.data

    t = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64))})
    out = sorted(r["doc_id"] for r in
                 mod_sample(ray.data.from_arrow(t), modulus=7,
                            keep_residues=(0, 3)).take_all())
    assert out == [i for i in range(1000) if i % 7 in (0, 3)]


def test_pack_sequences_adversarial_shapes():
    """Zero-length docs, null token lists, a doc much longer than
    max_len, and max_len=1 — token conservation and window bounds must
    hold through all of them."""
    import ray.data

    toks = [
        [],                                  # empty doc
        None,                                # null list
        list(range(1000)),                   # >> max_len: chunked
        [7],                                 # single token
        list(range(50)),
    ]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "tokens": pa.array(toks, pa.list_(pa.int64()))})
    total = sum(len(x) for x in toks if x)
    for max_len in (1, 64, 4096):
        packed = pack_sequences(ray.data.from_arrow(t), max_len=max_len,
                                num_shards=3).take_all()
        assert sum(r["n_tokens"] for r in packed) == total
        assert all(1 <= r["n_tokens"] <= max_len for r in packed)
        # the 1000-token doc's content survives chunking byte-exactly
        big = np.concatenate([np.asarray(r["tokens"]) for r in sorted(
            packed, key=lambda r: (int(r["pack_id"].split("-")[0]),
                                   int(r["pack_id"].split("-")[1])))])
        assert len(big) == total


def test_pack_stitched_conserves_tokens_and_bounds_waste():
    import ray.data

    from pyschema_ray.functions.pack import (pack_sequences,
                                             pack_sequences_stitched)

    rng = np.random.default_rng(5)
    n_docs = 400
    toks = [rng.integers(0, 1000, rng.integers(1, 90)).tolist()
            for _ in range(n_docs)]
    total = sum(len(t) for t in toks)
    tbl = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                    "tokens": pa.array(toks, pa.list_(pa.int64()))})
    max_len = 128

    out = pa.concat_tables([
        b for b in pack_sequences_stitched(
            ray.data.from_arrow(tbl), max_len=max_len, num_shards=32,
            stitch_shards=4).iter_batches(batch_format="pyarrow")
        if b.num_rows])
    # token conservation: nothing lost or duplicated by the stitch
    assert sum(out["n_tokens"].to_pylist()) == total
    # waste bound: at most one short window per stitch shard (vs one
    # per shard for the plain packer at the same num_shards)
    short = [x for x in out["n_tokens"].to_pylist() if x < max_len]
    assert len(short) <= 4
    plain = pa.concat_tables([
        b for b in pack_sequences(
            ray.data.from_arrow(tbl), max_len=max_len, num_shards=32)
        .iter_batches(batch_format="pyarrow") if b.num_rows])
    plain_short = [x for x in plain["n_tokens"].to_pylist() if x < max_len]
    assert len(short) < len(plain_short)
    # full windows are exactly max_len and pack ids are unique
    ids = out["pack_id"].to_pylist()
    assert len(ids) == len(set(ids))
    # doc lineage sanity: every window lists >= 1 doc; stitched windows
    # reference real doc ids
    assert min(out["n_docs"].to_pylist()) >= 1
    all_ids = set(range(n_docs))
    for lst in out["doc_ids"].to_pylist():
        assert set(lst) <= all_ids and len(lst) >= 1


def test_pack_stitched_lineage_tokens_match_docs():
    """Reassembling each window's tokens from its lineage must
    reproduce the window (windows cut mid-doc included) for the
    stitched packer, like the plain one."""
    import ray.data

    from pyschema_ray.functions.pack import pack_sequences_stitched

    rng = np.random.default_rng(9)
    toks = {i: rng.integers(0, 1000, rng.integers(1, 60)).tolist()
            for i in range(120)}
    tbl = pa.table({
        "doc_id": pa.array(sorted(toks), pa.int64()),
        "tokens": pa.array([toks[i] for i in sorted(toks)],
                           pa.list_(pa.int64()))})
    out = pa.concat_tables([
        b for b in pack_sequences_stitched(
            ray.data.from_arrow(tbl), max_len=64, num_shards=16,
            stitch_shards=2).iter_batches(batch_format="pyarrow")
        if b.num_rows])
    # full (s*) windows are contiguous slices of their lineage docs'
    # concatenation; stitched (r*) windows concatenate doc TAILS from
    # several shards, so the exact-slice property holds per remainder —
    # assert the always-true invariant instead: the window's token
    # multiset is contained in its lineage docs' token multiset
    import collections
    for pid, window, lst in zip(out["pack_id"].to_pylist(),
                                out["tokens"].to_pylist(),
                                out["doc_ids"].to_pylist()):
        concat = [x for d in lst for x in toks[d]]
        if pid.startswith("s"):
            joined = ",".join(map(str, concat))
            assert ",".join(map(str, window)) in joined, pid
        else:
            have = collections.Counter(concat)
            need = collections.Counter(window)
            assert all(have[k] >= v for k, v in need.items()), pid


def test_grouped_sample_k_map_budgets():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.sample import (grouped_sample_k_map,
                                               temperature_sample)

    n = 300
    groups = ["a"] * 200 + ["b"] * 90 + ["c"] * 10
    t = pa.table({"source": pa.array(groups),
                  "doc_id": pa.array(np.arange(n), pa.int64())})
    ds = rd.from_arrow(t).repartition(4)

    out = pa.concat_tables(
        [b for b in grouped_sample_k_map(
            ds, "source", {"a": 5, "b": 1000}, key_col="doc_id")
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    df = out.to_pandas()
    per = df.groupby("source").size().to_dict()
    assert per == {"a": 5, "b": 90}  # budget cut / keep-all / dropped

    # partition invariance
    out2 = pa.concat_tables(
        [b for b in grouped_sample_k_map(
            rd.from_arrow(t).repartition(9), "source",
            {"a": 5, "b": 1000}, key_col="doc_id")
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    assert sorted(out["doc_id"].to_pylist()) == \
        sorted(out2["doc_id"].to_pylist())

    # temperature budgets: min(n, 4*isqrt(n))
    ts = pa.concat_tables(
        [b for b in temperature_sample(ds, "source", "doc_id", scale=4)
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    per_t = ts.to_pandas().groupby("source").size().to_dict()
    assert per_t == {"a": 4 * 14, "b": 4 * 9, "c": 10}


def test_epoch_shuffle_positions():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.sample import epoch_shuffle_positions

    t = pa.table({"doc_id": pa.array(
        list(range(200)) + [None], pa.int64())})

    def run(seed, parts):
        out = pa.concat_tables(
            [b for b in epoch_shuffle_positions(
                rd.from_arrow(t).repartition(parts), seed=seed)
             .iter_batches(batch_format="pyarrow") if b.num_rows])
        return out.to_pandas().sort_values("doc_id")

    a = run(3, 4)
    # exact permutation of 0..199, null dropped
    assert sorted(a["position"]) == list(range(200))
    # partition-invariant
    b = run(3, 9)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # a different seed is a different permutation
    c = run(4, 4)
    assert not a["position"].reset_index(drop=True).equals(
        c["position"].reset_index(drop=True))


def test_water_fill_reference_properties():
    from pyschema_ray.functions.sample import water_fill

    avail = {"a": 100, "b": 10, "c": 50, "d": 1000}
    for budget in (0, 5, 40, 160, 400, 2000):
        alloc = water_fill(avail, budget)
        assert set(alloc) == set(avail)
        assert all(0 <= alloc[g] <= avail[g] for g in avail)
        assert sum(alloc.values()) == min(budget,
                                          sum(avail.values()))
        # equal-treatment: two uncapped groups differ by at most 1
        unc = [alloc[g] for g in avail if alloc[g] < avail[g]]
        if len(unc) >= 2:
            assert max(unc) - min(unc) <= 1
    # capped small group takes all it has
    alloc = water_fill(avail, 400)
    assert alloc["b"] == 10
    assert alloc["c"] == 50


def test_token_budget_allocation_counts(ray_session):
    import ray.data

    from pyschema_ray.functions.sample import token_budget_allocation

    t = pa.table({
        "source": pa.array(["x", "x", "y", None], pa.string()),
        "text": pa.array(["a b c", "d e", "f", "ignored"],
                         pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    out = token_budget_allocation(ds, 4)
    assert out.to_pydict() == {
        "source": ["x", "y"],
        "tokens_available": [5, 1],
        "tokens_allocated": [3, 1]}
