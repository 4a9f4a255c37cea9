"""Bloom filter: no false negatives ever, fp rate within tolerance,
distributed build == local reference, probe/admission semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyschema_ray.functions.bloom import (BloomFilter, bloom_build,
                                          bloom_params, bloom_probe,
                                          novel_keys_vs_bloom,
                                          _bit_indices)


def _texts(prefix, n):
    return [f"{prefix}-{i:06d} content body" for i in range(n)]


def _local_build(texts, capacity, fp_rate):
    m, k = bloom_params(capacity, fp_rate)
    # per-bit loop: fancy-index |= would drop duplicate writes to the
    # same word within one statement
    dense = np.zeros(m // 64, np.uint64)
    idx = _bit_indices(np.asarray(texts, object), m, k)
    for j in idx:
        dense[int(j) >> 6] |= np.uint64(1) << np.uint64(int(j) & 63)
    return BloomFilter(dense, m, k)


def test_params_sane():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0 and m > 10_000
    assert 1 <= k <= 20
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_fp_bound():
    seen = _texts("seen", 5000)
    bf = _local_build(seen, 5000, 0.01)
    assert bf.contains(seen).all()          # zero false negatives
    other = _texts("other", 5000)
    fp = bf.contains(other).mean()
    assert fp <= 0.03                       # 3x target tolerance
    assert 0.3 < bf.fill_fraction() < 0.7   # near-optimal load


def test_distributed_build_matches_local():
    seen = _texts("x", 3000)
    ds = rd.from_arrow(pa.table({"text": pa.array(seen)})).repartition(5)
    bf_d = bloom_build(ds, capacity=3000, fp_rate=0.01)
    bf_l = _local_build(seen, 3000, 0.01)
    assert bf_d.m_bits == bf_l.m_bits and bf_d.k == bf_l.k
    assert np.array_equal(bf_d.words, bf_l.words)


def test_probe_and_admission():
    seen = _texts("a", 2000)
    ds_seen = rd.from_arrow(pa.table({"text": pa.array(seen)}))
    bf = bloom_build(ds_seen, capacity=2000, fp_rate=0.01)

    new_texts = seen[:100] + _texts("b", 400) + [None]
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(501)]),
        "text": pa.array(new_texts),
    })).repartition(3)

    probed = pa.concat_tables(
        bloom_probe(new, bf).iter_batches(batch_format="pyarrow")) \
        .sort_by("doc_id")
    df = probed.to_pandas().set_index("doc_id")
    # all re-sent seen docs flagged (no false negatives)
    assert df.loc[[f"d{i}" for i in range(100)], "maybe_seen"].all()
    # null text probes False
    assert not df.loc["d500", "maybe_seen"]

    novel = pa.concat_tables(
        [t for t in novel_keys_vs_bloom(new, bf)
         .iter_batches(batch_format="pyarrow") if t.num_rows])
    got = set(novel["doc_id"].to_pylist())
    truly_new = {f"d{i}" for i in range(100, 500)}
    assert got <= truly_new                   # nothing seen admitted
    assert len(got) >= len(truly_new) * 0.95  # few fp drops
    assert "d500" not in got                  # null text excluded


def test_bloom_novel_subset_of_exact_on_testdata():
    """Driver-query cross-check at sf0.001: the bloom admission gate
    returns a subset of the exact incremental-dedup result, missing
    at most ~fp_rate of it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry_bloom_test", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    exact = set(qs["novel_documents"]("/root/testdata/sf0.001")
                ["doc_id"].to_pylist())
    bloom = set(qs["novel_documents_bloom"]("/root/testdata/sf0.001")
                ["doc_id"].to_pylist())
    assert bloom <= exact
    assert len(bloom) >= int(len(exact) * 0.95)
