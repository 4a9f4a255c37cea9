"""Product quantization: recall vs the exact scorer on clustered
data, reconstruction distortion sanity, encode schema, determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyschema_ray.functions.pq import (pq_decode, pq_encode, pq_topk,
                                       pq_train)
from pyschema_ray.functions.similarity import brute_force_topk, _normalize


def _clustered(n=600, d=32, n_clusters=12, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    x = cents[assign] + 0.08 * rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32)


def _ds(x):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float32()), x.shape[1]),
    })).repartition(4)


def test_pq_cluster_recall_vs_exact():
    """Within a tight cluster all ~50 members are near-ties, so
    element-wise top-10 overlap is not the meaningful bar for a
    quantizer; what PQ must preserve is the NEIGHBORHOOD: the ADC
    top-10 must come from the same cluster the exact scorer picks
    from (between-cluster gaps >> quantization distortion)."""
    x = _clustered()
    rng = np.random.default_rng(7)
    # recompute the generating cluster of each vector
    cents = rng.normal(size=(12, 32)).astype(np.float32)
    assign = rng.integers(0, 12, 600)
    ds = _ds(x)
    model = pq_train(ds, m=8, ksub=16, sample_size=600)
    q = x[:5]
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    approx = pq_topk(ds, q, model, k=10).to_pandas()
    for qi in range(5):
        e = assign[exact.loc[exact.query_id == qi, "vec_id"].to_numpy()]
        a = assign[approx.loc[approx.query_id == qi,
                              "vec_id"].to_numpy()]
        want = assign[qi]
        assert (e == want).all()
        assert (a == want).mean() >= 0.8, (qi, a, want)


def test_pq_reconstruction_beats_control():
    x = _normalize(_clustered())
    ds = _ds(x)
    model = pq_train(ds, m=8, ksub=16, sample_size=600)
    enc = pa.concat_tables(
        pq_encode(ds, model).iter_batches(batch_format="pyarrow")) \
        .sort_by("vec_id")
    codes = np.stack(enc["pq_code"].to_pylist()).astype(np.uint8)
    recon = pq_decode(codes, model)
    mse = float(((recon - x) ** 2).mean())
    # control: same codebook, randomly shuffled codes
    rng = np.random.default_rng(0)
    bad = pq_decode(rng.permutation(codes), model)
    mse_bad = float(((bad - x) ** 2).mean())
    assert mse < 0.25 * mse_bad
    assert mse < 0.01  # tight clusters quantize well


def test_pq_encode_schema_and_determinism():
    x = _clustered(n=100)
    ds = _ds(x)
    model = pq_train(ds, m=4, ksub=8, sample_size=100)
    t1 = pa.concat_tables(
        pq_encode(ds, model).iter_batches(batch_format="pyarrow")) \
        .sort_by("vec_id")
    t2 = pa.concat_tables(
        pq_encode(ds, model).iter_batches(batch_format="pyarrow")) \
        .sort_by("vec_id")
    f = t1.schema.field("pq_code")
    assert pa.types.is_fixed_size_list(f.type) and f.type.list_size == 4
    assert f.type.value_type == pa.uint8()
    assert t1.equals(t2)


def test_pq_train_rejects_bad_m():
    x = _clustered(n=50, d=30)
    import pytest
    with pytest.raises(ValueError):
        pq_train(_ds(x), m=8, sample_size=50)


def test_kmeans_fit_matches_local_reference():
    import pyarrow as pa
    import ray.data as rd

    from pyschema_ray.functions.similarity import (kmeans_assign,
                                                   kmeans_fit)

    x = _clustered(n=400, d=16, n_clusters=6)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float32()), x.shape[1]),
    }))
    got = kmeans_fit(ds.repartition(4), k=6, iters=5, seed=9,
                     init_sample=400)

    # independent local Lloyd with identical init
    rng = np.random.default_rng(9)
    cent = x[rng.choice(len(x), 6, replace=False)].astype(np.float32)
    for _ in range(5):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        nxt = cent.astype(np.float64).copy()
        for c in range(6):
            if (a == c).any():
                nxt[c] = x[a == c].astype(np.float64).mean(axis=0)
        cent = nxt.astype(np.float32)
    assert np.allclose(got, cent, atol=1e-4), \
        np.abs(got - cent).max()

    # assignment recovers the 6 generating clusters cleanly
    out = pa.concat_tables(
        kmeans_assign(ds, got).iter_batches(batch_format="pyarrow"))
    clusters = np.asarray(out["cluster"].to_numpy(
        zero_copy_only=False))
    rng2 = np.random.default_rng(7)
    rng2.normal(size=(6, 16))
    truth = rng2.integers(0, 6, 400)
    # same generating cluster -> mostly same learned cluster; random
    # init can merge two tight clusters (a local optimum), so the bar
    # is cluster-structure recovery, not perfection
    import pandas as pd
    purity = pd.crosstab(truth, clusters).max(axis=1).sum() / 400
    assert purity > 0.85, purity
