"""Bloom semi-join pushdown (functions/bloom.py::bloom_semi_join):
the pruned inner join must be VALUE-IDENTICAL to the unpruned one
(false positives are removed by the exact join; false negatives are
impossible), and the Bloom probe must actually prune the fact side."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _collect(ds) -> pa.Table:
    tbls = [t for t in ds.iter_batches(batch_format="pyarrow")
            if t.num_rows]
    return pa.concat_tables(tbls) if tbls \
        else pa.table({"k": pa.array([], pa.int64())})


def test_semijoin_matches_plain_join_and_prunes(ray_session):
    import ray.data

    from pyschema_ray.functions.bloom import bloom_build, bloom_semi_join
    from pyschema_ray.functions.joins import shuffle_join

    rng = np.random.RandomState(7)
    fact_keys = rng.randint(0, 10_000, size=50_000)
    fact = ray.data.from_arrow(pa.table({
        "k": pa.array(fact_keys, pa.int64()),
        "v": pa.array(rng.randint(0, 100, size=50_000), pa.int64()),
    }))
    # selective dim: 2% of the key space
    dim_keys = np.unique(rng.choice(10_000, size=200, replace=False))
    dim = ray.data.from_arrow(pa.table({
        "dk": pa.array(dim_keys, pa.int64()),
        "w": pa.array(dim_keys * 10, pa.int64()),
    }))

    got = _collect(bloom_semi_join(fact, dim, on="k", right_on="dk")) \
        .select(["k", "v", "w"]).sort_by([("k", "ascending"),
                                          ("v", "ascending")])
    want = _collect(shuffle_join(fact, dim, on="k", right_on="dk",
                                 join_type="inner")) \
        .select(["k", "v", "w"]).sort_by([("k", "ascending"),
                                          ("v", "ascending")])
    assert got.equals(want)
    # sanity: the join actually matched something and the result is
    # only the dim-key subset of the fact
    assert 0 < got.num_rows < 50_000
    assert set(np.unique(got["k"].to_numpy())) <= set(dim_keys.tolist())

    # the probe itself prunes: with fp_rate 1e-3 over a 2% -selective
    # dim, >= 95% of non-matching fact rows must drop before the join
    bloom = bloom_build(dim.select_columns(["dk"]), col="dk",
                        fp_rate=1e-3)
    mask = bloom.contains(fact_keys.astype(object))
    true_matches = np.isin(fact_keys, dim_keys)
    assert mask[true_matches].all()  # no false negatives, ever
    fp = mask[~true_matches].mean()
    assert fp < 0.05


def test_semijoin_empty_dim(ray_session):
    import ray.data

    from pyschema_ray.functions.bloom import bloom_semi_join

    fact = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    }))
    dim = ray.data.from_arrow(pa.table({
        "dk": pa.array([99], pa.int64()),
        "w": pa.array([0], pa.int64()),
    }))
    out = _collect(bloom_semi_join(fact, dim, on="k", right_on="dk"))
    assert out.num_rows == 0


def test_semijoin_int32_keys(ray_session):
    """The sentinel must respect the key type's range (int32 keys
    reject a 2^62 sentinel)."""
    import ray.data

    from pyschema_ray.functions.bloom import bloom_semi_join

    fact = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int32()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    dim = ray.data.from_arrow(pa.table({
        "dk": pa.array([2, 4], pa.int32()),
        "w": pa.array([20, 40], pa.int64()),
    }))
    out = _collect(bloom_semi_join(fact, dim, on="k", right_on="dk")) \
        .sort_by("v")
    assert out["v"].to_pylist() == [2, 4]
    assert out["w"].to_pylist() == [20, 40]

    # fully-pruned corner with int32 keys: empty result, no error
    dim2 = ray.data.from_arrow(pa.table({
        "dk": pa.array([99], pa.int32()),
        "w": pa.array([0], pa.int64()),
    }))
    assert _collect(bloom_semi_join(fact, dim2, on="k",
                                    right_on="dk")).num_rows == 0
