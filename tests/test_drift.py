"""Drift-check tests per FIXTURES.md F3: a clean same-distribution
table must pass; a table whose n_tok lognormal mean is 1.5x the
baseline must fail PSI/KL.  Exercises the actor-pool DriftScorer path
end to end."""

import numpy as np
import pyarrow as pa
import pytest

from pyschema_ray.sources.synth import generate_sequences
from pyschema_ray.stages.drift import (BaselineProfile, DriftScorer,
                                       build_baseline_profile,
                                       drift_pipeline, merge_partials,
                                       score_drift)


@pytest.fixture(scope="module")
def baseline(tmp_path_factory):
    import ray.data

    d = tmp_path_factory.mktemp("baseline_data")
    paths, _ = generate_sequences(20_000, seed=7, out_dir=str(d), n_files=4,
                                  inject=False)
    ds = ray.data.read_parquet(paths)
    return build_baseline_profile(ds, "n_tok", "source")


def test_baseline_json_round_trip(baseline, tmp_path):
    p = str(tmp_path / "profile.json")
    baseline.save(p)
    b2 = BaselineProfile.load(p)
    assert b2.nbins == baseline.nbins
    for g in baseline.groups:
        np.testing.assert_array_equal(b2.groups[g], baseline.groups[g])


def test_same_distribution_passes(baseline, tmp_path):
    import ray.data

    paths, _ = generate_sequences(20_000, seed=42, out_dir=str(tmp_path),
                                  n_files=4, inject=False)
    ds = ray.data.read_parquet(paths)
    result = drift_pipeline(ds, baseline, "n_tok", "source",
                            concurrency=(1, 2))
    assert result["passed"], result
    assert result["overall_psi"] < 0.05


def test_shifted_distribution_fails(baseline, tmp_path):
    import ray.data

    paths, _ = generate_sequences(20_000, seed=43, out_dir=str(tmp_path),
                                  n_files=4, inject=False, mean_len=300.0)
    ds = ray.data.read_parquet(paths)
    result = drift_pipeline(ds, baseline, "n_tok", "source",
                            concurrency=(1, 2))
    assert not result["passed"], result
    assert result["overall_psi"] > 0.25


def test_missing_group_is_maximal_drift(baseline):
    from pyschema_ray.sketches import GroupedHistogram

    actual = GroupedHistogram(baseline.lo, baseline.hi, baseline.nbins)
    actual.add(np.array(["never-seen-source"] * 100, dtype=object),
               np.random.default_rng(0).uniform(1, 4096, 100))
    result = score_drift(actual, baseline)
    assert "never-seen-source" in result["groups"]
    assert result["groups"]["never-seen-source"]["psi"] > 0.25


def test_per_partition_drift_verdicts(baseline, tmp_path):
    """Pipeline with a baseline profile: a shifted corpus fails drift
    PER PARTITION even with zero row-constraint violations."""
    from pyschema_ray import Integer, List, Record, Text, no_auto_store
    from pyschema_ray.pipelines.validate import (PipelineConfig,
                                                 ValidationPipeline)
    from pyschema_ray.stages.validator import StatsConfig

    @no_auto_store
    class Seqs(Record):
        doc_id = Text(nullable=False)
        tokens = List(Integer(size=4), nullable=False)
        n_tok = Integer(size=4)
        source = Text(nullable=False)
        _key_field = "doc_id"

    paths, _ = generate_sequences(8_000, seed=44, n_files=4, inject=False,
                                  mean_len=320.0,
                                  out_dir=str(tmp_path / "shifted"))
    cfg = PipelineConfig(
        schema_cls=Seqs, input_paths=str(tmp_path / "shifted"),
        out_dir=str(tmp_path / "out"), files_per_shard=4,
        baseline_profile=baseline,
        stats=StatsConfig(histogram_column="n_tok",
                          histogram_group="source"),
        check_unique=False)
    rep = ValidationPipeline(cfg).run()
    assert rep.violation_counts == {}          # rows themselves are clean
    assert not rep.passed                      # but drift fails globally
    assert rep.drift is not None and not rep.drift["passed"]
    assert len(rep.partition_drift) == 4
    for pid, d in rep.partition_drift.items():
        assert not d["passed"], (pid, d)
        assert rep.partition_verdicts[pid] == "fail"

    # the same-distribution corpus passes per partition
    paths2, _ = generate_sequences(8_000, seed=45, n_files=4, inject=False,
                                   out_dir=str(tmp_path / "same"))
    cfg2 = PipelineConfig(
        schema_cls=Seqs, input_paths=str(tmp_path / "same"),
        out_dir=str(tmp_path / "out2"), files_per_shard=4,
        baseline_profile=baseline,
        stats=StatsConfig(histogram_column="n_tok",
                          histogram_group="source"),
        check_unique=False)
    rep2 = ValidationPipeline(cfg2).run()
    assert rep2.passed, (rep2.drift, rep2.partition_drift)
    assert all(d["passed"] for d in rep2.partition_drift.values())


def test_self_drift_matches_two_pass_pipeline(tmp_path):
    """One-scan self_drift must equal build_baseline_profile +
    drift_pipeline on the same input (zero drift, identical groups)."""
    import ray.data

    from pyschema_ray.stages.drift import (build_baseline_profile,
                                           drift_pipeline, self_drift)

    rng = np.random.default_rng(3)
    t = pa.table({
        "grp": pa.array(rng.choice(["a", "b", "c"], size=5000)),
        "val": pa.array(rng.normal(100, 20, size=5000)),
    })
    ds = ray.data.from_arrow(t)
    base = build_baseline_profile(ds, "val", "grp", lo=0, hi=200, nbins=32)
    want = drift_pipeline(ray.data.from_arrow(t), base, "val", "grp")

    got, profile = self_drift(ray.data.from_arrow(t), "val", "grp",
                              lo=0, hi=200, nbins=32)
    assert got["passed"] and want["passed"]
    assert got["overall_psi"] == want["overall_psi"] == 0.0 or \
        abs(got["overall_psi"] - want["overall_psi"]) < 1e-12
    assert got["groups"].keys() == want["groups"].keys()
    # the returned profile is reusable as a real baseline
    again = drift_pipeline(ray.data.from_arrow(t), profile, "val", "grp")
    assert again["passed"]
