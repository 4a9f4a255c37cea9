"""Regression tests for the round-1 ADVICE findings:

1. PartitionStats.merge must not alias (and later corrupt) the other
   side's sketch objects — global_rollup was folding every partition
   into the FIRST partition's tdigest/hll/histogram.
2. Custom constraints must treat nulls as valid (frozen null contract,
   and parity with SQL oracles where NULL predicates are not selected).
3. Partition lineage must distinguish same-basename files in different
   directories.
4. CompiledValidator must not mutate a caller-shared StatsConfig when
   aligning histogram bins with a baseline profile.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyschema_ray import Integer, Record, Text
from pyschema_ray.constraints import Custom
from pyschema_ray.sketches import GroupedHistogram, HyperLogLog, TDigest
from pyschema_ray.stages.drift import BaselineProfile
from pyschema_ray.stages.stats import PartitionStats, global_rollup
from pyschema_ray.stages.validator import CompiledValidator, StatsConfig


def _pstats(pid: str, values: np.ndarray, group: str) -> PartitionStats:
    ps = PartitionStats(partition_id=pid, row_count=len(values))
    ps.tdigest = TDigest().add(values)
    h = HyperLogLog()
    h.add_strings([f"{pid}-{v}" for v in values])
    ps.hll = h
    g = GroupedHistogram(0.0, 100.0, 8)
    g.add([group] * len(values), values)
    ps.hist = g
    return ps


def test_global_rollup_does_not_corrupt_partition_sketches():
    p1 = _pstats("p1", np.arange(10.0), "a")
    p2 = _pstats("p2", np.arange(50.0, 90.0), "b")
    per_part = {"p1": p1, "p2": p2}
    before = {pid: (ps.tdigest.to_bytes(), ps.hll.to_bytes(),
                    ps.hist.to_bytes())
              for pid, ps in per_part.items()}

    g = global_rollup(per_part)

    # the rollup saw everything ...
    assert g.row_count == 50
    assert set(g.hist.groups) == {"a", "b"}
    assert g.tdigest.count == 50
    # ... but no partition's sketches were modified (the aliasing bug
    # made p1's hist become the global hist object)
    for pid, ps in per_part.items():
        assert ps.tdigest.to_bytes() == before[pid][0], pid
        assert ps.hll.to_bytes() == before[pid][1], pid
        assert ps.hist.to_bytes() == before[pid][2], pid
    assert set(p1.hist.groups) == {"a"}
    assert g.hist is not p1.hist and g.tdigest is not p1.tdigest
    assert g.hll is not p1.hll


def test_partition_stats_merge_clones_when_adopting():
    src = _pstats("src", np.arange(5.0), "a")
    empty = PartitionStats(partition_id="acc")
    empty.merge(src)
    empty.merge(_pstats("other", np.arange(20.0, 30.0), "b"))
    # src must be untouched by merges into the accumulator
    assert src.tdigest.count == 5
    assert set(src.hist.groups) == {"a"}
    assert empty.tdigest.count == 15


class _DocNull(Record):
    doc_id = Text(nullable=False)
    text = Text()
    n_chars = Integer(size=8)  # nullable
    _key_field = "doc_id"


def test_custom_constraint_null_is_valid():
    """A Custom expression yielding null on null input (Arrow kernel
    semantics) must NOT emit a violation — matching both the frozen
    null contract and a DuckDB oracle ``n_chars <> length(text)``."""
    check = Custom("n_chars_eq_len",
                   lambda t: pc.equal(t["n_chars"],
                                      pc.utf8_length(t["text"])))
    v = CompiledValidator(_DocNull, extra_constraints=[check])
    table = pa.table({
        "doc_id": ["d1", "d2", "d3"],
        "text": ["abc", "defg", "hi"],
        "n_chars": pa.array([3, None, 99], pa.int64()),
    })
    result = v.validate_table(table, "p0")
    viol = result.filter(pc.equal(result["kind"], "violation"))
    flagged = viol.filter(
        pc.equal(viol["constraint"], "custom(n_chars_eq_len)"))
    # only d3 (wrong count) — NOT d2 (null n_chars)
    assert flagged["key"].to_pylist() == ["d3"]


def test_stats_config_not_mutated_by_baseline():
    cfg = StatsConfig(histogram_column="n_chars", histogram_group="doc_id")
    baseline = BaselineProfile(lo=5.0, hi=55.0, nbins=10, groups={})
    v = CompiledValidator(_DocNull, stats=cfg, baseline_profile=baseline)
    # validator aligned ITS copy with the baseline ...
    assert v.stats.histogram_range == (5.0, 55.0)
    assert v.stats.histogram_bins == 10
    # ... but the caller's shared config is unchanged
    assert cfg.histogram_range == (1.0, 4096.0)
    assert cfg.histogram_bins == 64


def test_same_basename_files_stay_distinct_partitions(tmp_path):
    """Two inputs named part.parquet in different subdirectories must
    get distinct lineage ids (relative paths), distinct verdicts and
    distinct row counts — not silently merge."""
    from pyschema_ray.pipelines.validate import (PipelineConfig,
                                                 ValidationPipeline)

    # defined in-function so cloudpickle ships the class by value to
    # Ray workers (the test module is not importable there)
    class _LinDoc(Record):
        doc_id = Text(nullable=False, regex=r"^doc-\d+$")
        n = Integer(size=8, min=0, max=100)
        _key_field = "doc_id"

    d_a, d_b = tmp_path / "a", tmp_path / "b"
    d_a.mkdir(); d_b.mkdir()
    pq.write_table(pa.table({"doc_id": ["doc-1", "doc-2"],
                             "n": [1, 2]}), d_a / "part.parquet")
    pq.write_table(pa.table({"doc_id": ["doc-3", "bad-id", "doc-5"],
                             "n": [3, 4, 999]}), d_b / "part.parquet")

    cfg = PipelineConfig(
        schema_cls=_LinDoc,
        input_paths=[str(d_a / "part.parquet"), str(d_b / "part.parquet")],
        out_dir=str(tmp_path / "out"), check_unique=False)
    report = ValidationPipeline(cfg).run()

    a_id = os.path.join("a", "part.parquet")
    b_id = os.path.join("b", "part.parquet")
    assert set(report.partition_verdicts) == {a_id, b_id}
    assert report.partition_verdicts[a_id] == "pass"
    assert report.partition_verdicts[b_id] == "fail"
    assert report.partition_violations[a_id] == 0
    assert report.partition_violations[b_id] == 2  # regex + range
    # violation rows carry the relative lineage id too
    viol = report.violations_table()
    assert set(viol["partition_id"].to_pylist()) == {b_id}
