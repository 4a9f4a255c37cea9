"""Engine-vs-oracle parity (the correctness criterion of SURVEY.md §5.2):
a deliberately naive, row-at-a-time pure-Python validator (pyschema
``Field.load`` semantics) is run over the synthetic corpus; the
engine's violation rows and per-partition verdicts must match it
exactly.  Also: resume idempotence and the per-row token round-trip
invariant."""

import collections
import glob
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyschema_ray.pipelines.validate import (PipelineConfig,
                                             ValidationPipeline)
from pyschema_ray.sources.synth import VOCAB, sources_dim_table
from pyschema_ray.stages.validator import StatsConfig

DOC_RE = re.compile(r"^doc-\d{12}$")


def oracle_validate(table: pa.Table):
    """Naive row-at-a-time oracle.  Returns a multiset of
    (key, constraint) pairs, in the engine's frozen naming."""
    out = []
    rows = table.to_pylist()
    id_counts = collections.Counter(r["doc_id"] for r in rows
                                    if r["doc_id"] is not None)
    for r in rows:
        key = r["doc_id"] if r["doc_id"] is not None else "<null>"
        if r["doc_id"] is None:
            out.append((key, "not_null(doc_id)"))
        elif not DOC_RE.search(r["doc_id"]):
            out.append((key, "regex(doc_id)"))
        if r["tokens"] is None:
            out.append((key, "not_null(tokens)"))
        else:
            if any(t < 0 or t >= VOCAB for t in r["tokens"]):
                out.append((key, "element_range(tokens)"))
        if r["n_tok"] is not None:
            if not (1 <= r["n_tok"] <= 4096):
                out.append((key, "range(n_tok)"))
            if r["tokens"] is not None and r["n_tok"] != len(r["tokens"]):
                out.append((key, "length_eq(n_tok,tokens)"))
        if r["source"] is None:
            out.append((key, "not_null(source)"))
        elif r["source"] not in set(sources_dim_table()["source"].to_pylist()):
            out.append((key, "ref(source->sources_dim.source)"))
    for k, c in id_counts.items():
        if c > 1:
            out.append((k, "unique(doc_id)"))
    return sorted(out)


@pytest.fixture(scope="module")
def run_report(synth_corpus, sequences_schema, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    cfg = PipelineConfig(
        schema_cls=sequences_schema,
        input_paths=synth_corpus["dir"],
        out_dir=str(out),
        files_per_shard=3,
        concurrency=2,
        stats=StatsConfig(quantile_column="n_tok", cardinality_column="doc_id",
                          histogram_column="n_tok", histogram_group="source",
                          minmax_columns=["n_tok"]),
        ref_sets={"source": ("sources_dim", "source",
                             sources_dim_table()["source"].to_pylist())},
    )
    return ValidationPipeline(cfg).run()


def test_violation_rows_match_oracle_exactly(synth_corpus, run_report):
    full = pa.concat_tables(pq.read_table(p) for p in synth_corpus["paths"])
    expected = oracle_validate(full)
    vt = run_report.violations_table()
    actual = sorted(zip(vt["key"].to_pylist(), vt["constraint"].to_pylist()))
    assert actual == expected


def test_violation_counts_match_injection(synth_corpus, run_report):
    inj = collections.Counter(c for _, c in synth_corpus["expected"])
    # injection uses in_set naming for the source-domain defect; the
    # engine evaluates it as the broadcast referential constraint
    inj["ref(source->sources_dim.source)"] = inj.pop("in_set(source)")
    got = dict(run_report.violation_counts)
    # unique: engine counts duplicate KEYS, injection counts dup rows;
    # with single duplication per key these coincide
    assert got == dict(inj)


def test_per_partition_verdicts(synth_corpus, run_report):
    """A partition (input file) fails iff the oracle finds a violation
    in that file (uniqueness is global, judged separately)."""
    verdicts = run_report.partition_verdicts
    assert len(verdicts) == len(synth_corpus["paths"])
    for p in synth_corpus["paths"]:
        t = pq.read_table(p)
        oracle = [v for v in oracle_validate(t)
                  if v[1] != "unique(doc_id)"]  # global check excluded
        expected = "fail" if oracle else "pass"
        assert verdicts[os.path.basename(p)] == expected, p


def test_stats_digest_sane(run_report):
    gs = run_report.global_stats
    assert gs["row_count"] == 10_000
    # ~20 null ids, ~50 dup rows -> ndv ~ 9930; HLL p=14 ±2.5%
    assert abs(gs["ndv_estimate"] - 9930) / 9930 < 0.025
    assert 150 < gs["quantiles"]["p50"] < 260
    assert gs["quantiles"]["p90"] > gs["quantiles"]["p50"]


def test_resume_skips_and_is_identical(synth_corpus, sequences_schema,
                                       tmp_path_factory, run_report):
    out = tmp_path_factory.mktemp("resume")
    cfg = PipelineConfig(
        schema_cls=sequences_schema, input_paths=synth_corpus["dir"],
        out_dir=str(out), files_per_shard=3, concurrency=2,
        stats=StatsConfig(quantile_column="n_tok",
                          cardinality_column="doc_id"),
        ref_sets={"source": ("sources_dim", "source",
                             sources_dim_table()["source"].to_pylist())},
    )
    # simulate a crash after the first shard completed
    p = ValidationPipeline(cfg)
    files = sorted(glob.glob(os.path.join(synth_corpus["dir"], "*.parquet")))
    p._run_shard(0, files[0:3])
    rep = ValidationPipeline(cfg).run()
    assert rep.shards_skipped == 1
    vt = rep.violations_table()
    ref = run_report.violations_table()
    assert sorted(zip(vt["key"].to_pylist(), vt["constraint"].to_pylist())) \
        == sorted(zip(ref["key"].to_pylist(), ref["constraint"].to_pylist()))
    assert rep.row_count == run_report.row_count


def test_rerun_of_completed_run_is_noop(run_report, synth_corpus,
                                        sequences_schema):
    cfg = PipelineConfig(
        schema_cls=sequences_schema, input_paths=synth_corpus["dir"],
        out_dir=run_report.out_dir, files_per_shard=3, concurrency=2,
        stats=StatsConfig(quantile_column="n_tok", cardinality_column="doc_id",
                          histogram_column="n_tok", histogram_group="source",
                          minmax_columns=["n_tok"]),
        ref_sets={"source": ("sources_dim", "source",
                             sources_dim_table()["source"].to_pylist())},
    )
    rep2 = ValidationPipeline(cfg).run()
    assert rep2.shards_skipped == rep2.shard_count
    assert rep2.violation_counts == run_report.violation_counts


def test_token_round_trip_invariant(synth_corpus, tmp_path):
    """Per-row token-array equality through the engine's read/write
    path: read the corpus with Ray Data, write it back as parquet,
    re-read, and compare every tokens array by doc_id."""
    import ray.data

    ds = ray.data.read_parquet(synth_corpus["paths"])
    out = str(tmp_path / "roundtrip")
    ds.write_parquet(out)
    back = pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(out, "*.parquet"))))
    orig = pa.concat_tables(pq.read_table(p) for p in synth_corpus["paths"])
    orig = orig.filter(pc.is_valid(orig["doc_id"]))
    back = back.filter(pc.is_valid(back["doc_id"]))
    orig = orig.sort_by([("doc_id", "ascending"), ("n_tok", "ascending")])
    back = back.sort_by([("doc_id", "ascending"), ("n_tok", "ascending")])
    assert orig.num_rows == back.num_rows
    assert back["tokens"].combine_chunks().cast(pa.list_(pa.int32())) \
        .equals(orig["tokens"].combine_chunks().cast(pa.list_(pa.int32())))


def test_worst_partitions_reporting(run_report):
    worst = run_report.worst_partitions(3)
    assert len(worst) == 3
    counts = [c for _, c in worst]
    assert counts == sorted(counts, reverse=True)
    assert all(run_report.partition_verdicts[p] == "fail"
               for p, c in worst if c > 0)
