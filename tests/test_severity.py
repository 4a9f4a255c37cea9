"""Warning-severity constraints (constraints.as_warning): violations
are still recorded (counts, rows, manifest) but never flip partition /
shard / run verdicts — the observe-first rollout mode."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyschema_ray import Integer, List, Record, Text, no_auto_store
from pyschema_ray.constraints import Range, as_warning
from pyschema_ray.pipelines.validate import (PipelineConfig,
                                             ValidationPipeline)


def _schema():
    # defined inside a function so cloudpickle ships the class BY
    # VALUE to workers (test modules aren't importable there)
    @no_auto_store
    class Clean(Record):
        doc_id = Text(nullable=False)
        n_tok = Integer(size=4)
        _key_field = "doc_id"
    return Clean


def _write_corpus(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(20)], pa.string()),
        "n_tok": pa.array([10 * i for i in range(20)], pa.int64()),
    })
    pq.write_table(t, d / "part-0.parquet")
    return str(d)


def _run(tmp_path, constraint):
    cfg = PipelineConfig(
        schema_cls=_schema(), input_paths=_write_corpus(tmp_path),
        out_dir=str(tmp_path / "run"), files_per_shard=1,
        extra_constraints=[constraint])
    return ValidationPipeline(cfg).run()


def test_warning_records_but_passes(tmp_path):
    # fires on n_tok > 100 (9 rows) but must NOT fail the run
    rep = _run(tmp_path, as_warning(Range("n_tok", None, 100)))
    assert rep.passed is True
    assert rep.violation_counts == {"range(n_tok)": 9}
    assert rep.warning_counts == {"range(n_tok)": 9}
    assert set(rep.partition_verdicts.values()) == {"pass"}
    # violation ROWS still written for observability
    files = glob.glob(os.path.join(rep.out_dir, "violations", "*.parquet"))
    rows = pa.concat_tables([pq.read_table(f) for f in files])
    assert rows.num_rows == 9


def test_same_constraint_as_error_fails(tmp_path):
    rep = _run(tmp_path, Range("n_tok", None, 100))
    assert rep.passed is False
    assert rep.violation_counts == {"range(n_tok)": 9}
    assert rep.warning_counts == {}
    assert set(rep.partition_verdicts.values()) == {"fail"}


def test_warning_does_not_mask_real_errors(tmp_path):
    # a warning constraint firing alongside a DIFFERENTLY-NAMED error
    # constraint: the run still fails, and only the warning shows in
    # warning_counts.  (Severity is keyed by the frozen constraint
    # name — two same-named constraints share one severity.)
    from pyschema_ray.constraints import Utf8Length

    cfg = PipelineConfig(
        schema_cls=_schema(), input_paths=_write_corpus(tmp_path),
        out_dir=str(tmp_path / "run"), files_per_shard=1,
        extra_constraints=[as_warning(Range("n_tok", None, 100)),
                           Utf8Length("doc_id", min_length=4)])
    rep = ValidationPipeline(cfg).run()
    assert rep.passed is False
    assert rep.warning_counts == {"range(n_tok)": 9}
    assert rep.violation_counts["utf8_length(doc_id)"] > 0


def test_cleaner_keeps_warning_violations(tmp_path):
    # the corpus cleaner drops rows only for ERROR-severity rules:
    # the same Range as a warning keeps all 20 rows, as an error
    # keeps the 11 passing ones
    import glob

    import pyarrow.parquet as pq2

    from pyschema_ray.pipelines.clean import write_validated

    d = _write_corpus(tmp_path)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))

    res_w = write_validated(
        files, str(tmp_path / "clean_w"), _schema(),
        extra_constraints=[as_warning(Range("n_tok", None, 100))])
    assert res_w["rows_kept"] == 20

    res_e = write_validated(
        files, str(tmp_path / "clean_e"), _schema(),
        extra_constraints=[Range("n_tok", None, 100)])
    assert res_e["rows_kept"] == 11


def test_diff_runs_flags_regressions(tmp_path):
    # run A: clean schema; run B: adds an error Range that fires ->
    # regressed rate, verdict flip, passed True -> False
    from pyschema_ray.state.manifest import diff_runs

    d = _write_corpus(tmp_path)
    cfg_a = PipelineConfig(schema_cls=_schema(), input_paths=d,
                           out_dir=str(tmp_path / "run_a"),
                           files_per_shard=1)
    ValidationPipeline(cfg_a).run()
    cfg_b = PipelineConfig(
        schema_cls=_schema(), input_paths=d,
        out_dir=str(tmp_path / "run_b"), files_per_shard=1,
        extra_constraints=[Range("n_tok", None, 100)])
    ValidationPipeline(cfg_b).run()

    diff = diff_runs(str(tmp_path / "run_a"), str(tmp_path / "run_b"))
    assert diff["rows_old"] == diff["rows_new"] == 20
    assert diff["new_constraints"] == ["range(n_tok)"]
    assert diff["regressed"] == {"range(n_tok)": 1e6 * 9 / 20}
    assert diff["passed_old"] is True and diff["passed_new"] is False
    assert list(diff["verdict_flips"].values()) == [("pass", "fail")]
