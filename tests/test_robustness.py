"""Degenerate-input robustness: empty files, zero-violation corpora,
all-duplicate corpora, single-row files."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyschema_ray.pipelines.validate import (PipelineConfig,
                                             ValidationPipeline)
from pyschema_ray.stages.unique import uniqueness_violations
from pyschema_ray.stages.validator import StatsConfig


def _write_corpus(d, tables):
    paths = []
    for i, t in enumerate(tables):
        p = os.path.join(d, f"part-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def _seq_table(ids, n_tok=5):
    flat = np.arange(n_tok * len(ids), dtype=np.int32) % 100
    offsets = np.arange(0, n_tok * len(ids) + 1, n_tok)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pa.array(flat, pa.int32()))
    return pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "tokens": tokens,
        "n_tok": pa.array([n_tok] * len(ids), pa.int32()),
        "source": pa.array(["web"] * len(ids), pa.string()),
    })


def test_empty_file_and_clean_corpus(tmp_path, sequences_schema):
    d = str(tmp_path / "data")
    os.makedirs(d)
    empty = _seq_table([]).schema.empty_table()
    clean = _seq_table([f"doc-{i:012d}" for i in range(50)])
    _write_corpus(d, [clean, empty, _seq_table([f"doc-{i:012d}"
                                               for i in range(100, 103)])])
    cfg = PipelineConfig(
        schema_cls=sequences_schema, input_paths=d,
        out_dir=str(tmp_path / "out"),
        stats=StatsConfig(quantile_column="n_tok",
                          cardinality_column="doc_id"))
    rep = ValidationPipeline(cfg).run()
    assert rep.row_count == 53
    assert rep.passed  # clean corpus passes
    assert rep.violation_counts == {}
    assert rep.duplicate_count == 0
    # the empty partition gets a pass verdict
    assert all(v == "pass" for v in rep.partition_verdicts.values())


def test_all_duplicates_corpus(tmp_path, sequences_schema):
    d = str(tmp_path / "dups")
    os.makedirs(d)
    same = _seq_table(["doc-000000000001"] * 40)
    _write_corpus(d, [same.slice(0, 20), same.slice(20, 20)])
    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=d,
                         out_dir=str(tmp_path / "out2"))
    rep = ValidationPipeline(cfg).run()
    assert not rep.passed
    assert rep.duplicate_count == 1  # one duplicated KEY (40 rows)
    vt = rep.violations_table()
    assert vt.num_rows == 1
    assert vt["constraint"][0].as_py() == "unique(doc_id)"


def test_fused_read_prunes_undeclared_columns(tmp_path, sequences_schema):
    """A fat undeclared column must not change results (it is pruned at
    the parquet read), and a file MISSING a declared column must still
    surface as a schema violation, not a read error."""
    d = str(tmp_path / "fat")
    os.makedirs(d)
    base = _seq_table([f"doc-{i:012d}" for i in range(50)])
    fat = base.append_column(
        "blob", pa.array(["x" * 10_000] * base.num_rows, pa.string()))
    pq.write_table(fat, os.path.join(d, "a.parquet"))
    pq.write_table(base.drop_columns(["source"]),
                   os.path.join(d, "b.parquet"))

    from pyschema_ray.stages.validator import CompiledValidator

    cv = CompiledValidator(sequences_schema)
    cols = cv.read_columns()
    assert cols is not None and "blob" not in cols
    assert set(cols) >= {"doc_id", "tokens", "n_tok", "source"}

    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=d,
                         out_dir=str(tmp_path / "fat_out"),
                         check_unique=False)
    rep = ValidationPipeline(cfg).run()
    vt = rep.violations_table()
    by_c = dict(zip(*np.unique(vt["constraint"].to_pylist(),
                               return_counts=True))) if vt.num_rows else {}
    # only the missing-column schema violation from b.parquet
    assert by_c == {"schema(source)": 1}
    assert rep.row_count == 100


def test_stream_uniqueness_all_duplicates_1m(tmp_path):
    """Pathological corpus: 1M rows, EVERY key duplicated (500k distinct
    x2).  The streaming sink must produce the full duplicate set as
    worker-written parquet with only the count returned to the driver."""
    import pyarrow.parquet as _pq

    from pyschema_ray.stages.unique import stream_uniqueness_violations

    d = tmp_path / "big"
    d.mkdir()
    paths = []
    n_files, rows_per = 4, 250_000
    for i in range(n_files):
        # ids repeat across file halves -> every id appears exactly twice
        base = np.arange(rows_per // 2, dtype=np.int64) \
            + i * (rows_per // 2)
        ids = np.concatenate([base, base])
        p = str(d / f"f{i}.parquet")
        _pq.write_table(pa.table({"user_id": pa.array(ids, pa.int64())}), p)
        paths.append(p)

    out_dir = str(tmp_path / "uniq_out")
    n = stream_uniqueness_violations(paths, "user_id", out_dir)
    assert n == n_files * rows_per // 2  # 500k duplicated keys
    import glob
    written = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    assert written
    total = sum(_pq.read_metadata(f).num_rows for f in written)
    assert total == n
    one = _pq.read_table(written[0])
    assert one.column_names == ["key", "partition_id", "constraint",
                                "detail"]
    assert one["constraint"][0].as_py() == "unique(user_id)"


def test_uniqueness_on_single_row_files(tmp_path):
    import ray.data

    d = str(tmp_path / "single")
    os.makedirs(d)
    paths = _write_corpus(d, [_seq_table([f"doc-{i:012d}"])
                              for i in range(5)])
    out = uniqueness_violations(paths, "doc_id")
    assert out.num_rows == 0
    ds = ray.data.read_parquet(paths)
    out2 = uniqueness_violations(ds, "doc_id")
    assert out2.num_rows == 0


def test_validator_zero_row_batch(sequences_schema):
    from pyschema_ray.stages.validator import CompiledValidator

    v = CompiledValidator(sequences_schema)
    empty = _seq_table([]).schema.empty_table()
    out = v(empty)
    # no violations; exactly the always-emitted stats row (counts must
    # flow to verdicts even with stats=None)
    assert out.num_rows == 1
    assert out["kind"][0].as_py() == "stats"
    assert out["row_count"][0].as_py() == 0


def test_stream_violations_mode_matches_pull_mode(tmp_path, synth_corpus,
                                                  sequences_schema):
    from pyschema_ray.sources.synth import sources_dim_table

    def cfg(out, stream):
        return PipelineConfig(
            schema_cls=sequences_schema, input_paths=synth_corpus["dir"],
            out_dir=str(tmp_path / out), files_per_shard=4,
            stream_violations=stream,
            stats=StatsConfig(quantile_column="n_tok",
                              cardinality_column="doc_id"),
            ref_sets={"source": ("sources_dim", "source",
                                 sources_dim_table()["source"].to_pylist())})

    rs = ValidationPipeline(cfg("stream", True)).run()
    rp = ValidationPipeline(cfg("pull", False)).run()
    assert rs.violation_counts == rp.violation_counts
    vs, vp = rs.violations_table(), rp.violations_table()
    assert sorted(zip(vs["key"].to_pylist(), vs["constraint"].to_pylist())) \
        == sorted(zip(vp["key"].to_pylist(), vp["constraint"].to_pylist()))
    assert rs.row_count == rp.row_count == 10_000


def test_default_config_fails_on_violations(tmp_path, synth_corpus,
                                            sequences_schema):
    """Regression (review finding): with the DEFAULT config (stats=None)
    the pipeline must still count violations and fail."""
    cfg = PipelineConfig(schema_cls=sequences_schema,
                         input_paths=synth_corpus["dir"],
                         out_dir=str(tmp_path / "default"))
    rep = ValidationPipeline(cfg).run()
    assert not rep.passed
    assert rep.violation_counts["regex(doc_id)"] == 20
    assert rep.row_count == 10_000


def test_resume_refuses_changed_file_set(tmp_path, synth_corpus,
                                         sequences_schema):
    """Regression (review finding): resuming over a different input
    file set must refuse, not silently skip the wrong files."""
    import pytest as _pytest

    cfg = PipelineConfig(schema_cls=sequences_schema,
                         input_paths=synth_corpus["paths"][:4],
                         out_dir=str(tmp_path / "r1"), files_per_shard=2)
    ValidationPipeline(cfg).run()
    cfg2 = PipelineConfig(schema_cls=sequences_schema,
                          input_paths=synth_corpus["paths"][2:6],
                          out_dir=str(tmp_path / "r1"), files_per_shard=2)
    with _pytest.raises(RuntimeError, match="different input files"):
        ValidationPipeline(cfg2).run()


def test_schema_declared_unique_and_references(tmp_path, synth_corpus):
    """Regression (review finding): Field(unique=True) on a non-key
    column and Field(references=...) must actually be enforced."""
    import pytest as _pytest

    from pyschema_ray import Integer, List, Record, Text, no_auto_store
    from pyschema_ray.sources.synth import VOCAB, sources_dim_table

    @no_auto_store
    class SeqsRef(Record):
        doc_id = Text(nullable=False, unique=True)
        tokens = List(Integer(size=4), nullable=False)
        n_tok = Integer(size=4, unique=True)     # NOT unique in data
        source = Text(nullable=False,
                      references=("sources_dim", "source"))
        _key_field = "doc_id"

    # declared reference without a dim table -> explicit error
    with _pytest.raises(ValueError, match="references"):
        ValidationPipeline(PipelineConfig(
            schema_cls=SeqsRef, input_paths=synth_corpus["dir"],
            out_dir=str(tmp_path / "x")))

    cfg = PipelineConfig(
        schema_cls=SeqsRef, input_paths=synth_corpus["dir"],
        out_dir=str(tmp_path / "y"), files_per_shard=4,
        dim_tables={"sources_dim": sources_dim_table()})
    rep = ValidationPipeline(cfg).run()
    # the declared reference is enforced (20 injected unknown sources)
    assert rep.violation_counts[
        "ref(source->sources_dim.source)"] == 20
    # BOTH declared unique columns are checked; n_tok is wildly dup'd
    assert rep.violation_counts["unique(doc_id)"] == 50
    assert rep.violation_counts["unique(n_tok)"] > 100


def test_pruning_disabled_for_opaque_extra_constraints(sequences_schema):
    """Regression: a non-Custom extra constraint that does not declare
    its input columns must disable column pruning entirely (its mask
    may read anything); one that declares required_columns() gets them
    added to the read set."""
    from pyschema_ray.constraints import Constraint
    from pyschema_ray.stages.validator import CompiledValidator

    class Opaque(Constraint):
        name = "opaque"
        detail = "opaque"

        def mask(self, table):
            return pa.array([True] * table.num_rows)

    cv = CompiledValidator(sequences_schema, extra_constraints=[Opaque()])
    assert cv.read_columns() is None

    class Declared(Constraint):
        name = "declared"
        detail = "declared"

        def required_columns(self):
            return ["aux_a", "aux_b"]

        def mask(self, table):
            return pa.array([True] * table.num_rows)

    cv2 = CompiledValidator(sequences_schema,
                            extra_constraints=[Declared()])
    cols = cv2.read_columns()
    assert cols is not None and {"aux_a", "aux_b"} <= set(cols)


def test_lineage_root_persisted_across_resume(tmp_path, sequences_schema):
    """Regression: appending a new input directory on resume must not
    move the lineage root — resumed and fresh shards would otherwise
    record inconsistent partition ids."""
    d_a = tmp_path / "in" / "a"
    os.makedirs(d_a)
    pq.write_table(_seq_table([f"doc-{i:012d}" for i in range(10)]),
                   str(d_a / "f1.parquet"))
    out = str(tmp_path / "out")
    cfg = PipelineConfig(schema_cls=sequences_schema,
                         input_paths=str(d_a), out_dir=out,
                         check_unique=False, files_per_shard=1)
    rep1 = ValidationPipeline(cfg).run()
    assert set(rep1.partition_verdicts) == {"f1.parquet"}

    # append a second directory; old shard (f1) still aligns, so the
    # run resumes — partition ids must keep the ORIGINAL root
    d_b = tmp_path / "in" / "b"
    os.makedirs(d_b)
    pq.write_table(_seq_table([f"doc-{i:012d}" for i in range(10, 20)]),
                   str(d_b / "f2.parquet"))
    cfg2 = PipelineConfig(schema_cls=sequences_schema,
                          input_paths=[str(d_a), str(d_b)], out_dir=out,
                          check_unique=False, files_per_shard=1)
    rep2 = ValidationPipeline(cfg2).run()
    assert rep2.shards_skipped == 1
    ids = set(rep2.partition_verdicts)
    assert "f1.parquet" in ids                      # unchanged old id
    assert any(i.endswith("f2.parquet") and i != "f2.parquet"
               for i in ids)                        # new id, old root


def test_generic_path_column_prunes_the_read(tmp_path, sequences_schema,
                                             monkeypatch):
    """The non-fused validator path must pass the validator's column
    projection to read_parquet (an extraneous fat column is never
    decoded) and produce the same violations as the fused path."""
    import numpy as np
    import ray.data

    t = _seq_table([f"doc-{i:012d}" for i in range(50)])
    t = t.append_column(
        "extra_blob", pa.array([b"x" * 1000] * t.num_rows, pa.binary()))
    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "f.parquet"))

    captured = {}
    real = ray.data.read_parquet

    def spy(*args, **kwargs):
        captured["columns"] = kwargs.get("columns")
        return real(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", spy)
    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=d,
                         out_dir=str(tmp_path / "out1"), fused=False,
                         check_unique=False)
    rep = ValidationPipeline(cfg).run()
    monkeypatch.undo()

    assert captured["columns"] is not None
    assert "extra_blob" not in captured["columns"]
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(captured["columns"])

    cfg2 = PipelineConfig(schema_cls=sequences_schema, input_paths=d,
                          out_dir=str(tmp_path / "out2"), fused=True,
                          check_unique=False)
    rep2 = ValidationPipeline(cfg2).run()
    assert rep.violation_counts == rep2.violation_counts
    assert rep.row_count == rep2.row_count == 50


def test_multi_column_uniqueness_single_pass(tmp_path):
    """A schema with several unique columns runs ONE uniqueness pass
    (tagged keys through one bucket exchange) and reports the same
    per-column duplicates as independent passes."""
    import glob

    from pyschema_ray import Integer, List, Record, Text
    from pyschema_ray.sources.synth import VOCAB
    from pyschema_ray.stages.unique import (
        duplicate_keys, stream_uniqueness_violations_multi)

    class TwoUnique(Record):
        doc_id = Text(nullable=False, unique=True)
        alt_id = Integer(size=8, unique=True)
        tokens = List(Integer(size=4), nullable=False)
        n_tok = Integer(size=4)
        source = Text(nullable=False)
        _key_field = "doc_id"

    ids = [f"doc-{i:012d}" for i in range(30)] + ["doc-000000000001"] * 3
    alt = list(range(30)) + [100, 100, 101]
    t = pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "alt_id": pa.array(alt, pa.int64()),
        "tokens": pa.array([[1, 2]] * 33, pa.list_(pa.int32())),
        "n_tok": pa.array([2] * 33, pa.int32()),
        "source": pa.array(["web"] * 33, pa.string()),
    })
    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "f.parquet"))
    files = [os.path.join(d, "f.parquet")]

    out_dirs = {c: str(tmp_path / f"v-{c}") for c in ["doc_id", "alt_id"]}
    counts = stream_uniqueness_violations_multi(files,
                                                ["doc_id", "alt_id"],
                                                out_dirs, num_buckets=8)
    # one violation row per duplicate KEY (the engine contract):
    # doc-...001 (4 instances) and alt 100 (2 instances) are one each
    assert counts == {"doc_id": 1, "alt_id": 1}
    for c, dirpath in out_dirs.items():
        viol_files = glob.glob(os.path.join(dirpath, "*.parquet"))
        rows = pa.concat_tables([pq.read_table(f) for f in viol_files])
        assert rows.num_rows == counts[c]
        assert set(rows["constraint"].to_pylist()) == {f"unique({c})"}

    # pipeline end-to-end with two unique fields uses the same path
    cfg = PipelineConfig(schema_cls=TwoUnique, input_paths=d,
                         out_dir=str(tmp_path / "out"))
    rep = ValidationPipeline(cfg).run()
    assert rep.violation_counts["unique(doc_id)"] == 1
    assert rep.violation_counts["unique(alt_id)"] == 1

    # parity with independent single-column passes
    import ray.data
    ds = ray.data.read_parquet(files)
    solo = {r["doc_id"]: r["dup_count"]
            for r in duplicate_keys(ds, "doc_id", 8).take_all()}
    assert solo == {"doc-000000000001": 4}


def test_pruning_reads_columns_present_in_any_shard_file(tmp_path,
                                                         sequences_schema):
    """A declared column missing from ONE file (that file's schema
    violation) must still be read and validated from the files that
    have it — the pruning projection is the union over the shard's
    files, not file 0's schema."""
    d = str(tmp_path / "in")
    os.makedirs(d)
    full = _seq_table([f"doc-{i:012d}" for i in range(20)])
    # a_missing sorts FIRST so the defective file is file 0
    missing = full.slice(0, 10).drop_columns(["source"])
    pq.write_table(missing, os.path.join(d, "a_missing.parquet"))
    pq.write_table(full, os.path.join(d, "b_full.parquet"))

    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=d,
                         out_dir=str(tmp_path / "out"), fused=False,
                         check_unique=False)
    rep = ValidationPipeline(cfg).run()
    # file 0 flags the missing column; file 1 must NOT (its source
    # column was read and validated)
    assert rep.partition_verdicts["a_missing.parquet"] == "fail"
    assert rep.partition_verdicts["b_full.parquet"] == "pass"
    assert any(k.startswith("schema(source)") or "source" in k
               for k in rep.violation_counts)


def test_on_corrupt_record_survives_truncated_file(tmp_path, synth_corpus,
                                                   sequences_schema):
    """A truncated parquet file must become a corrupt_file violation +
    failed partition verdict under on_corrupt='record' (and still
    abort under the default 'fail')."""
    import shutil

    import pytest

    from pyschema_ray.pipelines.validate import (PipelineConfig,
                                                 ValidationPipeline)

    d = tmp_path / "data"
    d.mkdir()
    paths = sorted(synth_corpus["paths"])
    for p in paths:
        shutil.copy(p, d / os.path.basename(p))
    # truncate one file to half its bytes (kills footer + row groups)
    victim = d / os.path.basename(paths[3])
    raw = victim.read_bytes()
    victim.write_bytes(raw[:len(raw) // 2])

    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=str(d),
                         out_dir=str(tmp_path / "run"), files_per_shard=4,
                         check_unique=False, on_corrupt="record")
    import pyarrow.compute as pc

    rep = ValidationPipeline(cfg).run()
    assert rep.violation_counts.get("corrupt_file") == 1
    vname = os.path.basename(str(victim))
    assert rep.partition_verdicts[vname] == "fail"
    # the other 7 files validated normally (10k rows minus the victim's)
    assert rep.row_count > 0
    viol = rep.violations_table()
    cf = viol.filter(pc.equal(viol["constraint"], "corrupt_file"))
    assert cf.num_rows == 1 and cf["partition_id"][0].as_py() == vname

    with pytest.raises(Exception):
        ValidationPipeline(PipelineConfig(
            schema_cls=sequences_schema, input_paths=str(d),
            out_dir=str(tmp_path / "run2"), files_per_shard=4,
            check_unique=False)).run()
