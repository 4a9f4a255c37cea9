"""Corpus-cleaning writer: violating rows removed, clean rows pass
through byte-identical (the token round-trip invariant), resume skips
already-cleaned files."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyschema_ray.pipelines.clean import write_validated
from pyschema_ray.pipelines.validate import (PipelineConfig,
                                             ValidationPipeline)
from pyschema_ray.sources.synth import sources_dim_table
from tests.test_pipeline import oracle_validate


def test_write_validated_matches_oracle(synth_corpus, sequences_schema,
                                        tmp_path):
    out = str(tmp_path / "clean")
    ref_sets = {"source": ("sources_dim", "source",
                           sources_dim_table()["source"].to_pylist())}
    res = write_validated(synth_corpus["paths"], out, sequences_schema,
                          ref_sets=ref_sets)
    assert res["rows_in"] == 10_000
    assert res["files"] == len(synth_corpus["paths"])

    orig = pa.concat_tables(pq.read_table(p) for p in synth_corpus["paths"])
    oracle = oracle_validate(orig)
    bad_keys = {k for k, c in oracle if c != "unique(doc_id)"}
    # every row with any row-level violation is gone; nulls too
    expect_kept = 0
    for r in orig.to_pylist():
        key = r["doc_id"] if r["doc_id"] is not None else "<null>"
        if key not in bad_keys:
            expect_kept += 1
    # "<null>" keys: all null-id rows are violating -> removed
    assert res["rows_kept"] == expect_kept

    cleaned = pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(out, "*.parquet"))))
    assert cleaned.num_rows == expect_kept
    kept_keys = set(cleaned["doc_id"].to_pylist())
    assert not (kept_keys & bad_keys)

    # round-trip invariant: kept rows' tokens identical to input
    orig_by_key = {}
    for r in orig.to_pylist():
        if r["doc_id"] is not None:
            orig_by_key.setdefault(r["doc_id"], r)
    for r in cleaned.slice(0, 500).to_pylist():
        assert r["tokens"] == orig_by_key[r["doc_id"]]["tokens"]

    # cleaned corpus re-validates clean (minus uniqueness dups)
    cfg = PipelineConfig(schema_cls=sequences_schema, input_paths=out,
                         out_dir=str(tmp_path / "revalidate"),
                         ref_sets=ref_sets, check_unique=False)
    rep = ValidationPipeline(cfg).run()
    assert rep.passed, rep.violation_counts


def test_write_validated_with_drop_keys_and_resume(synth_corpus,
                                                   sequences_schema,
                                                   tmp_path):
    out = str(tmp_path / "clean2")
    drop = ["doc-000000000123", "doc-000000000456"]
    res1 = write_validated(synth_corpus["paths"][:2], out, sequences_schema,
                           drop_keys=drop)
    cleaned = pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(out, "*.parquet"))))
    got = set(cleaned["doc_id"].to_pylist())
    assert not (got & set(drop))

    # resume: second call skips existing outputs (rows_in not re-counted)
    res2 = write_validated(synth_corpus["paths"][:2], out, sequences_schema,
                           drop_keys=drop)
    assert res2["rows_kept"] == res1["rows_kept"]
    assert res2["rows_in"] == 0  # everything skipped
