"""Metadata-only planner ops (stages/audit.py) cross-checked against
DuckDB's independent parquet footer reader (parquet_metadata()):
row-group pruning report and deterministic compaction plan, over
synthetic MULTI-row-group multi-file layouts."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyschema_ray.stages.audit import (compaction_assignments,
                                       compaction_plan,
                                       rowgroup_pruning_report)


def _write_multirg(tmp_path, name, n_rows, rg_size, base=0):
    rng = np.random.default_rng(base + 7)
    t = pa.table({
        "x": pa.array(np.arange(base, base + n_rows), pa.int64()),
        "pad": pa.array(rng.integers(0, 1 << 40, n_rows), pa.int64()),
    })
    p = tmp_path / name
    pq.write_table(t, p, row_group_size=rg_size)
    return str(p)


def test_pruning_report_vs_duckdb_metadata(tmp_path):
    p = _write_multirg(tmp_path, "a.parquet", 1000, 100)
    got = rowgroup_pruning_report([p], "x", lo=350.0, hi=549.0) \
        .to_pandas()
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT row_group_id,
               CAST(stats_min_value AS DOUBLE) AS smin,
               CAST(stats_max_value AS DOUBLE) AS smax,
               row_group_num_rows
          FROM parquet_metadata('{p}')
         WHERE path_in_schema = 'x' ORDER BY row_group_id""").df()
    assert got["row_group"].tolist() == want["row_group_id"].tolist()
    assert got["stat_min"].tolist() == want["smin"].tolist()
    assert got["stat_max"].tolist() == want["smax"].tolist()
    assert got["num_rows"].tolist() == \
        want["row_group_num_rows"].tolist()
    # predicate [350, 549] touches row groups 3..5 only
    assert got["prunable"].tolist() == [
        not (350 <= mx and mn <= 549)
        for mn, mx in zip(got["stat_min"], got["stat_max"])]
    assert got["prunable"].sum() == 10 - 3
    assert got["has_stats"].all()


def test_pruning_unbounded_sides(tmp_path):
    p = _write_multirg(tmp_path, "a.parquet", 400, 100)
    up = rowgroup_pruning_report([p], "x", hi=99.0).to_pandas()
    assert up["prunable"].tolist() == [False, True, True, True]
    lo = rowgroup_pruning_report([p], "x", lo=300.0).to_pandas()
    assert lo["prunable"].tolist() == [True, True, True, False]
    none = rowgroup_pruning_report([p], "x").to_pandas()
    assert not none["prunable"].any()


def test_compaction_assignment_matches_duckdb_cumsum(tmp_path):
    paths = [_write_multirg(tmp_path, f"f{i}.parquet", 700, 150,
                            base=i * 1000) for i in range(3)]
    target = 6000
    got = compaction_assignments(paths, target).to_pandas()
    con = duckdb.connect()
    want = con.execute(f"""
        WITH rg AS (
            SELECT regexp_extract(file_name, '[^/]+$') AS file,
                   row_group_id,
                   min(row_group_num_rows) AS num_rows,
                   sum(total_compressed_size) AS bytes
              FROM parquet_metadata(
                   ['{paths[0]}', '{paths[1]}', '{paths[2]}'])
             GROUP BY 1, 2),
        ordered AS (
            SELECT *, sum(bytes) OVER (
                       ORDER BY file, row_group_id
                       ROWS UNBOUNDED PRECEDING) - bytes AS cumb
              FROM rg)
        SELECT file, row_group_id, num_rows, bytes,
               CAST(cumb // {target} AS BIGINT) AS bucket
          FROM ordered ORDER BY file, row_group_id""").df()
    assert got["file"].tolist() == want["file"].tolist()
    assert got["row_group"].tolist() == want["row_group_id"].tolist()
    assert got["bytes"].tolist() == want["bytes"].tolist()
    assert got["bucket"].tolist() == want["bucket"].tolist()


def test_compaction_plan_conserves_rows_and_bytes(tmp_path):
    paths = [_write_multirg(tmp_path, f"f{i}.parquet", 500, 100,
                            base=i * 1000) for i in range(2)]
    a = compaction_assignments(paths, 4096).to_pandas()
    plan = compaction_plan(paths, 4096).to_pandas()
    assert plan["n_rows"].sum() == 1000
    assert plan["bytes"].sum() == a["bytes"].sum()
    assert plan["n_rowgroups"].sum() == len(a)
    # buckets are contiguous in input order and every bucket except
    # possibly the last reaches the target once its straddler lands
    assert plan["bucket"].tolist() == \
        sorted(plan["bucket"].unique().tolist())
    order_buckets = a["bucket"].tolist()
    assert order_buckets == sorted(order_buckets)


def test_pruning_report_absent_stats_not_prunable(tmp_path):
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    p = tmp_path / "nostats.parquet"
    pq.write_table(t, p, write_statistics=False)
    got = rowgroup_pruning_report([str(p)], "x", lo=100.0).to_pandas()
    assert got["has_stats"].tolist() == [False]
    assert got["prunable"].tolist() == [False]
