"""Submittable pipeline driver — the ``ray job submit`` entry point.

    ray job submit --working-dir . -- \
        python -m pyschema_ray.run --config job.json

Re-submission of the SAME config (same ``out_dir``) resumes: shards
already recorded in the checkpoint manifest are skipped (E11).  The
config is a JSON file:

    {
      "schema": "Sequences",             // name in the schema store, OR
      "schema_module": "my_schemas",     // module to import first (registers classes)
      "input": "/data/corpus",           // dir / glob / file list
      "out_dir": "/data/validate_run1",
      "files_per_shard": 16,
      "batch_size": 8192,
      "stats": {"quantile_column": "n_tok", "cardinality_column": "doc_id",
                "histogram_column": "n_tok", "histogram_group": "source"},
      "ref_sets": {"source": ["sources_dim", "source", ["web", "books"]]},
      "baseline_profile": "/data/baseline.json",   // optional drift baseline
      "psi_threshold": 0.25, "kl_threshold": 0.5,
      "concurrency": null                // null = stateless task mode
    }

Exit status: 0 if the run PASSED (no violations, no drift), 1 if it
completed but failed validation, 2 on error.  This module owns its Ray
session (guarded init) — the only library entry point that does.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys


def build_config(cfg: dict):
    from .pipelines.validate import PipelineConfig
    from .schema import schema_store
    from .stages.drift import BaselineProfile
    from .stages.validator import StatsConfig

    if cfg.get("schema_module"):
        importlib.import_module(cfg["schema_module"])
    schema_cls = schema_store.get(cfg["schema"])
    stats = StatsConfig(**cfg["stats"]) if cfg.get("stats") else None
    baseline = (BaselineProfile.load(cfg["baseline_profile"])
                if cfg.get("baseline_profile") else None)
    ref_sets = {col: tuple(v) for col, v in cfg.get("ref_sets", {}).items()}
    # dim tables for schema-declared references=(dim, col): either a
    # value list inline or a path to a parquet file
    dim_tables = {}
    for dim, spec in cfg.get("dim_tables", {}).items():
        if isinstance(spec, str):
            import pyarrow.parquet as pq

            dim_tables[dim] = pq.read_table(spec)
        else:
            dim_tables[dim] = list(spec)
    return PipelineConfig(
        dim_tables=dim_tables,
        schema_cls=schema_cls,
        input_paths=cfg["input"],
        out_dir=cfg["out_dir"],
        files_per_shard=cfg.get("files_per_shard", 16),
        batch_size=cfg.get("batch_size", 8192),
        concurrency=cfg.get("concurrency"),
        stats=stats,
        ref_sets=ref_sets,
        baseline_profile=baseline,
        psi_threshold=cfg.get("psi_threshold", 0.25),
        kl_threshold=cfg.get("kl_threshold", 0.5),
        check_unique=cfg.get("check_unique", True),
        fused=cfg.get("fused", True),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m pyschema_ray.run")
    ap.add_argument("--config", required=True, help="JSON config path")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone local runs; under "
                         "`ray job submit` the cluster is already up")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = json.load(f)

    import ray

    if not ray.is_initialized():  # under `ray job submit`, it already is
        init_kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    try:
        from .pipelines.validate import ValidationPipeline

        report = ValidationPipeline(build_config(cfg)).run()
        print(json.dumps({
            "rows": report.row_count,
            "passed": report.passed,
            "shards": report.shard_count,
            "shards_skipped_by_resume": report.shards_skipped,
            "violation_counts": report.violation_counts,
            "duplicate_keys": report.duplicate_count,
            "drift": report.drift,
            "stats": report.global_stats,
            "wall_time_s": round(report.wall_time_s, 2),
            "out_dir": report.out_dir,
        }, default=str))
        return 0 if report.passed else 1
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
