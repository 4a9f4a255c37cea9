#!/usr/bin/env python
"""Benchmark driver.  Prints ONE JSON line with headline numbers.

Default mode: run the headline pipelines with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)``:

* headline: the full validation pipeline (constraints + sketches +
  uniqueness shuffle + referential + drift) over a deterministic
  synthetic tokenized-sequence corpus (FIXTURES.md F1 shape, cached
  under /tmp) — the workload the north rule names.
* per-query timings for representative ``__ray_entry__.queries()``
  entries over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

``--scaling``: run the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + scaling efficiency (the sandbox substitution for the
N-node vs 4N-node cluster criterion); results also written to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "400000"))
# scaling runs need a compute-dominated input so the fixed per-pipeline
# costs (~3-4 s of shuffle/driver coordination) don't mask parallel
# speedup; ~16M rows ≈ 3.2B tokens ≈ 7.7 GB parquet
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "16000000"))
BENCH_SEED = 42
BENCH_FILES = 32
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERY_SUBSET = [
    "violations_documents", "duplicate_user_ids", "pricing_summary",
    "events_histogram", "dedup_exact", "token_counts", "ann_topk",
    "ndv_user_id_hll", "value_quantiles_tdigest", "drift_events_self",
    "minhash_near_dup_pairs", "simhash",
]


def bench_data_dir(rows: int) -> str:
    return f"/tmp/pyschema_ray_bench/sequences_{rows}_{BENCH_SEED}"


def ensure_corpus(rows: int) -> str:
    """Deterministic corpus, generated once and reused (numpy+pyarrow,
    no Ray needed; multiprocessing for bench-scale sizes)."""
    d = bench_data_dir(rows)
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        if rows > 1_000_000:
            from pyschema_ray.sources.synth import generate_sequences_sharded
            generate_sequences_sharded(rows, seed=BENCH_SEED, out_dir=d,
                                       n_files=BENCH_FILES, processes=8)
        else:
            from pyschema_ray.sources.synth import generate_sequences
            generate_sequences(rows, seed=BENCH_SEED, out_dir=d,
                               n_files=BENCH_FILES)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def run_headline(num_cpus: int, rows: int) -> dict:
    """Full validation pipeline; returns {'sec', 'rows', 'rows_per_sec'}."""
    import shutil
    import tempfile

    import ray

    data_dir = ensure_corpus(rows)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pyschema_ray import Integer, List, Record, Text
    from pyschema_ray.pipelines.validate import (PipelineConfig,
                                                 ValidationPipeline)
    from pyschema_ray.sources.synth import VOCAB, sources_dim_table
    from pyschema_ray.stages.validator import StatsConfig

    class Sequences(Record):
        doc_id = Text(nullable=False, regex=r"^doc-\d{12}$", unique=True)
        tokens = List(Integer(size=4), nullable=False,
                      element_min=0, element_max=VOCAB)
        n_tok = Integer(size=4, min=1, max=4096,
                        equals_length_of="tokens")
        source = Text(nullable=False)
        _key_field = "doc_id"

    # warm up the Ray Data session so the timed run measures pipeline
    # throughput, not one-time session setup (startup excluded per
    # BASELINE.md measurement protocol).  The warmup must be a REAL
    # parquet pipeline wide enough to start every worker and trigger
    # the pyarrow.parquet imports in each.
    import ray.data

    @ray.remote
    def _hold():
        import pyarrow.parquet  # noqa: F401
        time.sleep(0.5)
        return 1

    ray.get([_hold.remote() for _ in range(num_cpus)])
    sample = os.path.join(data_dir, sorted(os.listdir(data_dir))[0])
    warm = ray.data.read_parquet(sample).map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow")
    warm.count()

    out_dir = tempfile.mkdtemp(prefix="pyschema_ray_bench_run_")
    try:
        cfg = PipelineConfig(
            schema_cls=Sequences,
            input_paths=data_dir,
            out_dir=out_dir,
            files_per_shard=BENCH_FILES,  # one shard: pure streaming run
            batch_size=8192,
            concurrency=(1, num_cpus),
            stats=StatsConfig(quantile_column="n_tok",
                              cardinality_column="doc_id",
                              histogram_column="n_tok",
                              histogram_group="source",
                              minmax_columns=["n_tok"]),
            ref_sets={"source": ("sources_dim", "source",
                                 sources_dim_table()["source"].to_pylist())},
        )
        t0 = time.perf_counter()
        rep = ValidationPipeline(cfg).run()
        sec = time.perf_counter() - t0
        assert rep.row_count == rows, (rep.row_count, rows)
        return {"sec": sec, "rows": rows, "rows_per_sec": rows / sec,
                "violations": int(sum(rep.violation_counts.values()))}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in QUERY_SUBSET:
        t0 = time.perf_counter()
        qs[name](sf_dir)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def scaling_mode(rows: int) -> dict:
    """Fresh-process runs at 8 and 32 CPUs on the same input."""
    ensure_corpus(rows)  # generate once so both runs read identical files
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only",
             "--cpus", str(cpus), "--rows", str(rows)],
            capture_output=True, text=True, timeout=3600, check=False)
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
    eff = (results[32]["rows_per_sec"] / results[8]["rows_per_sec"]) / (32 / 8)
    summary = {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 4),
        "unit": "ratio",
        "rows": rows,
        "throughput_8cpu_rows_per_sec": round(results[8]["rows_per_sec"], 1),
        "throughput_32cpu_rows_per_sec": round(results[32]["rows_per_sec"], 1),
        "sec_8cpu": round(results[8]["sec"], 2),
        "sec_32cpu": round(results[32]["sec"], 2),
    }
    _write_scaling_report(summary)
    return summary


def _write_scaling_report(s: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH results — scaling (sandbox substitution for N vs 4N nodes)

Same input ({s['rows']:,} synthetic tokenized sequences, seed=42,
{BENCH_FILES} parquet files), identical code, two fresh processes.

| metric | 8 CPUs | 32 CPUs | efficiency |
|---|---|---|---|
| full validation pipeline rows/sec | {s['throughput_8cpu_rows_per_sec']:,} | {s['throughput_32cpu_rows_per_sec']:,} | {s['value']:.3f} |
| wall time (s) | {s['sec_8cpu']} | {s['sec_32cpu']} | |

Efficiency = (rows/sec@32 / rows/sec@8) / 4.  Target >= 0.8.

Config: batch_size=8192, validator actor pool concurrency=(1, num_cpus),
ray 2.49.2, pyarrow 16.1.0.  Pipeline = schema conformance + row
constraints + broadcast referential + t-digest/HLL/histogram partials +
doc_id uniqueness shuffle + drift-ready histogram merge + manifest.
""")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--skip-queries", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(scaling_mode(args.rows or SCALING_ROWS)))
        return
    if args.rows is None:
        args.rows = BENCH_ROWS

    if args.headline_only:
        import ray
        res = run_headline(args.cpus, args.rows)
        print(json.dumps(res))
        ray.shutdown()
        return

    import ray
    head = run_headline(args.cpus, args.rows)
    queries = {} if args.skip_queries else run_queries(SF_DIR)
    ray.shutdown()
    print(json.dumps({
        "metric": "full_validation_pipeline_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": args.cpus,
        "rows": head["rows"],
        "rows_per_sec": round(head["rows_per_sec"], 1),
        "violations": head["violations"],
    }))


if __name__ == "__main__":
    main()
