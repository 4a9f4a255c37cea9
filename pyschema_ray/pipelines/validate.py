"""The flagship validation pipeline (SURVEY.md §3.2).

Lifecycle per run:

1. compile the declared schema -> (pa.Schema, [Constraint])
2. discover input files; group into shards (the resume unit)
3. drop shards already recorded in the checkpoint manifest
4. per remaining shard: ``read_parquet(shard_files,
   include_paths=True)`` -> one actor-pool ``map_batches`` pass
   (CompiledValidator: schema conformance + row constraints + broadcast
   referential + stats/drift partials, zero-copy Arrow) -> the tiny
   tagged result stream is pulled to the driver, split into violation
   rows (written as per-shard parquet, write-then-rename) and stats
   partials (merged per partition) -> shard manifest record committed
   atomically
5. global passes: exact uniqueness via the doc_id hash shuffle (key
   column only), drift scoring of merged histograms vs the baseline
6. summary verdicts written; the whole run is idempotent — re-running
   after a crash skips completed shards and re-derives global results.

Scale notes: the full input is only ever streamed, never materialized;
per-shard driver traffic is O(defect rate + batches), and the only
all-to-all op is the uniqueness groupby on the projected key column.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages import drift as drift_mod
from ..stages import stats as stats_mod
from ..stages.unique import (stream_uniqueness_violations,
                             stream_uniqueness_violations_multi)
from ..stages.validator import (CompiledValidator, FileValidator,
                                StatsConfig, VIOLATION_SCHEMA)
from ..state.manifest import Manifest, ShardRecord, schema_hash


@dataclass
class PipelineConfig:
    schema_cls: type
    input_paths: list[str] | str = ""
    out_dir: str = "/tmp/pyschema_ray_run"
    files_per_shard: int = 16
    batch_size: int | None = 8192
    concurrency: int | tuple | None = None  # actor pool size for the validator
    stats: StatsConfig | None = None
    ref_sets: dict = field(default_factory=dict)
    extra_constraints: list = field(default_factory=list)
    baseline_profile: "drift_mod.BaselineProfile | None" = None
    psi_threshold: float = 0.25
    kl_threshold: float = 0.5
    check_unique: bool = True
    #: dimension tables for schema-declared ``references=(dim, col)``
    #: fields: {dim_name: pyarrow.Table | list_of_values}
    dim_tables: dict = field(default_factory=dict)
    quantiles: tuple = (0.5, 0.9, 0.99)
    #: fuse parquet read into the validate/uniqueness tasks (one task
    #: per file; the decoded data never transits the object store).
    #: Disable for non-file inputs or when downstream consumes blocks.
    fused: bool = True
    #: write violation rows from Ray workers (spillable) instead of
    #: pulling them to the driver — for corpora whose violation volume
    #: is itself large (SCALE.md §7)
    stream_violations: bool = False
    #: per-shard digest count above which the final sketch merge runs
    #: as a Ray-task tree reduce instead of a driver loop
    tree_merge_threshold: int = 256
    #: "fail" (default) aborts on an unreadable/corrupt input file;
    #: "record" turns it into a corrupt_file violation + failed
    #: partition verdict and the run continues (fused path)
    on_corrupt: str = "fail"


@dataclass
class ValidationReport:
    out_dir: str
    row_count: int = 0
    shard_count: int = 0
    shards_skipped: int = 0
    violation_counts: dict = field(default_factory=dict)
    warning_counts: dict = field(default_factory=dict)
    partition_verdicts: dict = field(default_factory=dict)
    partition_violations: dict = field(default_factory=dict)
    partition_drift: dict = field(default_factory=dict)
    global_stats: dict = field(default_factory=dict)
    drift: dict | None = None
    duplicate_count: int = 0
    passed: bool = True
    wall_time_s: float = 0.0

    def worst_partitions(self, k: int = 10) -> list[tuple[str, int]]:
        """E13: top-k partitions by violation count (descending), for
        reporting / triage.  Per-partition counts are manifest-derived
        (tiny), so this is a driver-side sort."""
        return sorted(self.partition_violations.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]

    def violations_dataset(self):
        import ray.data
        vdir = os.path.join(self.out_dir, "violations")
        files = sorted(_glob.glob(os.path.join(vdir, "**", "*.parquet"),
                                  recursive=True))
        if not files:
            import ray
            return ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())
        return ray.data.read_parquet(files)

    def violations_table(self) -> pa.Table:
        vdir = os.path.join(self.out_dir, "violations")
        files = sorted(_glob.glob(os.path.join(vdir, "**", "*.parquet"),
                                  recursive=True))
        if not files:
            return VIOLATION_SCHEMA.empty_table()
        return pa.concat_tables([
            pq.read_table(f) for f in files]).cast(VIOLATION_SCHEMA)


def discover_files(input_paths) -> list[str]:
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    out: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(os.path.join(p, "*.parquet"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(_glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
    return out


class ValidationPipeline:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.manifest = Manifest(cfg.out_dir)
        self.schema_hash = schema_hash(cfg.schema_cls)
        # warning-severity constraint names (constraints.as_warning):
        # their violations are recorded but never flip a verdict
        self._warning_names = {
            c.name
            for c in (list(cfg.schema_cls.compiled_constraints())
                      + list(cfg.extra_constraints))
            if getattr(c, "severity", "error") == "warning"}
        os.makedirs(os.path.join(cfg.out_dir, "violations"), exist_ok=True)
        # schema-declared referential fields (Field(references=...)) must
        # resolve to a broadcast value set — silently ignoring them would
        # skip a declared check
        for col, (dim, dim_col) in cfg.schema_cls.referential_fields().items():
            if col in cfg.ref_sets:
                continue
            if dim not in cfg.dim_tables:
                raise ValueError(
                    f"field {col!r} declares references=({dim!r}, "
                    f"{dim_col!r}) but no ref_sets[{col!r}] entry and no "
                    f"dim_tables[{dim!r}] table was provided")
            dim_obj = cfg.dim_tables[dim]
            values = (dim_obj[dim_col].to_pylist()
                      if isinstance(dim_obj, pa.Table) else list(dim_obj))
            cfg.ref_sets[col] = (dim, dim_col, values)

    # ------------------------------------------------------------------
    def run(self) -> ValidationReport:
        import ray.data

        cfg = self.cfg
        t0 = time.perf_counter()
        files = discover_files(cfg.input_paths)
        if not files:
            raise ValueError(f"no input files under {cfg.input_paths!r}")
        # lineage ids are relative to the common root of ALL inputs.
        # The root is PERSISTED in the manifest on the first run and
        # reused on resume: appending new input directories (which the
        # per-shard file-set check alone does not refuse when old
        # shards still align) must not move the root, or resumed and
        # fresh shards would record inconsistent partition ids.
        recorded = self.manifest.get_global("lineage-root")
        if recorded is not None:
            self._root = recorded["root"]
        else:
            self._root = _lineage_root(files)
            self.manifest.commit_global("lineage-root",
                                        {"root": self._root})
        shards = [files[i:i + cfg.files_per_shard]
                  for i in range(0, len(files), cfg.files_per_shard)]

        completed = self.manifest.completed_shards()
        for sid, rec in completed.items():
            _normalize_legacy_lineage_ids(rec, self._root)
            if rec.get("schema_hash") != self.schema_hash:
                # resume stays STRICT (any weaker rule can silently
                # change verdicts on already-validated shards); the
                # error carries the Avro-style compatibility report so
                # the user can decide between re-validating and
                # migrating
                detail = ""
                stored = self.manifest.get_global("schema-fingerprint")
                if stored is not None:
                    from ..evolution import check_compatibility
                    detail = "\n" + check_compatibility(
                        stored["fingerprint"],
                        cfg.schema_cls.fingerprint()).summary()
                raise RuntimeError(
                    f"manifest shard {sid} was produced with a different "
                    f"schema ({rec.get('schema_hash')} != {self.schema_hash}); "
                    "refusing to resume — use a fresh out_dir or "
                    "re-validate" + detail)
            # the shard id is positional over the sorted file list: if the
            # input set changed, resuming would silently skip the WRONG
            # files — refuse instead
            if sid < len(shards) and rec.get("files") != shards[sid]:
                raise RuntimeError(
                    f"manifest shard {sid} covers different input files "
                    "than the current discovery (input set changed?); "
                    "refusing to resume — use a fresh out_dir")
            if sid >= len(shards):
                raise RuntimeError(
                    f"manifest has shard {sid} beyond the current input's "
                    f"{len(shards)} shards; refusing to resume")

        # persist the full schema fingerprint once the shard-hash checks
        # PASS: the hash alone can refuse a later resume but cannot
        # explain it after the old Record class is gone from code.
        # Committing before the checks would record the NEW schema as
        # the baseline on a legacy (pre-fingerprint) manifest whose
        # shards used a different schema — the compat report would then
        # diff the new schema against itself.
        if self.manifest.get_global("schema-fingerprint") is None:
            self.manifest.commit_global(
                "schema-fingerprint",
                {"fingerprint": cfg.schema_cls.fingerprint()})

        report = ValidationReport(out_dir=cfg.out_dir, shard_count=len(shards),
                                  shards_skipped=len(completed))

        # launch the (independent) global uniqueness pass concurrently
        # with shard validation: it reads only the key column, so its
        # shuffle fills CPUs during the validate pipeline's driver-side
        # gaps instead of serializing after them
        uniq_thread = None
        uniq_result: dict = {}
        # uniqueness targets: every Field(unique=True); default to the
        # key field when none are declared (legacy behaviour)
        uniq_cols = (cfg.schema_cls.unique_fields()
                     or [cfg.schema_cls.key_field()]) if cfg.check_unique             else []
        uniq_pending = [c for c in uniq_cols
                        if self.manifest.get_global(f"unique-{c}") is None]
        if uniq_pending:
            import threading

            def _uniq():
                try:
                    # duplicate keys stream to the violations sink from
                    # workers (never pulled to the driver) — only the
                    # counts come back
                    vdir = {col: os.path.join(cfg.out_dir, "violations",
                                              f"global-unique-{col}")
                            for col in uniq_pending}
                    if len(uniq_pending) > 1:
                        # several unique columns: ONE pass over the
                        # input carries every column's keys (tagged)
                        # through one bucket exchange
                        src = files if cfg.fused else ray.data \
                            .read_parquet(files, columns=uniq_pending)
                        uniq_result.update(
                            stream_uniqueness_violations_multi(
                                src, uniq_pending, vdir))
                    else:
                        for col in uniq_pending:
                            src = files if cfg.fused else ray.data \
                                .read_parquet(files, columns=[col])
                            uniq_result[col] = \
                                stream_uniqueness_violations(
                                    src, col, vdir[col])
                except Exception as e:  # noqa: BLE001
                    uniq_result["error"] = e

            uniq_thread = threading.Thread(target=_uniq, daemon=True)
            uniq_thread.start()

        for sid, shard_files in enumerate(shards):
            if sid in completed:
                continue
            rec = self._run_shard(sid, shard_files)
            completed[sid] = json.loads(rec.to_json())

        # ---- assemble from manifest (covers resumed + fresh shards) ----
        from ..sketches import GroupedHistogram, HyperLogLog, TDigest

        merged = stats_mod.PartitionStats(partition_id="<global>")
        hist_hexes, td_hexes, hll_hexes = [], [], []
        for sid in sorted(completed):
            rec = completed[sid]
            report.row_count += rec["row_count"]
            for k, v in rec["violation_counts"].items():
                report.violation_counts[k] = report.violation_counts.get(k, 0) + v
            for pid, d in rec.get("partition_digests", {}).items():
                verdict = d.get("verdict", "pass")
                if cfg.baseline_profile is not None and d.get("hist_hex"):
                    ph = GroupedHistogram.from_bytes(
                        bytes.fromhex(d["hist_hex"]))
                    pd_drift = drift_mod.score_drift(
                        ph, cfg.baseline_profile,
                        cfg.psi_threshold, cfg.kl_threshold)
                    report.partition_drift[pid] = {
                        "psi": pd_drift["overall_psi"],
                        "kl": pd_drift["overall_kl"],
                        "passed": pd_drift["passed"],
                    }
                    if not pd_drift["passed"]:
                        verdict = "fail"
                report.partition_verdicts[pid] = verdict
                report.partition_violations[pid] = sum(
                    d.get("violation_counts", {}).values())
            sd = rec.get("stats_digest", {})
            if sd.get("hist_hex"):
                hist_hexes.append(sd["hist_hex"])
            if sd.get("tdigest_hex"):
                td_hexes.append(sd["tdigest_hex"])
            if sd.get("hll_hex"):
                hll_hexes.append(sd["hll_hex"])
        # per-shard digests merge associatively: a driver loop below the
        # threshold, a two-level Ray-task tree reduce above it (at 10^6
        # files / 10^5 shards the flat unpickle loop would stall the
        # driver — SCALE.md §1)
        merged_hist = stats_mod.tree_merge_hex(
            hist_hexes, GroupedHistogram, cfg.tree_merge_threshold)
        merged.tdigest = stats_mod.tree_merge_hex(
            td_hexes, TDigest, cfg.tree_merge_threshold)
        merged.hll = stats_mod.tree_merge_hex(
            hll_hexes, HyperLogLog, cfg.tree_merge_threshold)

        report.global_stats = {
            "row_count": report.row_count,
            "violation_counts": dict(report.violation_counts),
        }
        if merged.tdigest is not None:
            report.global_stats["quantiles"] = {
                f"p{int(q * 100)}": merged.tdigest.quantile(q)
                for q in cfg.quantiles}
        if merged.hll is not None:
            report.global_stats["ndv_estimate"] = merged.hll.estimate()

        # ---- global uniqueness (E6), one pass per declared column ----
        if uniq_thread is not None:
            uniq_thread.join()
            if "error" in uniq_result:
                raise uniq_result["error"]
        for col in uniq_cols:
            uniq = self.manifest.get_global(f"unique-{col}")
            if uniq is None:
                uniq = {"duplicate_keys": uniq_result[col],
                        "constraint": f"unique({col})"}
                self.manifest.commit_global(f"unique-{col}", uniq)
            report.duplicate_count += uniq["duplicate_keys"]
            if uniq["duplicate_keys"]:
                report.violation_counts[uniq["constraint"]] = \
                    report.violation_counts.get(uniq["constraint"], 0) \
                    + uniq["duplicate_keys"]

        # ---- drift (E8) ----
        if cfg.baseline_profile is not None and merged_hist is not None:
            report.drift = drift_mod.score_drift(
                merged_hist, cfg.baseline_profile,
                cfg.psi_threshold, cfg.kl_threshold)

        report.warning_counts = {
            k: v for k, v in report.violation_counts.items()
            if k in self._warning_names}
        report.passed = (not self._error_counts(report.violation_counts)
                         and (report.drift is None or report.drift["passed"]))
        report.wall_time_s = time.perf_counter() - t0
        self.manifest.commit_global("summary", {
            "row_count": report.row_count,
            "violation_counts": report.violation_counts,
            "passed": report.passed,
            "drift": report.drift,
            "stats": report.global_stats,
            "wall_time_s": report.wall_time_s,
        })
        return report

    # ------------------------------------------------------------------
    def _error_counts(self, counts: dict) -> dict:
        """Violation counts minus warning-severity names — the set a
        verdict is computed from."""
        return {k: v for k, v in counts.items()
                if k not in self._warning_names}

    # ------------------------------------------------------------------
    def _run_shard(self, sid: int, shard_files: list[str]) -> ShardRecord:
        import ray
        import ray.data

        cfg = self.cfg
        t0 = time.perf_counter()
        root = getattr(self, "_root", None) or _lineage_root(shard_files)
        ctor = dict(
            schema_cls=cfg.schema_cls,
            stats=cfg.stats,
            ref_sets=cfg.ref_sets,
            extra_constraints=cfg.extra_constraints,
            baseline_profile=cfg.baseline_profile,
        )
        if cfg.fused:
            # fused read+validate: tasks stream row groups through the
            # validator locally and ship ONLY the tiny tagged output —
            # the decoded corpus never transits the object store (see
            # FileValidator docstring).  Big files are split into
            # row-group chunks so tasks pack tightly onto cores
            # (~4 tasks per core per shard) instead of leaving a
            # whole-file straggler tail.
            fctor = dict(batch_rows=cfg.batch_size or 8192,
                         on_corrupt=cfg.on_corrupt, **ctor)
            cpus = int(ray.cluster_resources().get("CPU", 4))
            per_file = max(1, (cpus * 4) // max(1, len(shard_files)))
            items = []
            for f in shard_files:
                if per_file <= 1:
                    items.append({"path": f})
                    continue
                try:
                    n_rg = pq.ParquetFile(f).metadata.num_row_groups
                except Exception:  # noqa: BLE001 — planning probe
                    if cfg.on_corrupt != "record":
                        raise
                    # unreadable at planning time: one whole-file item;
                    # the FileValidator task records the corruption
                    items.append({"path": f})
                    continue
                chunks = min(per_file, max(1, n_rg))
                bounds = [round(c * n_rg / chunks)
                          for c in range(chunks + 1)]
                for c in range(chunks):
                    if bounds[c] < bounds[c + 1]:
                        items.append({"path": f, "rg_start": bounds[c],
                                      "rg_end": bounds[c + 1]})
            ds = ray.data.from_items(items)
            kwargs = dict(batch_format="pyarrow", batch_size=1)
            if cfg.concurrency is not None or cfg.baseline_profile is not None:
                kwargs["concurrency"] = cfg.concurrency or \
                    (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
                tagged = ds.map_batches(FileValidator,
                                        fn_constructor_kwargs=fctor, **kwargs)
            else:
                tagged = ds.map_batches(FileValidator(**fctor), **kwargs)
        else:
            # generic Dataset path (non-file sources, or when downstream
            # stages also consume the decoded blocks).  Column-prune the
            # read with the SAME projection the fused path computes
            # (CompiledValidator.read_columns) — without it a 2-column
            # schema over a wide table decodes every column.  Pass
            # ``columns=`` only when it actually prunes: an explicit
            # full-width column list measurably slows the parquet read.
            read_kwargs: dict = {}
            # compile ONCE; the same instance serves as the stateless
            # mapper below (the actor branch re-constructs per actor
            # anyway)
            compiled = CompiledValidator(**ctor)
            need = compiled.read_columns()
            if need is not None:
                # available = UNION over the shard's files: a column
                # missing from one file (that file's schema violation)
                # must still be READ from the files that have it
                avail: set = set()
                for f in shard_files:
                    avail |= set(pq.read_schema(f).names)
                use = [c for c in need if c in avail]
                if use and set(use) < avail:
                    read_kwargs["columns"] = use
            ds = ray.data.read_parquet(shard_files, include_paths=True,
                                       **read_kwargs)
            kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
            if cfg.batch_size is not None:
                kwargs["batch_size"] = cfg.batch_size
            if cfg.concurrency is not None or cfg.baseline_profile is not None:
                # stateful mode: actor pool (e.g. drift baseline loaded
                # once per actor)
                kwargs["concurrency"] = cfg.concurrency or \
                    (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
                tagged = ds.map_batches(CompiledValidator,
                                        fn_constructor_kwargs=ctor, **kwargs)
            else:
                # stateless mode: the instance compiled above for the
                # projection ships as the (plasma-cached) task closure
                tagged = ds.map_batches(compiled, **kwargs)

        if cfg.stream_violations:
            # heavy-violation mode (SCALE.md §7): violations are written
            # by Ray workers directly (object store may spill, driver
            # never holds them); only the O(files) stats rows are pulled
            mat = tagged.materialize()

            def viol_batch(t: pa.Table) -> pa.Table:
                v = t.filter(pc.equal(t["kind"], "violation")) \
                     .select(["key", "partition_id", "constraint",
                              "detail"])
                return _strip_path_prefix(v, root)

            vdir = os.path.join(cfg.out_dir, "violations",
                                f"shard-{sid:05d}")
            tmp_dir = vdir + ".tmp"
            if os.path.exists(tmp_dir):
                import shutil
                shutil.rmtree(tmp_dir)
            mat.map_batches(viol_batch, batch_format="pyarrow") \
               .write_parquet(tmp_dir)
            if os.path.exists(vdir):
                import shutil
                shutil.rmtree(vdir)
            os.rename(tmp_dir, vdir)
            stats_tbl = pa.concat_tables(
                list(mat.map_batches(
                    lambda t: t.filter(pc.equal(t["kind"], "stats"))
                               .select(["partition_id", "blob",
                                        "row_count"]),
                    batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow", batch_size=None))
                or [pa.table({"partition_id": pa.array([], pa.string()),
                              "blob": pa.array([], pa.binary()),
                              "row_count": pa.array([], pa.int64())})])
        else:
            # tagged stream is tiny (violations + 1 stats row per file);
            # pull to the driver
            batches = list(tagged.iter_batches(batch_format="pyarrow",
                                               batch_size=None))
            result = (pa.concat_tables(batches) if batches
                      else _empty_result_table())

            viol = result.filter(pc.equal(result["kind"], "violation")) \
                         .select(["key", "partition_id", "constraint",
                                  "detail"])
            viol = _strip_path_prefix(viol, root)
            self._write_violations(viol, f"shard-{sid:05d}")

            stats_tbl = result.filter(pc.equal(result["kind"], "stats")) \
                              .select(["partition_id", "blob", "row_count"])
        per_part = stats_mod.merge_stats_table(stats_tbl)
        shard_total = stats_mod.global_rollup(per_part)

        rec = ShardRecord(shard_id=sid, files=shard_files,
                          schema_hash=self.schema_hash)
        rec.row_count = shard_total.row_count
        rec.rows_per_file = {_lineage_id(pid, root): ps.row_count
                             for pid, ps in per_part.items()}
        rec.violation_counts = dict(shard_total.violation_counts)
        digest = shard_total.digest(self.cfg.quantiles)
        if shard_total.hist is not None:
            digest["hist_hex"] = shard_total.hist.to_bytes().hex()
        if shard_total.tdigest is not None:
            digest["tdigest_hex"] = shard_total.tdigest.to_bytes().hex()
        if shard_total.hll is not None:
            digest["hll_hex"] = shard_total.hll.to_bytes().hex()
        rec.stats_digest = digest
        rec.partition_digests = {}
        for pid, ps in per_part.items():
            d = {
                "row_count": ps.row_count,
                "violation_counts": dict(ps.violation_counts),
                "verdict": "fail" if self._error_counts(
                    ps.violation_counts) else "pass",
            }
            if ps.hist is not None:
                # per-partition histogram travels in the manifest so the
                # assembly phase can score PER-PARTITION drift vs the
                # baseline (a partition fails on violations OR drift)
                d["hist_hex"] = ps.hist.to_bytes().hex()
            rec.partition_digests[_lineage_id(pid, root)] = d
        rec.verdict = "fail" if self._error_counts(
            rec.violation_counts) else "pass"
        rec.wall_time_s = time.perf_counter() - t0
        self.manifest.commit(rec)
        return rec

    # ------------------------------------------------------------------
    def _write_violations(self, table: pa.Table, name: str) -> None:
        """Idempotent per-shard violation output (write-then-rename)."""
        vdir = os.path.join(self.cfg.out_dir, "violations")
        final = os.path.join(vdir, f"{name}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)


def _lineage_root(files: list[str]) -> str:
    """Common directory prefix of the input files.  Lineage partition
    ids are paths RELATIVE to this root (not basenames): two inputs
    with the same basename in different subdirectories must stay
    distinct partitions, or their verdicts and row counts silently
    merge."""
    dirs = {os.path.dirname(os.path.abspath(f)) for f in files}
    if not dirs:
        return ""
    try:
        return os.path.commonpath(dirs)
    except ValueError:
        # mixed drives (windows) / mixed abs-rel inputs have no common
        # path — fall back to basename lineage ids (root = "")
        return ""


def _lineage_id(path: str, root: str) -> str:
    if root:
        try:
            rel = os.path.relpath(os.path.abspath(path), root)
        except ValueError:  # different drive (windows) — fall back
            return os.path.basename(path)
        if not rel.startswith(".."):
            return rel
        # input appended on resume from OUTSIDE the persisted root
        # (the root never moves once recorded): a '../'-chain id is
        # ambiguous in reports, so normalize to an explicit absolute
        # marker — unique by construction and visibly external
        return "ext:" + os.path.abspath(path).lstrip(os.sep)
    return os.path.basename(path)


def _normalize_legacy_lineage_ids(rec: dict, root: str) -> dict:
    """Manifest shard records written before the ``ext:`` convention
    recorded out-of-root inputs as ``../``-chain relative ids; rewrite
    those keys to the current form ON LOAD so a resumed run reports one
    id per physical file instead of duplicating verdict entries under
    two styles.  Matching is by reconstructed abspath, so the rewrite
    is exact, not cosmetic."""
    if not root:
        return rec
    for field in ("rows_per_file", "partition_digests"):
        m = rec.get(field)
        if not m or not any(k.startswith("..") for k in m):
            continue
        rec[field] = {
            ("ext:" + os.path.abspath(os.path.join(root, k)).lstrip(os.sep)
             if k.startswith("..") else k): v
            for k, v in m.items()}
    return rec


def _strip_path_prefix(viol: pa.Table, root: str) -> pa.Table:
    """Rewrite partition_id to the lineage id relative to ``root`` (does
    not leak absolute scratch paths into reports, keeps subdirectory
    distinction)."""
    if viol.num_rows == 0:
        return viol
    # few unique pids (one per input file): map the dictionary, not the
    # rows — robust to relative vs absolute input paths
    enc = pc.dictionary_encode(viol["partition_id"]).combine_chunks()
    mapped = pa.array([_lineage_id(p, root)
                       for p in enc.dictionary.to_pylist()], pa.string())
    pid = pa.DictionaryArray.from_arrays(enc.indices, mapped) \
        .cast(pa.string())
    return viol.set_column(viol.schema.get_field_index("partition_id"),
                           "partition_id", pid)


def _empty_result_table() -> pa.Table:
    from ..stages.validator import RESULT_SCHEMA
    return RESULT_SCHEMA.empty_table()
