"""The core per-batch validation stage.

``CompiledValidator`` is a callable CLASS for
``ds.map_batches(CompiledValidator, fn_constructor_kwargs=...,
batch_format="pyarrow", zero_copy_batch=True, concurrency=N)`` — an
actor-pool stage: constraints are compiled and the drift baseline
profile is loaded ONCE per actor in ``__init__``; ``__call__`` runs the
vectorized checks per Arrow batch (the reference validates
record-at-a-time in ``Field.load``, pyschema/core.py
``from_json_compatible``; here one pass covers E2 schema conformance,
E3 row constraints, E4 violation emission, E5 stats partials, E7
broadcast referential, and the E8 per-batch drift histograms).

Output is a tagged union table (both streams are tiny relative to the
input — violations ~O(defect rate), stats one row per batch-partition):

    kind          string   "violation" | "stats"
    key           string   row key (e.g. doc_id) for violations, null for stats
    partition_id  string   lineage partition (input file) the row came from
    constraint    string   frozen constraint name ("" for stats rows)
    detail        string   frozen detail string ("" for stats rows)
    blob          binary   pickled StatsPartial for stats rows, null otherwise
    row_count     int64    rows covered by a stats row, 0 for violations

Downstream, ``split_result`` filters the two streams and
``stages.stats`` merges the partials per partition.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constraints import Constraint, Referential
from ..sketches import GroupedHistogram, HyperLogLog, TDigest, hash_strings

RESULT_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),
    pa.field("key", pa.string()),
    pa.field("partition_id", pa.string()),
    pa.field("constraint", pa.string()),
    pa.field("detail", pa.string()),
    pa.field("blob", pa.binary()),
    pa.field("row_count", pa.int64()),
])

VIOLATION_SCHEMA = pa.schema([
    pa.field("key", pa.string()),
    pa.field("partition_id", pa.string()),
    pa.field("constraint", pa.string()),
    pa.field("detail", pa.string()),
])

PARTITION_COLUMN = "path"  # injected by read_parquet(include_paths=True)


@dataclass
class StatsConfig:
    """What the stats partial tracks.  All optional so the validator can
    run constraint-only."""

    quantile_column: str | None = None      # t-digest over this column
    cardinality_column: str | None = None   # HLL over this column
    histogram_column: str | None = None     # per-group histogram values
    histogram_group: str | None = None      # group key (e.g. "source")
    histogram_range: tuple[float, float] = (1.0, 4096.0)
    histogram_bins: int = 64
    minmax_columns: list[str] = field(default_factory=list)
    tdigest_compression: int = 200
    hll_p: int = 14


@dataclass
class StatsPartial:
    """Per-(batch, partition) partial; mergeable and picklable."""

    row_count: int = 0
    null_counts: dict = field(default_factory=dict)
    minmax: dict = field(default_factory=dict)       # col -> (min, max)
    violation_counts: dict = field(default_factory=dict)
    tdigest: bytes | None = None
    hll: bytes | None = None
    hist: bytes | None = None

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=4)

    @staticmethod
    def from_bytes(b: bytes) -> "StatsPartial":
        return pickle.loads(b)

    def merge(self, other: "StatsPartial") -> "StatsPartial":
        """Associative partial-partial merge (used by FileValidator to
        collapse per-batch partials to one per file, so the driver-side
        final reduce is O(files), not O(batches))."""
        from ..sketches import GroupedHistogram, HyperLogLog, TDigest

        self.row_count += other.row_count
        for k, v in other.null_counts.items():
            self.null_counts[k] = self.null_counts.get(k, 0) + v
        for k, (lo, hi) in other.minmax.items():
            cur = self.minmax.get(k)
            self.minmax[k] = (lo, hi) if cur is None else \
                (min(cur[0], lo), max(cur[1], hi))
        for k, v in other.violation_counts.items():
            self.violation_counts[k] = self.violation_counts.get(k, 0) + v
        if other.tdigest is not None:
            self.tdigest = other.tdigest if self.tdigest is None else \
                TDigest.from_bytes(self.tdigest).merge(
                    TDigest.from_bytes(other.tdigest)).to_bytes()
        if other.hll is not None:
            self.hll = other.hll if self.hll is None else \
                HyperLogLog.from_bytes(self.hll).merge(
                    HyperLogLog.from_bytes(other.hll)).to_bytes()
        if other.hist is not None:
            self.hist = other.hist if self.hist is None else \
                GroupedHistogram.from_bytes(self.hist).merge(
                    GroupedHistogram.from_bytes(other.hist)).to_bytes()
        return self


class StatsAccumulator:
    """Live sketch state for one lineage partition.  Dataset mode uses
    a throwaway accumulator per batch (partials merge downstream);
    FileValidator keeps ONE per file so each file ships a single merged
    partial and the driver-side final reduce is O(files)."""

    def __init__(self, cfg: StatsConfig | None):
        # cfg=None still counts rows/nulls/violations — verdict counts
        # must flow even when no sketches are configured
        cfg = cfg if cfg is not None else StatsConfig()
        self.cfg = cfg
        self.row_count = 0
        self.null_counts: dict = {}
        self.minmax: dict = {}
        self.violation_counts: dict = {}
        self.tdigest = TDigest(cfg.tdigest_compression) \
            if cfg.quantile_column else None
        self.hll = HyperLogLog(cfg.hll_p) if cfg.cardinality_column else None
        if cfg.histogram_column and cfg.histogram_group:
            lo, hi = cfg.histogram_range
            self.hist = GroupedHistogram(lo, hi, cfg.histogram_bins)
        else:
            self.hist = None

    def update(self, table: pa.Table, viol_counts: dict) -> None:
        s = self.cfg
        self.row_count += table.num_rows
        for k, v in viol_counts.items():
            self.violation_counts[k] = self.violation_counts.get(k, 0) + v
        for col in table.column_names:
            self.null_counts[col] = self.null_counts.get(col, 0) \
                + table[col].null_count
        for col in s.minmax_columns:
            if col in table.column_names and table.num_rows:
                mm = pc.min_max(table[col])
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if lo is not None:
                    cur = self.minmax.get(col)
                    self.minmax[col] = (lo, hi) if cur is None else \
                        (min(cur[0], lo), max(cur[1], hi))
        if self.tdigest is not None and s.quantile_column in table.column_names:
            vals = np.asarray(
                pc.drop_null(table[s.quantile_column])
                .to_numpy(zero_copy_only=False), dtype=np.float64)
            self.tdigest.add(vals)
        if self.hll is not None and s.cardinality_column in table.column_names:
            col = pc.drop_null(table[s.cardinality_column])
            self.hll.add_strings(pc.cast(col, pa.string()))
        if (self.hist is not None
                and s.histogram_column in table.column_names
                and s.histogram_group in table.column_names):
            self.hist.add(
                table[s.histogram_group].to_numpy(zero_copy_only=False),
                table[s.histogram_column].to_numpy(zero_copy_only=False))

    def to_partial(self) -> StatsPartial:
        p = StatsPartial(row_count=self.row_count)
        p.null_counts = dict(self.null_counts)
        p.minmax = dict(self.minmax)
        p.violation_counts = dict(self.violation_counts)
        if self.tdigest is not None:
            p.tdigest = self.tdigest.to_bytes()
        if self.hll is not None:
            p.hll = self.hll.to_bytes()
        if self.hist is not None:
            p.hist = self.hist.to_bytes()
        return p


class CompiledValidator:
    """Actor-pool batch validator.  See module docstring.

    Parameters
    ----------
    schema_cls : Record subclass (pyschema-style declaration)
    stats : StatsConfig | None
    ref_sets : {column: (dim_name, dim_column, list_of_values)} — the
        broadcast side of referential checks.  Pass the *values* (small);
        at cluster scale the caller puts them once via ``ray.put`` and
        Ray ships the object to each actor, not per batch.
    extra_constraints : additional Constraint objects (custom validators).
    baseline_profile : optional drift baseline (see stages.drift); loaded
        here once per actor so drift histograms use its binning.
    """

    def __init__(self, schema_cls, stats: StatsConfig | None = None,
                 ref_sets: dict | None = None,
                 extra_constraints: list | None = None,
                 baseline_profile=None):
        import ray

        self.schema_cls = schema_cls
        self.expected = schema_cls.to_arrow()
        self.key_field = schema_cls.key_field()
        self.constraints: list[Constraint] = list(schema_cls.compiled_constraints())
        for col, (dim, dim_col, values) in (ref_sets or {}).items():
            if isinstance(values, ray.ObjectRef):
                values = ray.get(values)  # broadcast: fetched once per actor
            self.constraints.append(Referential(col, dim, dim_col, values))
        self.constraints.extend(extra_constraints or [])
        if baseline_profile is not None and stats is not None:
            # align histogram binning with the baseline so KL/PSI compare
            # identical bins (stages/drift.py BaselineProfile).  Copy the
            # config — the caller may share one StatsConfig across
            # pipelines with different (or no) baselines.
            import dataclasses
            stats = dataclasses.replace(
                stats,
                histogram_range=(baseline_profile.lo, baseline_profile.hi),
                histogram_bins=baseline_profile.nbins)
        self.stats = stats
        self.baseline = baseline_profile

    @property
    def warning_names(self) -> set:
        """Frozen names of warning-severity constraints — the set
        verdict computations subtract (constraints.as_warning)."""
        return {c.name for c in self.constraints
                if getattr(c, "severity", "error") == "warning"}

    def read_columns(self) -> list[str] | None:
        """Columns the validator actually touches — declared fields,
        key, stats inputs, constraint columns — for column-pruned
        reads.  A constraint declares its inputs via a
        ``required_columns()`` method, or the ``column`` /
        ``list_column`` attribute convention; any constraint declaring
        NEITHER (e.g. Custom — its mask fn may read anything) disables
        pruning entirely (returns None = read everything), so an
        unconventional extra constraint can never crash on a pruned
        batch."""
        cols = {f.name for f in self.expected} | {self.key_field}
        for c in self.constraints:
            req = getattr(c, "required_columns", None)
            if callable(req):
                cols.update(req())
                continue
            declared = [getattr(c, a, None)
                        for a in ("column", "list_column")]
            if all(v is None for v in declared):
                return None  # opaque constraint — cannot prune safely
            # dotted nested paths ('parent.child') read the TOP-LEVEL
            # struct column from parquet
            cols.update(v.split(".")[0] for v in declared
                        if v is not None)
        if self.stats is not None:
            for attr in ("quantile_column", "cardinality_column",
                         "histogram_column", "histogram_group"):
                v = getattr(self.stats, attr, None)
                if v is not None:
                    cols.add(v)
            cols.update(self.stats.minmax_columns)
        return sorted(c for c in cols if c)

    # ------------------------------------------------------------------
    def validate_table(self, table: pa.Table, partition_id: str = "",
                       accumulator: "StatsAccumulator | None" = None) -> pa.Table:
        """Validate one batch with a known lineage partition id.  When
        ``accumulator`` is given, stats are folded into it instead of
        emitting a per-batch stats row (fused file mode)."""
        return self._validate_piece(partition_id, table, accumulator)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if PARTITION_COLUMN in batch.column_names:
            parts = batch[PARTITION_COLUMN]
            batch = batch.drop_columns([PARTITION_COLUMN])
            enc = pc.dictionary_encode(parts.combine_chunks()
                                       if isinstance(parts, pa.ChunkedArray)
                                       else parts)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            dictionary = enc.dictionary.to_pylist()
            codes = np.asarray(enc.indices)
            if len(dictionary) == 1:
                pieces = [(dictionary[0], batch, None)]
            else:
                pieces = []
                for code, pid in enumerate(dictionary):
                    mask = codes == code
                    pieces.append((pid, batch.filter(pa.array(mask)), None))
        else:
            pieces = [("", batch, None)]

        outs = [self._validate_piece(pid, tbl) for pid, tbl, _ in pieces]
        return pa.concat_tables(outs) if len(outs) > 1 else outs[0]

    # ------------------------------------------------------------------
    def _schema_violations(self, table: pa.Table):
        """E2: column presence + type conformance, one violation per
        offending column per batch (key = '<schema>')."""
        rows = []
        for f in self.expected:
            if f.name not in table.column_names:
                rows.append((f"schema({f.name})", "column missing"))
                continue
            actual = table.schema.field(f.name).type
            if actual != f.type and not _castable(actual, f.type):
                rows.append((f"schema({f.name})",
                             f"type {actual} not castable to {f.type}"))
        return rows

    def _validate_piece(self, pid: str, table: pa.Table,
                        accumulator: "StatsAccumulator | None" = None) -> pa.Table:
        n = table.num_rows
        kinds, keys, partitions, constraints, details = [], [], [], [], []
        blobs, row_counts = [], []

        schema_rows = self._schema_violations(table)
        for cname, cdetail in schema_rows:
            kinds.append("violation")
            keys.append("<schema>")
            partitions.append(pid)
            constraints.append(cname)
            details.append(cdetail)
            blobs.append(None)
            row_counts.append(0)

        checkable = {c for c in self.constraints
                     if _columns_present(c, table.schema)}
        key_col = (pc.cast(table[self.key_field], pa.string())
                   if self.key_field in table.column_names
                   else pa.nulls(n, pa.string()))
        viol_counts: dict[str, int] = {}
        for c in self.constraints:  # frozen declaration order
            # n == 0 guard: pyarrow's indices_nonzero segfaults on the
            # zero-chunk ChunkedArrays of an empty table slice
            if n == 0 or c not in checkable:
                continue
            mask = c.mask(table)
            invalid = pc.fill_null(pc.invert(mask), True)
            idx = pc.indices_nonzero(invalid)
            cnt = len(idx)
            if cnt == 0:
                continue
            viol_counts[c.name] = cnt
            bad_keys = pc.take(key_col, idx)
            keys.extend(pc.fill_null(bad_keys, "<null>").to_pylist())
            kinds.extend(["violation"] * cnt)
            partitions.extend([pid] * cnt)
            constraints.extend([c.name] * cnt)
            details.extend([c.detail] * cnt)
            blobs.extend([None] * cnt)
            row_counts.extend([0] * cnt)

        # the stats row is ALWAYS emitted (even with stats=None) — the
        # per-partition verdicts and report.violation_counts are derived
        # from these partials, so gating them on sketch config would make
        # a default-config pipeline silently pass despite violations
        all_counts = dict(viol_counts)
        for cname, _ in schema_rows:
            all_counts[cname] = all_counts.get(cname, 0) + 1
        if accumulator is not None:
            accumulator.update(table, all_counts)
        else:
            acc = StatsAccumulator(self.stats)
            acc.update(table, all_counts)
            kinds.append("stats")
            keys.append(None)
            partitions.append(pid)
            constraints.append("")
            details.append("")
            blobs.append(acc.to_partial().to_bytes())
            row_counts.append(n)

        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "key": pa.array(keys, pa.string()),
            "partition_id": pa.array(partitions, pa.string()),
            "constraint": pa.array(constraints, pa.string()),
            "detail": pa.array(details, pa.string()),
            "blob": pa.array(blobs, pa.binary()),
            "row_count": pa.array(row_counts, pa.int64()),
        }, schema=RESULT_SCHEMA)

def _path_present(schema: pa.Schema, path: str) -> bool:
    """True when the (possibly dotted) column path resolves in this
    batch's ACTUAL schema — a struct missing the nested field must
    surface as the schema-conformance violation, not a crashed task."""
    parts = path.split(".")
    if parts[0] not in schema.names:
        return False
    t = schema.field(parts[0]).type
    for p in parts[1:]:
        if not pa.types.is_struct(t):
            return False
        idx = t.get_field_index(p)
        if idx < 0:
            return False
        t = t.field(idx).type
    return True


def _columns_present(c: Constraint, schema: pa.Schema) -> bool:
    cols = [getattr(c, "column", None), getattr(c, "list_column", None)]
    return all(col is None or _path_present(schema, col) for col in cols)


_CAST_OK = {
    (pa.int32(), pa.int64()), (pa.int64(), pa.int32()),
    (pa.float32(), pa.float64()), (pa.float64(), pa.float32()),
    (pa.large_string(), pa.string()), (pa.string(), pa.large_string()),
}


def _castable(src: pa.DataType, dst: pa.DataType) -> bool:
    if (src, dst) in _CAST_OK:
        return True
    if pa.types.is_list(src) and pa.types.is_list(dst):
        return src.value_type == dst.value_type or \
            _castable(src.value_type, dst.value_type)
    if pa.types.is_integer(src) and pa.types.is_integer(dst):
        return True
    return False


class FileValidator:
    """Fused read+validate: one task per input FILE.

    The generic path (``read_parquet -> map_batches(CompiledValidator)``)
    decodes the whole corpus into object-store blocks that the validator
    immediately reduces to a tiny tagged stream — at 17 GB decoded that
    object-store round trip dominated wall time.  Since validation is a
    pure reduction, each task instead streams its file's row groups
    through the compiled validator locally (``ParquetFile.iter_batches``
    — one ~8k-row batch in memory at a time) and ships ONLY the tagged
    output.  Partition lineage (= file path) is exact by construction.

    Use as ``from_items(paths) -> map_batches(FileValidator(...) | cls,
    batch_size=1)``; works both as a task closure and as an actor pool
    (pass via class + fn_constructor_kwargs when holding a drift
    baseline).
    """

    def __init__(self, batch_rows: int = 8192,
                 columns: list | str | None = "auto",
                 on_corrupt: str = "fail",
                 **validator_kwargs):
        self.validator = CompiledValidator(**validator_kwargs)
        self.batch_rows = batch_rows
        if on_corrupt not in ("fail", "record"):
            raise ValueError(on_corrupt)
        #: "fail" (default) re-raises read/decode errors; "record"
        #: turns an unreadable or mid-file-corrupt input into a
        #: ``corrupt_file`` violation row + a failed partition verdict
        #: instead of killing the whole run — at 10^6-file corpora a
        #: handful of truncated files is routine, and the lineage
        #: manifest must still account for them
        self.on_corrupt = on_corrupt
        # "auto" = prune to the columns the validator touches (per
        # file, intersected with the file's schema so a MISSING declared
        # column still surfaces as a schema violation rather than a
        # read error); None = read everything
        self.columns = self.validator.read_columns() \
            if columns == "auto" else columns

    def _corrupt_row(self, path: str, e: Exception) -> pa.Table:
        return pa.table({
            "kind": pa.array(["violation"], pa.string()),
            "key": pa.array(["<file>"], pa.string()),
            "partition_id": pa.array([path], pa.string()),
            "constraint": pa.array(["corrupt_file"], pa.string()),
            "detail": pa.array([f"{type(e).__name__}: {e}"[:300]],
                               pa.string()),
            "blob": pa.array([None], pa.binary()),
            "row_count": pa.array([0], pa.int64()),
        }, schema=RESULT_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        # optional row-group range columns (rg_start/rg_end) let the
        # planner split big files into several tasks for better packing
        # (stragglers: N whole-file tasks on C cores leave a long tail);
        # stats partials per chunk merge downstream keyed by the file
        rgs = batch["rg_start"].to_pylist() \
            if "rg_start" in batch.column_names else None
        rge = batch["rg_end"].to_pylist() \
            if "rg_end" in batch.column_names else None
        outs = []
        for i, path in enumerate(batch[PARTITION_COLUMN].to_pylist()):
            acc = None
            try:
                pf = pq.ParquetFile(path)
                row_groups = (list(range(rgs[i], rge[i]))
                              if rgs is not None
                              else list(range(pf.metadata.num_row_groups)))
                cols = self.columns
                if cols is not None:
                    avail = set(pf.schema_arrow.names)
                    if avail <= set(cols):
                        # nothing to prune — keep the (faster) whole-
                        # row-group read path instead of a projection
                        cols = None
                    else:
                        cols = [c for c in cols if c in avail]
                acc = StatsAccumulator(self.validator.stats)
                for rb in pf.iter_batches(batch_size=self.batch_rows,
                                          row_groups=row_groups,
                                          columns=cols):
                    tbl = pa.Table.from_batches([rb])
                    outs.append(self.validator.validate_table(tbl, path,
                                                              acc))
            except (pa.lib.ArrowException, OSError, ValueError) as e:
                if self.on_corrupt != "record":
                    raise
                # rows decoded before the corruption keep their
                # violations/stats; the file itself fails its verdict.
                # The count must ALSO ride the stats partial — shard
                # verdicts and rows_per_file are assembled from stats
                # rows, not from the violation stream
                outs.append(self._corrupt_row(path, e))
                if acc is None:
                    acc = StatsAccumulator(self.validator.stats)
                acc.violation_counts["corrupt_file"] = \
                    acc.violation_counts.get("corrupt_file", 0) + 1
            if acc is not None:
                # one merged stats row per FILE (not per batch)
                outs.append(pa.table({
                    "kind": pa.array(["stats"], pa.string()),
                    "key": pa.array([None], pa.string()),
                    "partition_id": pa.array([path], pa.string()),
                    "constraint": pa.array([""], pa.string()),
                    "detail": pa.array([""], pa.string()),
                    "blob": pa.array([acc.to_partial().to_bytes()],
                                     pa.binary()),
                    "row_count": pa.array([acc.row_count], pa.int64()),
                }, schema=RESULT_SCHEMA))
        return pa.concat_tables(outs) if outs else RESULT_SCHEMA.empty_table()


# ---------------------------------------------------------------------------
# stream splitting
# ---------------------------------------------------------------------------

def violations_only(t: pa.Table) -> pa.Table:
    """map_batches fn: keep violation rows, project to VIOLATION_SCHEMA."""
    v = t.filter(pc.equal(t["kind"], "violation"))
    return v.select(["key", "partition_id", "constraint", "detail"])


def stats_only(t: pa.Table) -> pa.Table:
    s = t.filter(pc.equal(t["kind"], "stats"))
    return s.select(["partition_id", "blob", "row_count"])
