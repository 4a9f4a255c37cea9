"""Checkpoint manifest with per-partition lineage (E11).

Layout under ``<out_dir>/manifest/``: one JSON file per completed shard
(``shard-00042.json``), written atomically (write to a tmp name in the
same directory, fsync, ``os.rename``) so a crash mid-write never leaves
a half-record, and Ray task retries / re-submissions are idempotent —
the shard file either exists (skip the shard) or it doesn't (redo it).
A shard's violation parquet is written BEFORE its manifest record, so a
manifest hit guarantees the outputs exist.

Each record carries the lineage mandated by the north rule: input
files, row ranges (row counts per file), stats digest, per-constraint
violation counts, pass/fail verdict, and the schema fingerprint hash so
a resume with a different schema is refused.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


@dataclass
class ShardRecord:
    shard_id: int
    files: list[str]
    schema_hash: str
    row_count: int = 0
    rows_per_file: dict = field(default_factory=dict)
    violation_counts: dict = field(default_factory=dict)
    stats_digest: dict = field(default_factory=dict)
    partition_digests: dict = field(default_factory=dict)
    verdict: str = "pass"  # "pass" | "fail"
    wall_time_s: float = 0.0

    def to_json(self) -> str:
        return json.dumps(asdict(self), default=str)


def schema_hash(schema_cls) -> str:
    blob = json.dumps(schema_cls.fingerprint(), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, shard_id: int) -> str:
        return os.path.join(self.dir, f"shard-{shard_id:05d}.json")

    def completed_shards(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if name.startswith("shard-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
                out[rec["shard_id"]] = rec
        return out

    def is_complete(self, shard_id: int) -> bool:
        return os.path.exists(self._path(shard_id))

    def commit(self, rec: ShardRecord) -> None:
        """Atomic write-then-rename (idempotent under retries)."""
        final = self._path(rec.shard_id)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(rec.to_json())
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # global (post-shard) results, e.g. uniqueness + drift verdicts
    def commit_global(self, name: str, payload: dict) -> None:
        final = os.path.join(self.dir, f"global-{name}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f, default=str)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get_global(self, name: str) -> dict | None:
        p = os.path.join(self.dir, f"global-{name}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def diff_runs(old_dir: str, new_dir: str,
              rate_tolerance: float = 0.0) -> dict:
    """Run-over-run regression report from two completed manifests —
    the ops check a scheduled validation job runs before promoting a
    new corpus snapshot: row-count delta, per-constraint violation
    RATE deltas (per million rows, so differently-sized runs
    compare), constraints that newly appeared or disappeared, and
    per-partition verdict flips.  Driver-side over manifest JSON only
    (O(shards) metadata — never data).

    ``rate_tolerance``: allowed per-million rate increase before a
    constraint lands in ``regressed`` (0 = any increase regresses).

    -> dict(rows_old, rows_new, rates_old, rates_new, regressed,
       improved, new_constraints, gone_constraints, verdict_flips,
       passed_old, passed_new).
    """
    def load(d):
        m = Manifest(d)
        summary = m.get_global("summary")
        if summary is None:
            raise ValueError(f"no completed summary in {d!r}")
        parts = {}
        for rec in m.completed_shards().values():
            for pid, dig in rec.get("partition_digests", {}).items():
                parts[pid] = dig.get("verdict", "pass")
        return summary, parts

    s_old, p_old = load(old_dir)
    s_new, p_new = load(new_dir)
    rows_old = max(1, int(s_old.get("row_count", 0)))
    rows_new = max(1, int(s_new.get("row_count", 0)))
    vc_old = s_old.get("violation_counts", {}) or {}
    vc_new = s_new.get("violation_counts", {}) or {}
    rate = lambda c, n: 1e6 * c / n  # noqa: E731
    rates_old = {k: rate(v, rows_old) for k, v in vc_old.items()}
    rates_new = {k: rate(v, rows_new) for k, v in vc_new.items()}
    regressed, improved = {}, {}
    for k in sorted(set(rates_old) | set(rates_new)):
        d = rates_new.get(k, 0.0) - rates_old.get(k, 0.0)
        if d > rate_tolerance:
            regressed[k] = d
        elif d < 0:
            improved[k] = d
    verdict_flips = {
        pid: (p_old[pid], p_new[pid])
        for pid in sorted(set(p_old) & set(p_new))
        if p_old[pid] != p_new[pid]}
    return {
        "rows_old": int(s_old.get("row_count", 0)),
        "rows_new": int(s_new.get("row_count", 0)),
        "rates_old": rates_old, "rates_new": rates_new,
        "regressed": regressed, "improved": improved,
        "new_constraints": sorted(set(vc_new) - set(vc_old)),
        "gone_constraints": sorted(set(vc_old) - set(vc_new)),
        "verdict_flips": verdict_flips,
        "passed_old": bool(s_old.get("passed", False)),
        "passed_new": bool(s_new.get("passed", False)),
    }
