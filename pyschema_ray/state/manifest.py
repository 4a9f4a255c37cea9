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
