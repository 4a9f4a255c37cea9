"""Partial -> final merge of per-batch stats partials (E5).

The validator emits one tiny ``StatsPartial`` row per (batch,
partition).  The merge is a two-level reduce: per-partition (for
verdicts + lineage) and a global rollup — t-digests merge, HLL
registers take element-wise max, histogram vectors add (all
associative; tested in tests/test_sketches.py).  The partial stream is
O(batches), not O(rows), so the final reduce is driver-side on a small
materialized table without becoming a bottleneck (SURVEY.md §7 hard
part 5)."""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..sketches import GroupedHistogram, HyperLogLog, TDigest
from .validator import StatsPartial


@dataclass
class PartitionStats:
    """Merged stats for one partition (or the global rollup)."""

    partition_id: str = ""
    row_count: int = 0
    null_counts: dict = field(default_factory=dict)
    minmax: dict = field(default_factory=dict)
    violation_counts: dict = field(default_factory=dict)
    tdigest: TDigest | None = None
    hll: HyperLogLog | None = None
    hist: GroupedHistogram | None = None

    def absorb(self, p: StatsPartial) -> "PartitionStats":
        self.row_count += p.row_count
        for k, v in p.null_counts.items():
            self.null_counts[k] = self.null_counts.get(k, 0) + v
        for k, (lo, hi) in p.minmax.items():
            cur = self.minmax.get(k)
            self.minmax[k] = (lo, hi) if cur is None else \
                (min(cur[0], lo), max(cur[1], hi))
        for k, v in p.violation_counts.items():
            self.violation_counts[k] = self.violation_counts.get(k, 0) + v
        if p.tdigest is not None:
            td = TDigest.from_bytes(p.tdigest)
            self.tdigest = td if self.tdigest is None else self.tdigest.merge(td)
        if p.hll is not None:
            h = HyperLogLog.from_bytes(p.hll)
            self.hll = h if self.hll is None else self.hll.merge(h)
        if p.hist is not None:
            g = GroupedHistogram.from_bytes(p.hist)
            self.hist = g if self.hist is None else self.hist.merge(g)
        return self

    def merge(self, other: "PartitionStats") -> "PartitionStats":
        self.row_count += other.row_count
        for k, v in other.null_counts.items():
            self.null_counts[k] = self.null_counts.get(k, 0) + v
        for k, (lo, hi) in other.minmax.items():
            cur = self.minmax.get(k)
            self.minmax[k] = (lo, hi) if cur is None else \
                (min(cur[0], lo), max(cur[1], hi))
        for k, v in other.violation_counts.items():
            self.violation_counts[k] = self.violation_counts.get(k, 0) + v
        # Sketch merges mutate self in place, so NEVER alias other's
        # sketch object: clone when adopting a sketch we didn't create,
        # otherwise later merges into this object would corrupt `other`
        # (e.g. global_rollup silently folding every partition into the
        # first partition's digest/histogram).
        if other.tdigest is not None:
            self.tdigest = other.tdigest.clone() if self.tdigest is None \
                else self.tdigest.merge(other.tdigest)
        if other.hll is not None:
            self.hll = other.hll.clone() if self.hll is None \
                else self.hll.merge(other.hll)
        if other.hist is not None:
            self.hist = other.hist.clone() if self.hist is None \
                else self.hist.merge(other.hist)
        return self

    def digest(self, quantiles=(0.5, 0.9, 0.99)) -> dict:
        """JSON-compatible summary for the manifest / verdicts."""
        out: dict = {
            "row_count": self.row_count,
            "null_counts": dict(self.null_counts),
            "minmax": {k: list(v) for k, v in self.minmax.items()},
            "violation_counts": dict(self.violation_counts),
        }
        if self.tdigest is not None:
            out["quantiles"] = {f"p{int(q * 100)}": self.tdigest.quantile(q)
                                for q in quantiles}
        if self.hll is not None:
            out["ndv_estimate"] = self.hll.estimate()
        if self.hist is not None:
            out["hist_groups"] = {g: int(v.sum())
                                  for g, v in self.hist.groups.items()}
        return out


def merge_stats_table(stats_table: pa.Table) -> dict[str, PartitionStats]:
    """Merge a (partition_id, blob, row_count) table of pickled partials
    into per-partition PartitionStats.  Input is small (one row per
    batch-partition); runs on the driver or in a map_groups."""
    out: dict[str, PartitionStats] = {}
    pids = stats_table["partition_id"].to_pylist()
    blobs = stats_table["blob"].to_pylist()
    for pid, blob in zip(pids, blobs):
        ps = out.get(pid)
        if ps is None:
            ps = out[pid] = PartitionStats(partition_id=pid)
        ps.absorb(StatsPartial.from_bytes(blob))
    return out


def global_rollup(per_partition: dict[str, PartitionStats]) -> PartitionStats:
    g = PartitionStats(partition_id="<global>")
    for ps in per_partition.values():
        g.merge(ps)
    return g


def tree_merge_hex(hex_blobs: list[str], cls, threshold: int = 256,
                   fanout: int = 64):
    """Merge serialized sketches (hex blobs of ``cls`` with
    ``from_bytes``/``merge``/``to_bytes``).  Below ``threshold`` blobs
    the merge is a driver loop; above it, chunks of ``fanout`` are
    merged in parallel Ray tasks and the (fanout×-smaller) results
    recurse — so merging 10^6 per-shard digests costs the driver
    O(threshold) unpickles instead of O(shards).

    HLL (register max) and histogram (vector add) merges are exactly
    associative+commutative, so the tree result is byte-identical to a
    flat merge; t-digest compression is order-sensitive, so quantiles
    agree only within sketch accuracy (tested).

    Returns the merged sketch object, or None for an empty list."""
    if not hex_blobs:
        return None
    if len(hex_blobs) <= threshold:
        out = None
        for h in hex_blobs:
            s = cls.from_bytes(bytes.fromhex(h))
            out = s if out is None else out.merge(s)
        return out

    import ray

    @ray.remote
    def merge_chunk(blobs: list[str]) -> str:
        out = None
        for h in blobs:
            s = cls.from_bytes(bytes.fromhex(h))
            out = s if out is None else out.merge(s)
        return out.to_bytes().hex()

    while len(hex_blobs) > threshold:
        chunks = [hex_blobs[i:i + fanout]
                  for i in range(0, len(hex_blobs), fanout)]
        hex_blobs = ray.get([merge_chunk.remote(c) for c in chunks])
    return tree_merge_hex(hex_blobs, cls, threshold, fanout)
