"""Regression tests for the round-3 ADVICE findings:

1. winnow_candidates' max_bucket cap must not lose exact-dup clusters
   larger than the cap: over-cap buckets emit chain pairs in
   content-hash order (identical docs adjacent, so exact-filter-proof
   connectivity), and component_all_pairs restores the full pair
   closure the SQL self-join oracle produces.
2. Constraint.rebind must rewrite the COLUMN path, never a substring
   of the constraint-kind prefix (column 'n' under parent 'parent'
   previously yielded 'parent.not_null(n)').
3. copartition_range_join_count must include degenerate (end <= start)
   and null-bound intervals with n_events = 0, matching the broadcast
   variant's contract; both variants clamp degenerate counts at 0.
4. Resuming a manifest with legacy '../'-chain lineage ids must
   normalize them to the current 'ext:' form so one physical file
   never appears under two ids.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _pairs_set(tbl: pa.Table):
    return set(zip(tbl["key_a"].to_pylist(), tbl["key_b"].to_pylist()))


def test_winnow_over_cap_cluster_keeps_recall_via_closure():
    import ray.data

    from pyschema_ray.functions.dedup import (component_all_pairs,
                                              filter_exact_text_pairs,
                                              winnow_candidates)

    # exact-dup cluster of 6 identical docs (> max_bucket=3): every
    # fingerprint is shared cluster-wide, so every bucket is over-cap
    text = "the quick brown fox jumps over the lazy dog " * 6
    other = "completely different content with no shared windows at all " * 6
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(6)) + [100, 101], pa.int64()),
        "text": pa.array([text] * 6 + [other, other]),
    }))
    cand = winnow_candidates(docs, max_bucket=3)
    closure = component_all_pairs(filter_exact_text_pairs(cand, docs))
    got = _pairs_set(pa.concat_tables(
        [t for t in closure.iter_batches(batch_format="pyarrow")
         if t.num_rows]))
    want = {(a, b) for a in range(6) for b in range(6) if a < b} | {(100, 101)}
    assert got == want


def test_winnow_chain_pairs_connect_over_cap_buckets():
    import ray.data

    from pyschema_ray.functions.dedup import winnow_candidates

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([text] * 8),
    }))
    cand = pa.concat_tables(
        [t for t in winnow_candidates(docs, max_bucket=2)
         .iter_batches(batch_format="pyarrow") if t.num_rows])
    # raw candidates above the cap are chain pairs (content-hash
    # order), not empty
    got = _pairs_set(cand)
    assert got, "over-cap cluster produced zero candidate pairs"
    # connectivity: union-find over the chain pairs joins all 8 docs
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(8)}) == 1


def test_rebind_short_column_name_anchors_to_argument():
    from pyschema_ray.constraints import NotNull, Range

    c = NotNull("n").rebind("parent")
    assert c.name == "not_null(parent.n)"
    assert c.detail == "parent.n is null"
    assert c.column == "parent.n"

    # double rebind (nested SubRecord hoisting)
    c2 = NotNull("l").rebind("inner").rebind("outer")
    assert c2.name == "not_null(outer.inner.l)"
    assert c2.column == "outer.inner.l"

    # numeric-range detail keeps the column token rewrite
    r = Range("t", 0, 5).rebind("p")
    assert "p.t" in r.name and "(t" not in r.name


def test_copartition_includes_degenerate_and_null_bound_intervals():
    import ray.data

    from pyschema_ray.functions.joins import (broadcast_range_join_count,
                                              copartition_range_join_count)

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = pa.array(base + np.arange(100) * np.timedelta64(60, "s"),
                  pa.timestamp("us"))
    events = ray.data.from_arrow(pa.table({"ts": ts}))

    iv = pa.table({
        "interval_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "start": pa.array([base, base + np.timedelta64(10, "m"),
                           base + np.timedelta64(20, "m"),
                           None, base], pa.timestamp("us")),
        "end": pa.array([base + np.timedelta64(5, "m"),
                         base + np.timedelta64(10, "m"),   # degenerate ==
                         base + np.timedelta64(10, "m"),   # degenerate <
                         base + np.timedelta64(30, "m"),   # null start
                         None],                            # null end
                        pa.timestamp("us")),
    })
    got = pa.concat_tables(
        [t for t in copartition_range_join_count(
            events, ray.data.from_arrow(iv), bucket_s=120)
         .iter_batches(batch_format="pyarrow") if t.num_rows]) \
        .sort_by("interval_id")
    assert got["interval_id"].to_pylist() == [1, 2, 3, 4, 5]
    assert got["n_events"].to_pylist() == [5, 0, 0, 0, 0]

    bro = broadcast_range_join_count(events, iv).sort_by("interval_id")
    assert bro["interval_id"].to_pylist() == [1, 2, 3, 4, 5]
    assert bro["n_events"].to_pylist() == [5, 0, 0, 0, 0]


def test_legacy_lineage_ids_normalize_on_resume():
    from pyschema_ray.pipelines.validate import _normalize_legacy_lineage_ids

    root = "/data/corpus/run1"
    rec = {
        "rows_per_file": {"a/part-0.parquet": 10,
                          "../outside/part-9.parquet": 5},
        "partition_digests": {"a/part-0.parquet": {"verdict": "pass"},
                              "../outside/part-9.parquet":
                                  {"verdict": "fail"}},
    }
    out = _normalize_legacy_lineage_ids(rec, root)
    assert out["rows_per_file"] == {
        "a/part-0.parquet": 10,
        "ext:data/corpus/outside/part-9.parquet": 5}
    assert out["partition_digests"]["ext:data/corpus/outside/part-9.parquet"][
        "verdict"] == "fail"
    # empty root: no-op
    rec2 = {"rows_per_file": {"../x.parquet": 1}}
    assert _normalize_legacy_lineage_ids(dict(rec2), "") == rec2
