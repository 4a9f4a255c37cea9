"""Round-5 regressions: empty shuffle partitions and empty-input UDF
branches.

Two distinct failure classes:

1. A block whose rows are all FILTERED INSIDE a UDF (the block itself
   is non-empty, so the batcher delivers it): the UDF's empty branch
   must be dtype-safe.  ``filter_exact_text_pairs``'s hash builder
   crashed here (np.char.mod on an empty object array infers float64,
   then np.char.zfill raises TypeError) — the round-4 driver ``err``
   for minhash/simhash_dup_pairs.

2. A shuffle partition with NO rows at all: Ray never calls the UDF
   (batcher.py drops empty blocks) and fabricates a schema-less empty
   block (output_buffer.py emits >=1 block per task).  Nothing
   UDF-side can pin that schema; ``pyschema_ray._raypatch`` relabels
   such bundles with the stream schema so chained ops see one schema
   and no spurious divergence warnings fire.
"""
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_fingerprint_batch_empty_block():
    from pyschema_ray.functions.text import fingerprint_batch
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = fingerprint_batch(t)
    assert out.num_rows == 0
    assert out.schema.field("fingerprint").type == pa.string()


def test_fingerprint_batch_hex_width():
    from pyschema_ray.functions.text import fingerprint_batch
    t = pa.table({"text": pa.array(["a", "b", "a"], pa.string())})
    fp = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert all(len(h) == 16 for h in fp)
    assert fp[0] == fp[2] and fp[0] != fp[1]


def test_filter_exact_pairs_subset_hits_empty_blocks(ray_session):
    """Force doc blocks that contain NO candidate doc (the subset
    filter empties them inside the UDF) — the exact layout that made
    the round-4 driver intermittently fail."""
    import ray.data
    from pyschema_ray.functions.dedup import filter_exact_text_pairs

    n = 64
    texts = [f"doc body {i}" for i in range(n)]
    texts[1] = texts[0]  # one exact-dup pair at keys (0, 1)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(16)  # ~4 rows per block, most blocks candidate-free
    pairs = ray.data.from_arrow(pa.table({
        "key_a": pa.array([0, 2], pa.int64()),
        "key_b": pa.array([1, 3], pa.int64()),
    }))
    got = filter_exact_text_pairs(pairs, docs).to_pandas()
    assert sorted(map(tuple, got[["key_a", "key_b"]].to_numpy())) == [(0, 1)]


def test_empty_partitions_schema_stable(ray_session, caplog):
    """groupby().map_groups with far more partitions than groups:
    results stay exact and the executor logs no mixed-schema warning
    (the _raypatch shim relabels fabricated empty bundles)."""
    import ray.data
    from pyschema_ray import _raypatch
    assert _raypatch.install()

    t = pa.table({"shard": pa.array([0, 0, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([5, 3, 9, 1, 7, 2], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(16)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"shard": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"shard": [df["shard"].iloc[0]],
                             "mx": [df["v"].max()]})

    with caplog.at_level(logging.WARNING,
                         logger="ray.data._internal.execution"
                                ".streaming_executor_state"):
        out = ds.groupby("shard").map_groups(agg, batch_format="pandas") \
                .to_pandas().sort_values("shard").reset_index(drop=True)
    assert out["shard"].tolist() == [0, 1, 2]
    assert out["mx"].tolist() == [5, 9, 7]
    assert not [r for r in caplog.records
                if "different schema" in r.getMessage()]


def test_raypatch_still_warns_on_real_divergence():
    """The shim must NOT mask genuine schema divergence (two non-empty,
    different schemas)."""
    from ray.data._internal.execution import streaming_executor_state as ses
    from ray.data._internal.execution.interfaces import RefBundle
    from ray.data.block import BlockMetadata

    def bundle_of(tbl: pa.Table) -> RefBundle:
        import ray
        ref = ray.put(tbl)
        meta = BlockMetadata(num_rows=tbl.num_rows,
                             size_bytes=tbl.nbytes,
                             input_files=None, exec_stats=None)
        return RefBundle([(ref, meta)], owns_blocks=True,
                         schema=tbl.schema)

    old = pa.schema([("a", pa.int64())])
    diverging = bundle_of(pa.table({"b": pa.array(["x"])}))
    _, diverged = ses.dedupe_schemas_with_validation(
        old, diverging, warn=False)
    assert diverged

    empty = bundle_of(pa.table({}))
    relabeled, diverged = ses.dedupe_schemas_with_validation(
        old, empty, warn=False)
    assert not diverged
    assert relabeled.schema == old


def test_dup_pair_queries_survive_block_sweep(ray_session, monkeypatch):
    """minhash/simhash dup-pair queries across adversarial block
    counts — the round-4 driver red, now green at every layout."""
    import __ray_entry__ as e
    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    want = None
    for nb in ("1", "7", "64"):
        monkeypatch.setenv("PSR_NUM_BLOCKS", nb)
        for name in ("minhash_dup_pairs", "simhash_dup_pairs"):
            out = qs[name](sf)
            rows = sorted(map(tuple, zip(out["key_a"].to_pylist(),
                                         out["key_b"].to_pylist())))
            if want is None:
                want = rows
            assert rows == want, f"{name} nb={nb} diverged"
    assert want  # dup injection guarantees pairs exist
