"""Regression tests for the round-2 ADVICE findings:

1. jsonl conform() must survive STRUCTURALLY incompatible casts (JSON
   string where a List is declared raises ArrowNotImplementedError, not
   ArrowInvalid) and defer the violation to the validator.
2. sliding_window_aggregate must round scaled values half-away-from-
   zero (SQL round()), not pyarrow's default half-to-even.
3. The dup-injection offset in the dup-pair oracle queries must be
   derived from the corpus (max doc_id + 1), never a fixed 1e6 that
   collides with real ids at >=1M-row scale.
4. pack() must emit a TYPED empty block for an all-empty shard so it
   unifies with non-empty shards' list<int64>/string blocks.
5. _lineage_root falls back to basename ids when commonpath raises;
   inputs appended on resume from outside the persisted lineage root
   get unambiguous 'ext:'-prefixed ids instead of '../'-chains.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyschema_ray import Integer, List, Record, no_auto_store
from pyschema_ray.pipelines.validate import _lineage_root


@no_auto_store
class _JlRec(Record):
    doc_id = Integer(size=8, nullable=False)
    tokens = List(Integer(size=4))
    _key_field = "doc_id"


def test_jsonl_conform_survives_structural_cast_mismatch(tmp_path):
    from pyschema_ray.sources.jsonl import read_jsonl

    p = tmp_path / "rows.jsonl"
    rows = [
        {"$schema": "_JlRec", "doc_id": 1, "tokens": "not-a-list"},
        {"$schema": "_JlRec", "doc_id": 2, "tokens": "also-bad"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    t = pa.concat_tables(list(read_jsonl(str(p), _JlRec).iter_batches(
        batch_format="pyarrow")))
    # read completed; the uncastable column is left as-is (string) for
    # the validator's schema-conformance check
    assert t.num_rows == 2
    assert pa.types.is_string(t.schema.field("tokens").type) or \
        pa.types.is_large_string(t.schema.field("tokens").type)


def test_sliding_window_rounds_half_away_from_zero():
    import ray.data

    from pyschema_ray.functions.windows import sliding_window_aggregate

    # 0.125 * 100 = 12.5 exactly in binary; SQL round() -> 13,
    # half-to-even -> 12
    t = pa.table({
        "ts": pa.array([0], pa.timestamp("us")),
        "event_type": ["a"],
        "value": pa.array([0.125], pa.float64()),
    })
    out = sliding_window_aggregate(ray.data.from_arrow(t),
                                   window_s=7200, slide_s=3600)
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert sorted(res["sum_scaled"].to_pylist()) == [13, 13]


def test_dup_injection_offset_tracks_corpus_max(tmp_path):
    import __ray_entry__ as e

    # corpus whose doc_ids straddle the old fixed 1e6 offset: with the
    # fixed offset the injected dup of doc 0 would collide with the
    # real doc 1_000_000
    doc_ids = [0, 10, 1_000_000]
    t = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": ["alpha beta gamma delta epsilon"] * 2 + ["zeta eta theta"],
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    docs = e._dup_injected_docs(str(tmp_path))
    got = pa.concat_tables(list(docs.iter_batches(batch_format="pyarrow")))
    ids = got["doc_id"].to_pylist()
    assert len(ids) == len(set(ids)), "injected ids collided with real ids"
    # 3 base rows + dups of the %10==0 ids (0, 10, 1_000_000)
    assert len(ids) == 6
    assert set(ids) - set(doc_ids) == {1_000_001, 1_000_011, 2_000_001}


def test_pack_all_empty_shard_unifies(ray_session):
    import ray.data

    from pyschema_ray.functions.dedup import _key_shards
    from pyschema_ray.functions.pack import pack_sequences

    # pick keys so at least one shard receives ONLY empty token lists
    num_shards = 4
    keys = np.arange(64, dtype=np.int64)
    shards = _key_shards(keys, num_shards, 31)
    empty_shard = int(shards[0])
    tokens = [[] if s == empty_shard else [1, 2, 3] for s in shards]
    assert any(s == empty_shard for s in shards)
    assert any(s != empty_shard for s in shards)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([str(k) for k in keys], pa.string()),
        "tokens": pa.array(tokens, pa.list_(pa.int64())),
    }))
    out = pack_sequences(ds, max_len=4, num_shards=num_shards)
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    # schema unified across typed-empty and non-empty shards (the
    # pre-fix failure mode was a unification error on null-typed
    # columns); tokens may surface as list<int64> or Ray's
    # variable-shaped tensor extension
    assert res.num_rows > 0
    ttype = res.schema.field("tokens").type
    assert pa.types.is_list(ttype) or "ndarray" in str(ttype) \
        or "tensor" in str(ttype)
    total = sum(res["n_tokens"].to_pylist())
    assert total == sum(len(tk) for tk in tokens)


def test_lineage_root_commonpath_valueerror_fallback(monkeypatch):
    def boom(_dirs):
        raise ValueError("mixed drives")

    monkeypatch.setattr(os.path, "commonpath", boom)
    assert _lineage_root(["/a/x.parquet", "/b/y.parquet"]) == ""


def test_out_of_root_inputs_get_normalized_lineage_ids(tmp_path):
    """Inputs appended on resume from outside the persisted lineage
    root must yield unambiguous 'ext:'-prefixed ids — never a
    '../'-chain (round-2 ADVICE)."""
    from pyschema_ray.pipelines.validate import _lineage_id

    root = str(tmp_path / "a")
    inside = str(tmp_path / "a" / "x.parquet")
    outside = str(tmp_path / "b" / "y.parquet")

    assert _lineage_id(inside, root) == "x.parquet"
    ext = _lineage_id(outside, root)
    assert ".." not in ext
    assert ext.startswith("ext:")
    assert ext.endswith("b/y.parquet")
    # distinct from any plausible in-root id with the same basename
    assert ext != _lineage_id(str(tmp_path / "a" / "b" / "y.parquet"),
                              root)
