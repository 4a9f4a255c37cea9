"""Round-5 ADVICE items: uint8 code-width guard, empty-corpus guards,
key-type derivation on empty returns."""
import numpy as np
import pyarrow as pa
import pytest


def _empty_embeddings(key_type=pa.int64()):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], key_type),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))


def test_pq_train_rejects_ksub_over_256(ray_session):
    import ray.data
    from pyschema_ray.functions.pq import pq_train
    rng = np.random.default_rng(0)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(32), pa.int64()),
        "embedding": pa.array([rng.standard_normal(8).tolist()
                               for _ in range(32)],
                              pa.list_(pa.float32())),
    }))
    with pytest.raises(ValueError, match="ksub"):
        pq_train(ds, m=2, ksub=257)


def test_assign_codes_rejects_wide_codebook():
    from pyschema_ray.functions.pq import _assign_codes
    books = np.zeros((2, 300, 4), np.float32)
    with pytest.raises(ValueError, match="uint8"):
        _assign_codes(np.zeros((3, 8), np.float32), books)


def test_brute_force_topk_empty_corpus(ray_session):
    from pyschema_ray.functions.similarity import brute_force_topk
    out = brute_force_topk(_empty_embeddings(),
                           queries=np.ones((2, 4), np.float32), k=3)
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "vec_id", "score", "rank"]


def test_pq_topk_empty_corpus(ray_session):
    from pyschema_ray.functions.pq import pq_topk
    model = {"codebooks": np.zeros((2, 4, 2), np.float32),
             "m": 2, "d": 4}
    out = pq_topk(_empty_embeddings(), np.ones((1, 4), np.float32),
                  model, k=3, key_col="vec_id")
    assert out.num_rows == 0


def test_bm25_empty_corpus_derives_key_type(ray_session):
    import ray.data
    from pyschema_ray.functions.retrieval import bm25_rank
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out = bm25_rank(docs, ["hash"], key_col="doc_id")
    assert out.num_rows == 0
    assert out.schema.field("doc_id").type == pa.int64()


def test_knuth_bucket_negative_keys_match_signed_mod():
    """The numpy two's-complement view equals the sign-normalized
    ((k % 2^32) + 2^32) % 2^32 documented for the SQL oracle."""
    from pyschema_ray.functions.sample import knuth_bucket
    ks = np.array([-1, -2**31, -12345, 0, 7, 2**40 + 3], np.int64)
    got = knuth_bucket(ks)
    want = [(((int(k) % 2**32) + 2**32) % 2**32 * 2654435761) % 2**32
            for k in ks]
    assert got.tolist() == want
