"""Product quantization for embedding columns — the compression
scale path for ANN (Jégou, Douze & Schmid 2011, "Product
Quantization for Nearest Neighbor Search" — public algorithm).

Why it matters at 100 TB: a 256-dim float32 embedding is 1 KB; its
PQ code at m=16 subspaces × 8 bits is 16 bytes — a 64× reduction
that turns an un-broadcastable corpus into one whose codes fit the
object store (or a single node's RAM) for repeated querying.

Pieces, each Ray-Data-first:

* :func:`pq_train` — per-subspace Lloyd k-means over a driver-side
  sample (deterministic seed; the codebook is tiny: m × ksub × dsub
  floats), exactly the sampling contract of ``build_ivf_centroids``.
* :func:`pq_encode` — one ``map_batches`` over the corpus; the
  codebook ships ONCE via ``ray.put``; per batch, assignment is m
  small matmuls + argmax, emitting a ``fixed_size_list<uint8>[m]``
  code column.  Vectors are L2-normalized first so inner product =
  cosine downstream.
* :func:`pq_topk` — asymmetric distance computation (ADC): per
  query, an (m × ksub) lookup table of query·centroid inner
  products; per batch the approximate score is a table GATHER +
  row-sum over codes (no float matmul against the corpus), then the
  same partial-top-k + driver-merge shape as ``brute_force_topk``.

Approximation error is bounded by quantization distortion; recall
against the exact scorer is measured in tests/test_pq.py (and the
reconstruction MSE must beat a mismatched-codebook control).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _as_matrix, _normalize


def _kmeans(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Deterministic Lloyd k-means (L2) -> (k, d) centroids; empty
    clusters keep their previous centroid."""
    k = min(k, len(x))
    cent = x[rng.choice(len(x), k, replace=False)].copy()
    xx = (x * x).sum(1)[:, None]
    for _ in range(iters):
        d2 = xx - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(ds, m: int = 8, ksub: int = 16, sample_size: int = 2048,
             iters: int = 10, seed: int = 1234,
             embedding_col: str = "embedding") -> dict:
    """Train per-subspace codebooks on a corpus sample.

    ``d`` must be divisible by ``m``; ``ksub`` must fit the uint8 code
    width (<= 256 — a larger ksub would silently wrap code ids in
    :func:`_assign_codes` and corrupt every encoding).  Returns
    ``{"codebooks": (m, ksub, d//m) float32, "m": m, "d": d}``."""
    if ksub > 256:
        raise ValueError(f"ksub={ksub} exceeds the uint8 code width "
                         "(max 256 centroids per subspace)")
    sample = ds.limit(sample_size)
    mats = [_as_matrix(t[embedding_col]) for t in
            sample.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
    x = _normalize(np.vstack(mats).astype(np.float32))
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.stack([
        _kmeans(x[:, j * dsub:(j + 1) * dsub], ksub, iters, rng)
        for j in range(m)
    ])  # (m, ksub_eff, dsub)
    return {"codebooks": books.astype(np.float32), "m": m, "d": d}


def _assign_codes(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) vectors -> (n, m) uint8 codes; nearest centroid per
    subspace via the expanded-norm trick (no n×k×d temporary)."""
    m, ksub, dsub = books.shape
    if ksub > 256:
        raise ValueError(f"codebook ksub={ksub} cannot be coded in "
                         "uint8 (max 256)")
    codes = np.empty((len(x), m), np.uint8)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cb = books[j]
        d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T) \
            + (cb * cb).sum(1)[None, :]
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, model: dict, embedding_col: str = "embedding",
              out_col: str = "pq_code"):
    """Append the compressed code column
    (``fixed_size_list<uint8>[m]``); the codebook ships once via
    ``ray.put`` and every batch is m small matmuls — the corpus
    never re-reads for later searches that accept quantized scores."""
    import ray

    books_ref = ray.put(model["codebooks"])
    m = model["m"]

    def fn(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        x = _normalize(_as_matrix(t[embedding_col]))
        codes = _assign_codes(x, books)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m)
        return t.append_column(out_col, col)

    return ds.map_batches(fn, batch_format="pyarrow")


def pq_decode(codes: np.ndarray, model: dict) -> np.ndarray:
    """(n, m) codes -> (n, d) reconstructed vectors (for distortion
    measurement)."""
    books = model["codebooks"]
    m, _, dsub = books.shape
    return np.concatenate(
        [books[j][codes[:, j]] for j in range(m)], axis=1)


def pq_topk(ds, queries: np.ndarray, model: dict, k: int = 10,
            embedding_col: str = "embedding",
            key_col: str = "vec_id") -> pa.Table:
    """ADC top-k: approximate cosine of each query against the corpus
    scored from CODES only — per batch, one gather into the per-query
    (m, ksub) LUT + a row sum; the float corpus is read once to
    encode on the fly (run :func:`pq_encode` + persist the codes to
    amortize across queries).  Returns (query_id, key, score, rank),
    ties broken ascending on key."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    books = model["codebooks"]          # (m, ksub, dsub)
    m, ksub, dsub = books.shape
    # LUT[qi, j, c] = q_sub(j) . centroid(j, c)
    lut = np.einsum("qjd,jcd->qjc",
                    q.reshape(len(q), m, dsub), books)
    lut_books_ref = ray.put((lut.astype(np.float32), books))

    def partial(t: pa.Table) -> pa.Table:
        lut_, books_ = ray.get(lut_books_ref)
        x = _normalize(_as_matrix(t[embedding_col]))
        codes = _assign_codes(x, books_)          # (n, m)
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False))
        # scores[qi, i] = sum_j lut_[qi, j, codes[i, j]]
        gather = lut_[:, np.arange(m)[None, :], codes]   # (Q, n, m)
        sims = gather.sum(axis=2)                        # (Q, n)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(lut_)), kk)
        cols = idx.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows.astype(np.int64)),
            key_col: pa.array(keys[cols]),
            "score": pa.array(sims[rows, cols].astype(np.float64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    if not parts:  # empty corpus: zero batches, nothing to rank
        return pa.table({"query_id": pa.array([], pa.int64()),
                         key_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts)
    qid = np.asarray(merged["query_id"].to_numpy(zero_copy_only=False))
    score = np.asarray(merged["score"].to_numpy(zero_copy_only=False))
    keys = merged[key_col].to_numpy(zero_copy_only=False)
    out_q, out_k, out_s, out_r = [], [], [], []
    for qi in np.unique(qid):
        sel = qid == qi
        s, ky = score[sel], keys[sel]
        order = np.lexsort((np.asarray(ky, dtype=object), -s))[:k]
        out_q.extend([int(qi)] * len(order))
        out_k.extend(ky[order].tolist())
        out_s.extend(s[order].tolist())
        out_r.extend(range(1, len(order) + 1))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        key_col: pa.array(out_k),
        "score": pa.array(out_s, pa.float64()),
        "rank": pa.array(out_r, pa.int32()),
    })
