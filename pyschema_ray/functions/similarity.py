"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast ONCE (``ray.put``; each map task reads it from the object
  store, never re-shipped per batch), each batch contributes a partial
  top-k via one numpy matmul, partials merge on the driver
  (k × queries × batches — tiny).
* :class:`LshBucketer` / :func:`lsh_topk` — the scale path: random
  hyperplane signatures bucket vectors; search touches only the
  query's bucket (and optionally multi-probe neighbors).

Embeddings are unpacked zero-copy: the fixed-length list column's
values buffer reshapes directly to an (n, d) matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_matrix(col) -> np.ndarray:
    """list<float>/fixed_size_list<float> column -> (n, d) float32
    matrix, zero-copy where Arrow allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        # .values of a (possibly sliced) FixedSizeListArray is the FULL
        # child buffer — restrict to this slice's range
        flat = col.values.slice(col.offset * d, len(col) * d)
    else:
        offsets = np.asarray(col.offsets, dtype=np.int64)
        lens = np.diff(offsets)
        if len(lens) == 0:
            return np.empty((0, 0), dtype=np.float32)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("ragged embedding column; expected fixed dim")
        # .values of a sliced ListArray is the full child — restrict it
        flat = col.values.slice(int(offsets[0]),
                                int(offsets[-1]) - int(offsets[0]))
    m = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=np.float32)
    return m.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     embedding_col: str = "embedding",
                     key_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k of each query row against the whole dataset.
    Returns (query_id, vec_id/key, score, rank) sorted per query."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)  # broadcast once

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)  # object-store read, zero-copy per worker
        m = _normalize(_as_matrix(t[embedding_col]))
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False))
        sims = qm @ m.T  # (Q, n)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(qm.shape[0]), kk)
        cols = idx.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows.astype(np.int64)),
            key_col: pa.array(keys[cols]),
            "score": pa.array(sims[rows, cols].astype(np.float64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # merge partial top-k on the driver: Q × k × num_batches rows, tiny
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    if not parts:  # empty corpus: zero batches, nothing to rank
        return pa.table({"query_id": pa.array([], pa.int64()),
                         key_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int32())})
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


def cosine_near_dup_pairs(ds, threshold: float = 0.9,
                          embedding_col: str = "embedding",
                          key_col: str = "vec_id") -> pa.Table:
    """Embedding-cosine near-duplicate detection (exact all-pairs).

    The normalized corpus matrix is broadcast once (``ray.put``); each
    batch computes its block-vs-all similarity with one matmul and
    emits only pairs >= threshold with key_a < key_b.  O(n^2) compute
    distributed over batches but O(n·d) memory per worker — right for
    corpora whose embedding matrix fits a worker (~10^6 × 256 floats =
    1 GB); beyond that use :func:`cosine_near_dups_lsh`."""
    import ray

    whole = _collect_matrix(ds, embedding_col, key_col)
    keys_all, m_all = whole
    mn = _normalize(m_all)
    ref = ray.put((keys_all, mn))

    def partial(t: pa.Table) -> pa.Table:
        keys_a, mat = ray.get(ref)
        keys_b = np.asarray(t[key_col].to_numpy(zero_copy_only=False))
        mb = _normalize(_as_matrix(t[embedding_col]))
        sims = mb @ mat.T  # (batch, n)
        bi, ai = np.nonzero(sims >= threshold)
        ka, kb = keys_a[ai], keys_b[bi]
        keep = kb < ka  # key_a < key_b, self-pairs excluded
        return pa.table({
            "key_a": pa.array(kb[keep]),
            "key_b": pa.array(ka[keep]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = pa.concat_tables(
        [t for t in parts.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
        or [pa.table({"key_a": pa.array([], pa.int64()),
                      "key_b": pa.array([], pa.int64())})])
    return out.sort_by([("key_a", "ascending"), ("key_b", "ascending")])


def cosine_near_dups_lsh(ds, threshold: float = 0.9, n_planes: int = 12,
                         seed: int = 1234, embedding_col: str = "embedding",
                         key_col: str = "vec_id", n_tables: int = 1):
    """Scale path for embedding near-dup: random-hyperplane bucketing,
    exact cosine only within buckets.

    ``n_tables`` is the recall knob: the corpus is bucketed
    ``n_tables`` times with independent plane sets (seeds ``seed+i``)
    and the per-table pair sets are unioned + deduplicated — a pair
    splits across buckets in ALL tables with probability
    (1 - (angle-collision prob)^n_planes)^n_tables, so recall rises
    exponentially in n_tables at n_tables× the bucketing cost.
    Measured in tests/test_similarity_recall.py."""
    import pandas as pd

    from .dedup import distinct_pairs

    probe = ds.take_batch(1, batch_format="pyarrow")
    dim = _as_matrix(probe[embedding_col]).shape[1]

    def emit(df: "pd.DataFrame") -> pa.Table:
        from ..sketches import pa_key_type
        kt = pa_key_type(df[key_col])
        if len(df) < 2:
            return pa.table({"key_a": pa.array([], kt),
                             "key_b": pa.array([], kt)})
        m = _normalize(np.stack(
            [np.asarray(v, dtype=np.float32) for v in df[embedding_col]]))
        keys = df[key_col].to_numpy()
        sims = m @ m.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        ka, kb = keys[ai], keys[bi]
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        return pa.table({
            "key_a": pa.array(lo, type=kt, from_pandas=True),
            "key_b": pa.array(hi, type=kt, from_pandas=True)})

    per_table = []
    for i in range(max(1, n_tables)):
        # task closure, not an actor pool: the bucketer is stateless
        # (planes derived from the seed) and n_tables pools would
        # reserve min-actors x tables CPUs and starve the shuffles
        coded = ds.map_batches(
            LshBucketer(dim=dim, n_planes=n_planes, seed=seed + i,
                        embedding_col=embedding_col),
            batch_format="pyarrow")
        per_table.append(
            coded.groupby("bucket").map_groups(emit, batch_format="pandas"))
    if len(per_table) == 1:
        return per_table[0]
    union = per_table[0]
    for t in per_table[1:]:
        union = union.union(t)
    return distinct_pairs(union)


def build_ivf_centroids(ds, n_cells: int = 16, sample_size: int = 2048,
                        seed: int = 1234, iters: int = 10,
                        embedding_col: str = "embedding") -> np.ndarray:
    """IVF coarse quantizer: deterministic Lloyd k-means over a sample
    (driver-side numpy — the sample is small; centroids are then
    broadcast).  Returns (n_cells, d) normalized centroids."""
    sample = ds.limit(sample_size)
    mats = [_as_matrix(t[embedding_col]) for t in
            sample.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
    m = _normalize(np.vstack(mats))
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(m))
    cent = m[rng.choice(len(m), n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, queries: np.ndarray, centroids: np.ndarray, k: int = 10,
             nprobe: int = 4, embedding_col: str = "embedding",
             key_col: str = "vec_id") -> pa.Table:
    """IVF search: each query probes its ``nprobe`` nearest cells; the
    corpus streams through a cell-assignment filter (centroid matrix
    broadcast once) and only vectors in probed cells reach the exact
    scoring matmul.  Scanned fraction ~ nprobe/n_cells at some recall
    cost — the IVF scale path next to the LSH one."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(q_cells)
    cent_ref = ray.put((centroids.astype(np.float32), set(wanted.tolist())))

    def cell_filter(t: pa.Table) -> pa.Table:
        cents, want = ray.get(cent_ref)
        m = _normalize(_as_matrix(t[embedding_col]))
        assign = (m @ cents.T).argmax(axis=1)
        keep = np.isin(assign, list(want))
        return t.filter(pa.array(keep))

    candidates = ds.map_batches(cell_filter, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, embedding_col, key_col)


def _collect_matrix(ds, embedding_col: str, key_col: str):
    """Materialize (keys, matrix) of a small-enough embedding table."""
    keys, mats = [], []
    for t in ds.select_columns([key_col, embedding_col]) \
              .iter_batches(batch_format="pyarrow", batch_size=None):
        keys.append(np.asarray(t[key_col].to_numpy(zero_copy_only=False)))
        mats.append(_as_matrix(t[embedding_col]))
    return np.concatenate(keys), np.vstack(mats)


class LshBucketer:
    """Actor-pool stage: random-hyperplane LSH codes.  The projection
    matrix is derived deterministically from (dim, n_planes, seed) in
    ``__init__`` — identical on every actor, no broadcast needed."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 1234,
                 embedding_col: str = "embedding", out_col: str = "bucket"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.embedding_col = embedding_col
        self.out_col = out_col

    def code(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return bits.astype(np.int64) @ weights

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _as_matrix(t[self.embedding_col])
        return t.append_column(self.out_col,
                               pa.array(self.code(m), pa.int64()))


def _multiprobe_codes(code: int, margins: np.ndarray,
                      multiprobe: int) -> list[int]:
    """Multi-probe LSH perturbation sequence (Lv et al., VLDB'07):
    the ``multiprobe`` extra bucket codes most likely to hold missed
    neighbors, generated by flipping plane bits in increasing order of
    total |margin| (a small margin means the query sat near that
    hyperplane, so its neighbors plausibly landed on the other side).
    Heap-based subset enumeration — O(multiprobe log multiprobe)."""
    import heapq

    if multiprobe <= 0:
        return []
    order = np.argsort(margins)
    sm = margins[order]
    heap = [(float(sm[0]), (0,))]
    out: list[int] = []
    seen = set()
    while heap and len(out) < multiprobe:
        score, subset = heapq.heappop(heap)
        if subset in seen:
            continue
        seen.add(subset)
        c = code
        for i in subset:
            c ^= 1 << int(order[i])
        out.append(c)
        last = subset[-1]
        if last + 1 < len(sm):
            # "shift": replace the last flipped plane with the next one
            heapq.heappush(heap, (score - float(sm[last])
                                  + float(sm[last + 1]),
                                  subset[:-1] + (last + 1,)))
            # "expand": additionally flip the next plane
            heapq.heappush(heap, (score + float(sm[last + 1]),
                                  subset + (last + 1,)))
    return out


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
             seed: int = 1234, embedding_col: str = "embedding",
             key_col: str = "vec_id", multiprobe: int = 0) -> pa.Table:
    """Approximate top-k: bucket the corpus by LSH code, then
    brute-force only inside the buckets the queries land in.  With
    2^n_planes buckets this cuts the scanned fraction to ~2^-n_planes
    per query at some recall cost — the 100 TB path.

    ``multiprobe``: probe this many ADDITIONAL buckets per query
    (margin-ordered bit flips, see :func:`_multiprobe_codes`) — the
    recall knob.  Scanned fraction grows to ~(1 + multiprobe) /
    2^n_planes per query; measured recall-vs-scan tradeoff in
    tests/test_similarity_recall.py."""
    q = np.asarray(queries, dtype=np.float32)
    dim = q.shape[1]
    bucketer = LshBucketer(dim, n_planes, seed, embedding_col)
    qn = _normalize(q)
    q_codes = bucketer.code(qn)
    wanted = set(int(c) for c in q_codes)
    if multiprobe > 0:
        proj = qn @ bucketer.planes  # signed margins per plane
        for qi in range(len(qn)):
            wanted.update(_multiprobe_codes(int(q_codes[qi]),
                                            np.abs(proj[qi]), multiprobe))

    coded = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed,
                                   embedding_col=embedding_col),
        batch_format="pyarrow", concurrency=(1, 4))
    # restrict to wanted buckets with a vectorized batch filter
    import pyarrow.compute as pc

    wanted_arr = pa.array(sorted(wanted), pa.int64())
    candidates = coded.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted_arr)),
        batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, embedding_col, key_col)


def label_centroids(ds, label_col: str = "label",
                    embedding_col: str = "embedding"):
    """Per-label embedding centroid -> Dataset(label, dim, mean_val):
    the grouped VECTOR aggregate (class prototypes for IVF seeding,
    nearest-class-mean classification, drift-by-class monitoring).

    Emitted long-form (one row per (label, dim), dim 1-based to match
    SQL ``generate_subscripts``) so the result is flat-hashable and
    oracle-comparable.  Ragged-tolerant: each (label, dim) mean is over
    the vectors that HAVE that dim — identical to the SQL unnest
    semantics — so a few violation-length rows don't poison the whole
    aggregate.

    Shape: per batch, flatten the list column once (offsets -> dim
    index by ``arange - repeat(starts)``) and reduce to (label, dim,
    sum, count) partials via one lexsort+reduceat — the combiner; the
    exchange then carries only labels x dims rows per batch into ONE
    bounded final groupby.  Sums are float64 regardless of storage
    dtype so partial-merge order stays in the noise floor.
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "label": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "c": pa.array([], pa.int64())})
        t = t.filter(pc.and_(pc.is_valid(t[label_col]),
                             pc.is_valid(t[embedding_col])))
        if t.num_rows == 0:
            return empty
        col = t[embedding_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_fixed_size_list(col.type):
            d = col.type.list_size
            lens = np.full(len(col), d, np.int64)
            flat = col.values.slice(col.offset * d, len(col) * d)
        else:
            offsets = np.asarray(col.offsets, dtype=np.int64)
            lens = np.diff(offsets)
            flat = col.values.slice(int(offsets[0]),
                                    int(offsets[-1]) - int(offsets[0]))
        vals = np.asarray(flat.to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        if len(vals) == 0:
            return empty
        labels = np.repeat(
            t[label_col].to_numpy(zero_copy_only=False).astype(np.int64),
            lens)
        starts_per_row = np.concatenate(([0], np.cumsum(lens)[:-1]))
        dims = (np.arange(len(vals), dtype=np.int64)
                - np.repeat(starts_per_row, lens)) + 1
        order = np.lexsort((dims, labels))
        sl, sd, sv = labels[order], dims[order], vals[order]
        new = np.r_[True, (sl[1:] != sl[:-1]) | (sd[1:] != sd[:-1])]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(sv)])
        return pa.table({
            "label": pa.array(sl[starts], pa.int64()),
            "dim": pa.array(sd[starts], pa.int64()),
            "s": pa.array(np.add.reduceat(sv, starts), pa.float64()),
            "c": pa.array(sizes.astype(np.int64), pa.int64())})

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by(["label", "dim"]).aggregate(
            [("s", "sum"), ("c", "sum")])
        mean = pc.divide(g["s_sum"], pc.cast(g["c_sum"], pa.float64()))
        return pa.table({"label": g["label"], "dim": g["dim"],
                         "mean_val": mean,
                         "n_vectors": pc.cast(g["c_sum"], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(total, batch_format="pyarrow")


def kmeans_fit(ds, k: int = 8, iters: int = 10, seed: int = 1234,
               embedding_col: str = "embedding",
               init_sample: int = 4096) -> np.ndarray:
    """FULL-corpus Lloyd k-means (L2), distributed: unlike
    :func:`build_ivf_centroids` (sample-only), every iteration
    streams the whole dataset once — per batch, ONE matmul assigns
    vectors and a bincount/add.at reduces them to (k, d) partial sums
    + (k,) counts, so the exchange to the driver is k x d floats per
    BATCH regardless of corpus size (the mergeable-combiner shape;
    no shuffle).  Initialization is a deterministic sample;
    empty clusters keep their previous centroid.  Returns (k, d)
    float32 centroids (unnormalized means — pass through
    ``_normalize`` for cosine use)."""
    import ray

    mats = [_as_matrix(t[embedding_col]) for t in
            ds.limit(init_sample).iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows]
    x0 = np.vstack(mats).astype(np.float32)
    rng = np.random.default_rng(seed)
    k = min(k, len(x0))
    cent = x0[rng.choice(len(x0), k, replace=False)].copy()

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            m = _as_matrix(t[embedding_col]).astype(np.float32)
            d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) \
                + (c * c).sum(1)[None, :]
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(c, dtype=np.float64)
            np.add.at(sums, assign, m.astype(np.float64))
            counts = np.bincount(assign, minlength=len(c)) \
                .astype(np.int64)
            return pa.table({
                "cell": pa.array(np.arange(len(c)), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "s": pa.array(sums.tolist(), pa.list_(pa.float64())),
            })

        tot_n = np.zeros(k, np.int64)
        tot_s = np.zeros((k, cent.shape[1]), np.float64)
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                cells = b["cell"].to_numpy(zero_copy_only=False)
                np.add.at(tot_n, cells,
                          b["n"].to_numpy(zero_copy_only=False))
                s = np.stack(b["s"].to_pylist())
                np.add.at(tot_s, cells, s)
        nz = tot_n > 0
        cent = cent.astype(np.float64)
        cent[nz] = tot_s[nz] / tot_n[nz, None]
        cent = cent.astype(np.float32)
    return cent


def kmeans_assign(ds, centroids: np.ndarray,
                  embedding_col: str = "embedding",
                  out_col: str = "cluster"):
    """Append the nearest-centroid (L2) id; centroid matrix broadcast
    once via ray.put."""
    import ray

    ref = ray.put(centroids.astype(np.float32))

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _as_matrix(t[embedding_col]).astype(np.float32)
        d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) \
            + (c * c).sum(1)[None, :]
        return t.append_column(out_col,
                               pa.array(d2.argmin(axis=1), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def semantic_dedup_keep(ds, threshold: float = 0.9, k: int = 8,
                        iters: int = 10, seed: int = 1234,
                        embedding_col: str = "embedding",
                        key_col: str = "vec_id",
                        num_shards: int | None = None):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    k-means partitions the corpus, near-duplicate candidates are found
    ONLY within a cluster, and one key per duplicate component is kept.

    Composition of existing primitives — nothing new touches the
    driver:

    1. :func:`kmeans_fit` (shuffle-free Lloyd, k x d combiner) +
       :func:`kmeans_assign` (broadcast centroids) label every vector.
    2. One ``groupby(cluster)`` co-locates each cluster; a per-group
       matmul emits (key_a, key_b) cosine pairs >= threshold with a
       PINNED Arrow schema.  Pairwise work is O(sum g_i^2 d) — the
       SemDeDup bargain: choose k so the largest cluster fits a task
       (~n/k vectors); the all-pairs matrix never spans clusters.
    3. :func:`~pyschema_ray.functions.dedup.connected_components`
       (min-label propagation) closes transitive duplicate chains;
       keys whose component label differs from their own key are
       dropped via one ANTI join — keep-smallest-key semantics,
       deterministic regardless of batch or cluster order.

    Returns a Dataset of kept rows ``(key_col,)``.
    """
    from .dedup import connected_components
    from .relational import anti_join

    cent = kmeans_fit(ds, k=k, iters=iters, seed=seed,
                      embedding_col=embedding_col)
    labeled = kmeans_assign(ds, cent, embedding_col=embedding_col)

    def cluster_pairs(t: pa.Table) -> pa.Table:
        kt = t.schema.field(key_col).type
        if t.num_rows < 2:
            return pa.table({"key_a": pa.array([], kt),
                             "key_b": pa.array([], kt)})
        m = _normalize(_as_matrix(t[embedding_col]))
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False))
        sims = m @ m.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        ka, kb = keys[ai], keys[bi]
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        return pa.table({"key_a": pa.array(lo, type=kt, from_pandas=True),
                         "key_b": pa.array(hi, type=kt, from_pandas=True)})

    pairs = labeled.groupby("cluster").map_groups(
        cluster_pairs, batch_format="pyarrow")
    comp = connected_components(pairs, num_shards=num_shards)

    def drops(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["label"])
        return t.filter(pc.fill_null(keep, False)).select(["node"])

    drop_ds = comp.map_batches(drops, batch_format="pyarrow")
    keys_only = ds.select_columns([key_col])
    return anti_join(keys_only, drop_ds, key_col, "node",
                     num_shards=num_shards)


def centroid_shift(ds, group_col: str = "label",
                   emb_col: str = "embedding",
                   scale: float = 1_000_000.0):
    """Per-group embedding centroid drift: the L2 distance between
    each group's mean vector and the GLOBAL mean vector — the
    representation-shift score behind domain-mix monitoring.  Every
    component is quantized to round(x * scale) int64 BEFORE summing
    (the repo's exact-integer discipline), the per-group/dim sums ride
    a (groups x d)-row exchange, and the distance numerators
    ``s_gd * N - S_d * n_g`` are formed in arbitrary-precision Python
    ints — so the only float ops are one sqrt and one division,
    bit-identical to the HUGEINT SQL oracle.  Magnitude contract:
    ``(s * N)^2 * d`` within HUGEINT (~1e38) for the oracle's sake.

    Requires uniform embedding length; null group/embedding rows are
    dropped.  -> pa.table(group_col int64, n int64, shift float64)
    sorted by group.
    """
    import math

    import ray.data.aggregate as A

    def _round_half_away(a: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(a) + 0.5), a)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[emb_col])))
        empty = pa.table({"g": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        col = t[emb_col].combine_chunks() \
            if isinstance(t[emb_col], pa.ChunkedArray) else t[emb_col]
        offs = np.asarray(col.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if len(np.unique(lens)) != 1:
            raise ValueError("centroid_shift requires uniform "
                             "embedding length")
        d = int(lens[0])
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = _round_half_away(flat * scale).astype(np.int64) \
            .reshape(-1, d)
        g = pc.cast(t[group_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        from .dedup import _group_starts
        starts, sizes = _group_starts(g[order])
        sums = np.add.reduceat(q[order], starts, axis=0)
        glab = g[order][starts]
        rows_g = np.repeat(glab, d)
        rows_dim = np.tile(np.arange(1, d + 1, dtype=np.int64),
                           len(glab))
        out = pa.table({
            "g": pa.array(rows_g, pa.int64()),
            "dim": pa.array(rows_dim, pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64())})
        counts = pa.table({
            "g": pa.array(glab, pa.int64()),
            "dim": pa.array(np.full(len(glab), -1, np.int64)),
            "s": pa.array(sizes.astype(np.int64), pa.int64())})
        return pa.concat_tables([out, counts])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["g", "dim"]).aggregate(A.Sum("s"))
    rows = [b for b in agg.iter_batches(batch_format="pyarrow",
                                        batch_size=None) if b.num_rows]
    if not rows:
        return pa.table({group_col: pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "shift": pa.array([], pa.float64())})
    t = pa.concat_tables(rows)
    gv = t["g"].to_pylist()
    dv = t["dim"].to_pylist()
    sv = pc.cast(t["sum(s)"], pa.int64()).to_pylist()
    n_g: dict = {}
    s_gd: dict = {}
    for g, dim, s in zip(gv, dv, sv):
        if dim == -1:
            n_g[g] = n_g.get(g, 0) + s
        else:
            s_gd[(g, dim)] = s_gd.get((g, dim), 0) + s
    dims = sorted({dim for _, dim in s_gd})
    N = sum(n_g.values())
    S_d = {dim: sum(s_gd.get((g, dim), 0) for g in n_g)
           for dim in dims}
    glabels, ns, shifts = [], [], []
    for g in sorted(n_g):
        tot = 0
        for dim in dims:
            num = s_gd.get((g, dim), 0) * N - S_d[dim] * n_g[g]
            tot += num * num                      # exact python ints
        shift = math.sqrt(float(tot)) \
            / (float(n_g[g]) * float(N) * scale)
        glabels.append(g)
        ns.append(n_g[g])
        shifts.append(shift)
    return pa.table({group_col: pa.array(glabels, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "shift": pa.array(shifts, pa.float64())})
