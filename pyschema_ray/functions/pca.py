"""Distributed PCA over an embedding column.

One pass of per-batch EXACT-INTEGER Gram partials (embeddings
milli-quantized, so Σx and Σxxᵀ are int64 — the partials commute
bit-for-bit under any block split, unlike float sums), a driver-side
d×d eigendecomposition (d is the embedding width — tiny), and an
optional actor-pool projection scan with the components broadcast
once.  The decomposition cost is O(d³) ONCE; the data cost is one
streaming scan regardless of corpus size.

Magnitude contract: n · (1000·max|x|)² < 2^63 — at 10^12 vectors of
unit scale that is ~9e18, right at the boundary; shard the Gram into
per-block Python-int folds (the partials are per-batch rows already)
or drop quantization to 100 µunits when n approaches 10^12.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _round_half_away


def _embedding_matrix(t: pa.Table, col: str) -> np.ndarray:
    a = t[col]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if pa.types.is_fixed_size_list(a.type):
        d = a.type.list_size
        return np.asarray(a.values.to_numpy(zero_copy_only=False),
                          np.float64).reshape(-1, d)
    offs = a.offsets.to_numpy(zero_copy_only=False)
    d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return np.asarray(a.values.to_numpy(zero_copy_only=False),
                      np.float64).reshape(-1, d)


def pca_fit(ds, col: str = "embedding", k: int = 4):
    """Fit PCA: returns {"mean_milli", "cov_num", "n", "eigvals",
    "components"} where cov_num is the EXACT integer
    n·Σxxᵀ - (Σx)(Σx)ᵀ numerator in milli² units (covariance =
    cov_num / (1000² · n²) with the biased 1/n convention) and
    eigvals/components come from one d×d eigh on it."""
    def partial(t: pa.Table) -> pa.Table:
        x = _embedding_matrix(t, col)
        if x.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.binary()),
                             "sxx": pa.array([], pa.binary())})
        xm = _round_half_away(x * 1000.0).astype(np.int64)
        sx = xm.sum(axis=0)
        sxx = xm.T @ xm  # int64 exact under the magnitude contract
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "sx": pa.array([sx.tobytes()], pa.binary()),
            "sxx": pa.array([sxx.tobytes()], pa.binary())})

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return None
    pt = pa.concat_tables(parts)
    n = int(pc.sum(pt["n"]).as_py())
    sx = None
    sxx = None
    for row_sx, row_sxx in zip(pt["sx"].to_pylist(),
                               pt["sxx"].to_pylist()):
        a = np.frombuffer(row_sx, np.int64)
        b = np.frombuffer(row_sxx, np.int64)
        sx = a if sx is None else sx + a
        sxx = b if sxx is None else sxx + b
    d = len(sx)
    sxx = sxx.reshape(d, d)
    # integer numerator of the (biased) covariance: n*Sxx - Sx Sxᵀ —
    # object dtype keeps the outer product exact for any n
    cov_num = (n * sxx.astype(object)
               - np.multiply.outer(sx.astype(object), sx.astype(object)))
    cov = (cov_num / (1_000_000.0 * n * n)).astype(np.float64)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return {"mean_milli": sx / n, "n": n,
            "eigvals": w[order], "components": v[:, order].T,
            "total_var": float(w.sum())}


def pca_project(ds, model, col: str = "embedding",
                key_col: str = "vec_id", concurrency=(1, 4)):
    """Project vectors onto the fitted components (actor pool,
    components broadcast once).  -> Dataset(key, pc1.., pck)."""
    import ray

    ref = ray.put((model["mean_milli"], model["components"]))

    class Projector:
        def __init__(self):
            self.mean_milli, self.comp = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ktype = t.schema.field(key_col).type
            k = self.comp.shape[0]
            if t.num_rows == 0:
                cols = {key_col: pa.array([], ktype)}
                for i in range(k):
                    cols[f"pc{i + 1}"] = pa.array([], pa.float64())
                return pa.table(cols)
            x = _round_half_away(
                _embedding_matrix(t, col) * 1000.0)
            proj = (x - self.mean_milli) @ self.comp.T / 1000.0
            cols = {key_col: t[key_col]}
            for i in range(k):
                cols[f"pc{i + 1}"] = pa.array(proj[:, i], pa.float64())
            return pa.table(cols)

    return ds.map_batches(Projector, batch_format="pyarrow",
                          concurrency=concurrency)
