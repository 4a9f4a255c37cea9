"""Deterministic sampling operators for corpus curation.

All samplers here are hash- (or mod-) deterministic per ROW: the same
row is kept or dropped regardless of partitioning, worker count, or
execution order — the property a resumable 100-TB pipeline needs (Ray's
``random_sample`` is seed-per-block and changes with repartitioning).
Each is a stateless ``map_batches`` filter: no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _key_hash

_U64_SPAN = float(1 << 64)


def hash_sample(ds, key_col: str = "doc_id", fraction: float = 0.1,
                seed: int = 0):
    """Keep rows where hash(key, seed) < fraction·2^64 — a uniform,
    deterministic ``fraction`` sample keyed on the row's identity.
    Different seeds give independent samples (e.g. train/holdout
    splits that remain disjoint under re-runs: disjoint fraction
    intervals of the SAME seed give exact disjointness)."""
    threshold = np.uint64(min(int(fraction * _U64_SPAN), (1 << 64) - 1))

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow")


def mod_sample(ds, key_col: str = "doc_id", modulus: int = 10,
               keep_residues=(0,)):
    """Keep rows where key % modulus ∈ keep_residues (integer keys).
    Less uniform than :func:`hash_sample` for structured keys, but
    exactly expressible in SQL — the oracle-checkable cousin."""
    keep = np.asarray(sorted(set(keep_residues)), dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(k % modulus, keep)))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, strata_col: str, fractions: dict,
                      key_col: str = "doc_id", seed: int = 0,
                      default_fraction: float = 0.0):
    """Per-stratum deterministic sampling: keep each row with its
    stratum's fraction (e.g. down-weight an over-represented source in
    a training mixture).  ``fractions`` = {stratum_value: fraction};
    strata not listed use ``default_fraction``.  Row-deterministic
    like :func:`hash_sample`; no shuffle (the stratum column is read
    per batch, never grouped)."""
    fr = dict(fractions)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        strata = t[strata_col].to_pylist()
        thresh = np.array(
            [min(int(fr.get(s, default_fraction) * _U64_SPAN),
                 (1 << 64) - 1) for s in strata], dtype=np.uint64)
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(f, batch_format="pyarrow")


_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def knuth_bucket(keys: np.ndarray) -> np.ndarray:
    """SQL-reproducible 32-bit multiplicative hash of integer keys:
    ``(((key % 2^32) + 2^32) % 2^32 * 2654435761) % 2^32`` — Knuth's
    constant with a SIGN-NORMALIZED mod.  The numpy path below views
    negative keys through two's complement, which equals the
    nonnegative ``key mod 2^32``; SQL's ``%`` returns NEGATIVE
    remainders for negative keys, so the oracle expression must use
    the double-mod form above (for nonnegative keys the two agree and
    the plain ``(key % 2^32) * C % 2^32`` suffices).  Runs in DuckDB
    with HUGEINT arithmetic, so a split assignment is bit-identical
    in both engines (unlike the keyed SipHash used elsewhere, which
    SQL cannot reproduce).  The uint64 intermediate cannot overflow:
    (2^32-1) * 2654435761 < 2^64.
    """
    k = np.asarray(keys).astype(np.int64).view(np.uint64)
    return (k % _M32 * _KNUTH) % _M32


def split_assign_batch(t: pa.Table, key_col: str = "doc_id",
                       thresholds: tuple[float, ...] = (0.8, 0.9),
                       names: tuple[str, ...] = ("train", "val", "test"),
                       out_col: str = "split") -> pa.Table:
    """Append a deterministic train/val/test split label.  Row r goes
    to ``names[i]`` where i is the first threshold with
    ``knuth_bucket(key) < floor(threshold * 2^32)`` (integer compare —
    no float boundary ambiguity).  Null keys are labeled
    ``names[-1]`` (stated in the oracle contract)."""
    assert len(names) == len(thresholds) + 1
    keys_col = t[key_col]
    import pyarrow.compute as pc
    valid = pc.is_valid(keys_col).to_numpy(zero_copy_only=False)
    h = np.zeros(len(t), np.uint64)
    if valid.any():
        vk = pc.drop_null(keys_col).to_numpy(zero_copy_only=False)
        h[valid] = knuth_bucket(vk)
    cuts = np.array([int(th * (1 << 32)) for th in thresholds],
                    np.uint64)
    idx = np.searchsorted(cuts, h, side="right")
    idx[~valid] = len(thresholds)
    lab = np.asarray(names, object)[idx]
    return t.append_column(out_col, pa.array(lab, pa.string()))


def split_stats(ds, key_col: str = "doc_id", weight_col: str = "n_chars",
                thresholds: tuple[float, ...] = (0.8, 0.9),
                names: tuple[str, ...] = ("train", "val", "test")):
    """-> Dataset(split, n_rows, total_weight): deterministic split
    assignment + per-split row and weight totals in one pass (per-batch
    combiner, one bounded 3-row final groupby) — the
    train/val/test-manifest sanity report."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        t = split_assign_batch(t, key_col, thresholds, names)
        w = pc.cast(pc.fill_null(t[weight_col], 0), pa.int64())
        g = pa.table({"split": t["split"], "w": w}) \
            .group_by(["split"]).aggregate([([], "count_all"),
                                            ("w", "sum")])
        return g.select(["split", "count_all", "w_sum"]) \
            .rename_columns(["split", "n_rows", "total_weight"])

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by(["split"]).aggregate(
            [("n_rows", "sum"), ("total_weight", "sum")])
        g = g.select(["split", "n_rows_sum", "total_weight_sum"]) \
            .rename_columns(["split", "n_rows", "total_weight"])
        for c in ("n_rows", "total_weight"):
            g = g.set_column(g.schema.get_field_index(c), c,
                             pc.cast(g[c], pa.int64()))
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(total, batch_format="pyarrow")


def grouped_sample(ds, group_col: str, key_col: str = "doc_id",
                   k: int = 5, num_shards: int | None = None):
    """Deterministic k-per-group sample -> the k rows of each group
    with the SMALLEST (knuth_bucket(key), key) — partition-invariant,
    re-runnable, and SQL-reproducible (row_number() OVER (PARTITION BY
    group ORDER BY hash, key) <= k), unlike reservoir sampling whose
    result depends on encounter order.

    Shape: per-batch partial head (each block shrinks to <= k rows per
    group before the exchange — the combiner), then one bounded
    group-hash shard groupby takes the global per-group head.  The
    shuffle carries at most k x groups x blocks rows.
    """
    import pyarrow.compute as pc

    from .dedup import _default_shards, _group_starts, _key_shards

    nb = num_shards or _default_shards()

    def _head(t: pa.Table) -> pa.Table:
        t = t.sort_by([(group_col, "ascending"), ("hkey", "ascending"),
                       (key_col, "ascending")])
        groups = t[group_col].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(groups)
        rank = np.arange(len(groups)) - np.repeat(starts, sizes)
        return t.take(np.flatnonzero(rank < k))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[key_col])))
        h = knuth_bucket(t[key_col].to_numpy(zero_copy_only=False))
        t = t.append_column("hkey", pa.array(h.astype(np.int64),
                                             pa.int64()))
        t = _head(t)
        shard = _key_shards(t[group_col].to_numpy(zero_copy_only=False),
                            nb, 89)
        return t.append_column("gshard", pa.array(shard, pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        return _head(t).drop_columns(["hkey", "gshard"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(final, batch_format="pyarrow")


def grouped_sample_k_map(ds, group_col: str, k_by_group: dict,
                         key_col: str = "doc_id",
                         num_shards: int | None = None):
    """:func:`grouped_sample` with a PER-GROUP budget: keep the
    ``k_by_group[g]`` rows of each group with the smallest
    (knuth_bucket(key), key); groups absent from the map are dropped.
    Same combiner + bounded group-hash exchange; the budget map is
    group-cardinality-sized and ships in the task closure (broadcast
    it via ray.put at 10^6+ groups)."""
    import pyarrow.compute as pc

    from .dedup import _default_shards, _group_starts, _key_shards

    nb = num_shards or _default_shards()
    groups_sorted = np.array(sorted(k_by_group), dtype=object)
    ks_sorted = np.array([k_by_group[g] for g in groups_sorted],
                         np.int64)

    def _head(t: pa.Table) -> pa.Table:
        t = t.sort_by([(group_col, "ascending"), ("hkey", "ascending"),
                       (key_col, "ascending")])
        groups = t[group_col].to_numpy(zero_copy_only=False)
        starts, sizes = _group_starts(groups)
        rank = np.arange(len(groups)) - np.repeat(starts, sizes)
        gi = np.searchsorted(groups_sorted, groups)
        gi = np.minimum(gi, len(groups_sorted) - 1)
        known = groups_sorted[gi] == groups if len(groups_sorted) \
            else np.zeros(len(groups), bool)
        kk = np.where(known, ks_sorted[gi], 0)
        return t.take(np.flatnonzero(rank < kk))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[key_col])))
        h = knuth_bucket(t[key_col].to_numpy(zero_copy_only=False))
        t = t.append_column("hkey", pa.array(h.astype(np.int64),
                                             pa.int64()))
        t = _head(t)
        shard = _key_shards(t[group_col].to_numpy(zero_copy_only=False),
                            nb, 89)
        return t.append_column("gshard", pa.array(shard, pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        return _head(t).drop_columns(["hkey", "gshard"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gshard").map_groups(final, batch_format="pyarrow")


def temperature_sample(ds, group_col: str = "source",
                       key_col: str = "doc_id", scale: int = 4,
                       num_shards: int | None = None):
    """Temperature-flattened mixture resampling (alpha = 0.5): keep
    ``m_g = min(n_g, scale * isqrt(n_g))`` documents of each group —
    dominant sources are downsampled ~proportionally to sqrt(n) while
    small sources survive intact, the standard multi-source rebalance
    before training-data packing (cf. multilingual sampling with
    p ~ n^alpha).  All arithmetic is INTEGER (``math.isqrt``, Knuth
    hash ranks), so the selection is bit-reproducible by a SQL window
    function — no float pow at a keep/drop boundary.

    One counting pass (per-batch value_counts combiner, driver gets
    the group-cardinality-sized table), then ONE
    :func:`grouped_sample_k_map` pass.  -> Dataset rows of the kept
    documents (all input columns)."""
    import math

    import pyarrow.compute as pc

    def counts(t: pa.Table) -> pa.Table:
        col = t.filter(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[key_col])))[group_col]
        vc = col.combine_chunks().value_counts()
        return pa.table({
            group_col: vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    partials = [b for b in
                ds.map_batches(counts, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    k_map: dict = {}
    if partials:
        tot = pa.concat_tables(partials).group_by(group_col) \
            .aggregate([("n", "sum")])
        for g, n in zip(tot[group_col].to_pylist(),
                        tot["n_sum"].to_pylist()):
            k_map[g] = min(int(n), scale * math.isqrt(int(n)))
    return grouped_sample_k_map(ds, group_col, k_map, key_col,
                                num_shards)


def weighted_sample_keys(ds, key_col: str = "doc_id",
                         weight_col: str = "n_chars", k: int = 100,
                         seed: int = 0) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): each row draws a deterministic uniform
    ``u = hash(key, seed) / 2^64`` and scores ``u^(1/w)``; the global
    top-k scores are the sample, so heavier rows win proportionally
    more often and the SAME rows are chosen regardless of
    partitioning, worker count, or execution order (the resumability
    contract of this module).

    Shape: per-batch top-k partials (one vectorized pass; ties broken
    by key), driver merges k x batches candidate rows — no shuffle,
    no state.  Log-domain scoring (``log(u)/w``) avoids underflow for
    large weights.  Rows with null key, null weight, or weight <= 0
    are excluded (zero-weight rows can never be sampled).

    Returns pa.table(key_col, weight int64, score float64) of the k
    winners, score-descending.
    """
    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        w = pc.cast(t[weight_col], pa.float64())
        ok = pc.and_(pc.is_valid(keys),
                     pc.and_(pc.is_valid(w),
                             pc.greater(pc.fill_null(w, 0.0), 0.0)))
        t2 = pa.table({"k": keys, "w": w}).filter(ok)
        kt = t2.schema.field("k").type
        if t2.num_rows == 0:
            return pa.table({key_col: pa.array([], kt),
                             "weight": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        kn = t2["k"].to_numpy(zero_copy_only=False)
        wn = t2["w"].to_numpy(zero_copy_only=False)
        h = _key_hash(kn, seed).astype(np.float64)
        # u in (0,1): offset by 0.5 so u is never exactly 0
        u = (h + 0.5) / _U64_SPAN
        score = np.log(u) / wn  # monotone transform of u^(1/w)
        kk = min(k, len(score))
        idx = np.argpartition(-score, kk - 1)[:kk]
        return pa.table({
            key_col: pa.array(kn[idx], type=kt, from_pandas=True),
            "weight": pa.array(wn[idx].astype(np.int64), pa.int64()),
            "score": pa.array(score[idx], pa.float64()),
        })

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return pa.table({key_col: pa.array([], pa.int64()),
                         "weight": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    merged = pa.concat_tables(parts)
    order = pc.sort_indices(
        merged, sort_keys=[("score", "descending"),
                           (key_col, "ascending")])
    return merged.take(order).slice(0, k)


def epoch_shuffle_positions(ds, key_col: str = "doc_id",
                            seed: int = 0,
                            num_shards: int | None = None):
    """Deterministic epoch shuffle: assign every key a GLOBAL shuffled
    position (0..n-1) for epoch ``seed`` — the reproducible
    alternative to ``random_shuffle`` a training loader needs (same
    seed -> same order on any cluster size; different seed -> a fresh
    permutation).  Order key is the seeded Knuth hash
    ``((key + seed) mod 2^32) * 2654435761 mod 2^32`` broken by the
    key itself, so the full order is SQL-reproducible
    (``row_number() OVER (ORDER BY hk, key) - 1``).

    NO global sort operator: the hash's HIGH bits range-partition the
    corpus into ``num_shards`` contiguous hash intervals, so global
    rank = (sum of lower-shard counts) + local rank.  Pass 1 counts
    per shard (O(shards) to the driver); pass 2 sorts WITHIN each
    shard only and adds the broadcast base offsets.  Each exchange
    carries (key, hash) pairs, never payload columns.

    -> Dataset(key_col, position).  Null keys are dropped.
    """
    from .dedup import _default_shards

    nb = num_shards or _default_shards()
    width = (int(_M32) + nb - 1) // nb

    def hashed(t: pa.Table) -> pa.Table:
        col = t.filter(pc.is_valid(t[key_col]))[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = np.asarray(col.to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        h = (((k.view(np.uint64) + np.uint64(seed)) % _M32)
             * _KNUTH % _M32)
        return pa.table({
            "rshard": pa.array((h // np.uint64(width)).astype(np.int64),
                               pa.int64()),
            "hk": pa.array(h.astype(np.int64), pa.int64()),
            key_col: col,
        })

    hashed_ds = ds.map_batches(hashed, batch_format="pyarrow")

    def shard_counts(t: pa.Table) -> pa.Table:
        vc = t["rshard"].combine_chunks().value_counts()
        return pa.table({
            "rshard": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = np.zeros(nb, np.int64)
    for b in hashed_ds.map_batches(shard_counts,
                                   batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            # np.add.at: a block may repeat an rshard (one row per
            # upstream batch) and fancy += drops duplicate indices
            np.add.at(counts,
                      b["rshard"].to_numpy(zero_copy_only=False),
                      b["n"].to_numpy(zero_copy_only=False))
    bases = np.r_[np.int64(0), np.cumsum(counts)[:-1]]

    def rank_shard(t: pa.Table) -> pa.Table:
        sid = int(t["rshard"][0].as_py())
        t = t.sort_by([("hk", "ascending"), (key_col, "ascending")])
        pos = bases[sid] + np.arange(t.num_rows, dtype=np.int64)
        return pa.table({key_col: t[key_col],
                         "position": pa.array(pos, pa.int64())})

    return hashed_ds.groupby("rshard") \
        .map_groups(rank_shard, batch_format="pyarrow")


def water_fill(avail: dict, budget: int) -> dict:
    """Exact integer water-filling: split ``budget`` units across
    groups as equally as possible without exceeding any group's
    availability.  Small groups take everything they have; the slack
    re-spreads over the rest; integer floor residue goes +1 per group
    in sorted-name order.  Deterministic, order-independent input.
    Returns {group: allocation}."""
    names = sorted(avail)
    alloc = {g: 0 for g in names}
    remaining = int(budget)
    # process smallest availability first: once the equal share
    # exceeds a group's supply, that group is simply capped
    for idx, g in enumerate(sorted(names, key=lambda g: (avail[g], g))):
        n_left = len(names) - idx
        share = remaining // n_left
        take = min(int(avail[g]), share)
        alloc[g] = take
        remaining -= take
    if remaining > 0:
        # floor residue: +1 per uncapped group in name order
        for g in names:
            if remaining == 0:
                break
            if alloc[g] < avail[g]:
                extra = min(int(avail[g]) - alloc[g], 1)
                alloc[g] += extra
                remaining -= extra
    return alloc


def token_budget_allocation(ds, budget_tokens: int,
                            group_col: str = "source",
                            text_col: str = "text"):
    """Training-mixture planning: count whitespace tokens per group in
    one streaming pass (the lm.py tokenization, so budgets line up
    with every other token-counting operator), then water-fill an
    exact integer token budget across groups — equal shares, capped
    by supply, deterministic residue handling (:func:`water_fill`).

    The distributed part is the per-group token-total groupby (tiny
    combiner partials); the allocation itself is O(groups log groups)
    driver math.  Iterative allocation is not SQL-expressible —
    rows-only at the driver gate, reference-tested in pytest.

    -> pa.table(group_col string, tokens_available int64,
       tokens_allocated int64) sorted by group.
    """
    import ray.data.aggregate as A

    from .lm import _word_hashes

    def partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        _wh, offs = _word_hashes(t[text_col])
        cnt = np.diff(offs)
        out = pa.table({"g": g, "n": pa.array(cnt, pa.int64())}) \
            .filter(pc.is_valid(g))
        gg = out.group_by("g").aggregate([("n", "sum")])
        return pa.table({"g": gg["g"],
                         "n": pc.cast(gg["n_sum"], pa.int64())})

    rows = [b for b in ds.map_batches(partial, batch_format="pyarrow")
            .groupby("g").aggregate(A.Sum("n"))
            .iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows]
    if not rows:
        return pa.table({group_col: pa.array([], pa.string()),
                         "tokens_available": pa.array([], pa.int64()),
                         "tokens_allocated": pa.array([], pa.int64())})
    t = pa.concat_tables(rows)
    avail = dict(zip(t["g"].to_pylist(),
                     pc.cast(t["sum(n)"], pa.int64()).to_pylist()))
    alloc = water_fill(avail, budget_tokens)
    names = sorted(avail)
    return pa.table({
        group_col: pa.array(names, pa.string()),
        "tokens_available": pa.array([avail[g] for g in names],
                                     pa.int64()),
        "tokens_allocated": pa.array([alloc[g] for g in names],
                                     pa.int64())})
