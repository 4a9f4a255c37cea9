"""Record linkage: blocked fuzzy self-join on short name strings.

The classic linkage shape (Fellegi & Sunter 1969 framing; blocking +
verify as in any dedupe system — public method), made DEDUP-FIRST:

1. **Distinct reduction**: duplicate-heavy tables make any
   instance-level blocked join quadratic in the duplicate-group
   size, so names are first reduced to DISTINCT normalized strings
   (128-bit two-SipHash gid) with member counts; the text-free
   member table (gid, key) rides along exchange-free.
2. **Blocking**: each DISTINCT name emits one row per lowercased
   word (the block key).  Blocks co-locate on a bounded word-hash
   shard; candidates are the block's length-banded triangular pairs
   (``|len a - len b| <= max_dist``, an exact filter), so names
   sharing NO word are never compared — the O(n^2) cross join never
   happens.  ``max_block`` caps block size in INSTANCES.
3. **Verify**: edit distance computed VECTORIZED ACROSS PAIRS inside
   the word-shard group (one (n_pairs,) row per character step for
   the DP; an O(L) prefix/suffix one-edit characterization when
   ``max_dist == 1``) — never a per-pair Python loop, never a text
   payload on an exchange.
4. **Expand**: surviving (gid_a, gid_b, dist) pairs are deduped on
   one integer exchange and walked through the member table twice to
   re-inflate key pairs — output-sized work with no verification.

Oracle: DuckDB's ``levenshtein()`` reproduces the verify exactly, and
the blocking predicate (share >= 1 word) is expressible with
list_has_any over regexp_split_to_array — the whole operator is
SQL-checkable.

Blocking contract at scale: a word shared by B records produces
candidate work quadratic in the block's DISTINCT-name count;
stopword-like block keys must be capped or stoplisted upstream
(``max_block``, counted in instances, mirroring winnow_candidates'
documented cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import (_default_shards, _group_starts, _key_hash,
                    _key_shards)


def levenshtein_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Levenshtein distances for aligned string arrays, vectorized
    ACROSS pairs: strings become padded codepoint matrices and the DP
    advances one (n_pairs,)-wide row per character cell — O(L1*L2)
    numpy steps regardless of pair count."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    ma, la, mb, lb = _codepoint_mats(a, b)
    L1, L2 = ma.shape[1], mb.shape[1]
    # dp[j] = edit distance between a[:i] and b[:j], per pair —
    # int64 so the prefix-min rewrite below may go negative safely
    dp = np.broadcast_to(np.arange(L2 + 1, dtype=np.int64),
                         (n, L2 + 1)).copy()
    jb = np.arange(L2, dtype=np.int64)
    for i in range(L1):
        alive = la > i                       # pairs still consuming a
        prev = dp
        d0 = prev[:, 0] + 1
        sub = prev[:, :-1] + (ma[:, i:i + 1] != mb).astype(np.int64)
        ins = prev[:, 1:] + 1
        best = np.minimum(sub, ins)
        # the left-to-right delete scan dp[j+1] = min(best[j],
        # dp[j] + 1) is a prefix-min recurrence: dp[j+1] =
        # min(min_{k<=j}(best[k] + j - k), d0 + j + 1)
        run = np.minimum.accumulate(best - jb, axis=1) + jb
        nxt = np.empty_like(prev)
        nxt[:, 0] = d0
        nxt[:, 1:] = np.minimum(run, (d0 + 1)[:, None] + jb)
        dp = np.where(alive[:, None], nxt, prev)
    return dp[np.arange(n), lb].astype(np.int64)


def _codepoint_mats(a: np.ndarray, b: np.ndarray):
    """Aligned object-string arrays -> padded uint32 codepoint
    matrices + length vectors (shared by both verifiers)."""
    n = len(a)

    def to_mat(arr):
        lens = np.fromiter((len(s) for s in arr), np.int64, n)
        lmax = int(lens.max()) if n else 0
        m = np.zeros((n, max(lmax, 1)), np.uint32)
        cat = "".join(arr)
        flat = np.frombuffer(cat.encode("utf-32-le"), np.uint32)
        pos = np.arange(len(flat)) - np.repeat(
            np.cumsum(lens) - lens, lens)
        m[np.repeat(np.arange(n), lens), pos] = flat
        return m, lens

    ma, la = to_mat(a)
    mb, lb = to_mat(b)
    return ma, la, mb, lb


def one_edit_distance_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact edit distances CLAMPED at 2 (0, 1, or 2 meaning ">1"),
    vectorized across pairs in O(n x Lmax) — no DP.  Uses the classic
    one-edit characterization: ED <= 1 iff |la-lb| <= 1 and
    longest-common-prefix + longest-common-suffix covers all but at
    most the one edited position."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    ma, la, mb, lb = _codepoint_mats(a, b)
    lmin = np.minimum(la, lb)
    width = max(int(lmin.max()), 1)
    j = np.arange(width, dtype=np.int64)[None, :]
    valid = j < lmin[:, None]
    # lcp = length of the leading all-equal run over VALID positions
    # (rows whose whole overlap matches have an all-True masked row,
    # where argmin would wrongly return 0 — map them to lmin)
    eq_f = (ma[:, :width] == mb[:, :width]) | ~valid
    lcp = np.where(eq_f.all(axis=1), lmin, np.argmin(eq_f, axis=1))
    rows = np.arange(n)[:, None]
    ra = ma[rows, np.maximum(la[:, None] - 1 - j, 0)]
    rb = mb[rows, np.maximum(lb[:, None] - 1 - j, 0)]
    eq_b = (ra == rb) | ~valid
    lcs = np.where(eq_b.all(axis=1), lmin, np.argmin(eq_b, axis=1))
    diff = np.abs(la - lb)
    zero = (diff == 0) & (lcp == la) & (la == lb)
    one = ~zero & (
        ((diff == 1) & (lcp + lcs >= lmin))
        | ((diff == 0) & (lcp + lcs >= la - 1)))
    return np.where(zero, 0, np.where(one, 1, 2)).astype(np.int64)


def fuzzy_name_pairs(ds, name_col: str = "p_name",
                     key_col: str = "p_partkey", max_dist: int = 3,
                     num_shards: int | None = None,
                     max_block: int = 200,
                     size_hint_rows: int | None = None,
                     small_rows_threshold: int = 250_000):
    """Dataset(key_a, key_b, dist): unordered record pairs whose
    names share >= 1 word AND are within ``max_dist`` edits.  Blocks
    larger than ``max_block`` records are dropped (boilerplate
    words); the cap is part of the operator contract, not silent.

    ADAPTIVE like the dedup verifies: record linkage runs on
    dimension-shaped tables whose (key, name) projection is often
    tiny next to the fact data, and the distributed plan below pays
    five fixed-cost exchanges regardless of size.  When the CALLER
    certifies the row count via ``size_hint_rows`` (parquet metadata
    — never a count() pass) and it is at most
    ``small_rows_threshold``, the same phase functions run once on
    the driver over the collected projection: zero exchanges,
    byte-identical answer (the phases are pure functions shared by
    both paths).  No hint, or a hint above the threshold, runs the
    distributed plan — the 100 TB default.

    DEDUP-FIRST: real tables repeat names, and every instance-level
    blocked join is quadratic in the duplicate-group size, so the
    expensive phases here run over DISTINCT normalized names and the
    answer is re-inflated afterwards — verification cost scales with
    distinct names, never rows:

    1. **Distinct reduction** — one bounded gid-shard exchange builds
       ``(gid, name, cnt)``; gid is the 128-bit two-SipHash content
       identity (the ``dedup_exact`` convention, sketches.py).  The
       text-free member table ``(gid, key)`` needs no exchange at all.
    2. **Blocking + verify over distinct names only** — word blocks
       count INSTANCES (``sum cnt``) for the ``max_block`` contract;
       candidates are banded by name length (exact: ``|len a - len b|
       > max_dist`` implies ``dist > max_dist``) and verified
       vectorized in-group (O(L) one-edit characterization for
       ``max_dist == 1``, pairs-DP otherwise).  An identical-name
       group (``cnt >= 2``) in any surviving block emits a
       ``(gid, gid, 0)`` self pair — same co-occurrence rule its
       instance pairs satisfied.
    3. **gid-pair DISTINCT, then expansion** — two tagged integer
       exchanges walk ``(gid_a, gid_b, dist)`` through the member
       table; this is output-sized repeat/merge work carrying no
       text and doing no verification.
    """
    from ..sketches import hash_strings, hash_strings2
    from .text import TOKEN_SPLIT_RE

    nb = num_shards or _default_shards()
    key_type = None
    for n_, t_ in zip(ds.schema().names, ds.schema().types):
        if n_ == key_col:
            key_type = t_
    if key_type is None:
        raise ValueError(f"{key_col!r} not in dataset schema")

    def _gid_shard(g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
        return ((_key_hash(g1, 21) ^ _key_hash(g2, 22))
                % np.uint64(nb)).astype(np.int64)

    def _zero_keys(n: int) -> pa.Array:
        # sentinel-row convention: off-side columns carry ZEROS of the
        # real dtype, never nulls (the as-of-join float64-key lesson)
        if pa.types.is_integer(key_type) or pa.types.is_floating(key_type):
            return pc.cast(pa.array(np.zeros(n, np.int64)), key_type)
        return pa.array(np.full(n, "", object), key_type)

    def _norm_names(t: pa.Table) -> np.ndarray:
        col = pc.utf8_lower(pc.utf8_trim_whitespace(t[name_col]))
        return col.to_numpy(zero_copy_only=False).astype(object)

    # ---- phase 1: member table + distinct normalized names ----

    def member_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[name_col])))
        if t.num_rows == 0:
            return pa.table({"g1": pa.array([], pa.int64()),
                             "g2": pa.array([], pa.int64()),
                             "key": pa.array([], key_type)})
        names = _norm_names(t)
        return pa.table({
            "g1": pa.array(hash_strings(names).view(np.int64)),
            "g2": pa.array(hash_strings2(names).view(np.int64)),
            "key": t[key_col]})

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[name_col])))
        if t.num_rows == 0:
            return pa.table({"gshard": pa.array([], pa.int64()),
                             "g1": pa.array([], pa.int64()),
                             "g2": pa.array([], pa.int64()),
                             "name": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        names = _norm_names(t)
        g1 = hash_strings(names).view(np.int64)
        g2 = hash_strings2(names).view(np.int64)
        order = np.lexsort((g2, g1))
        starts, sizes = _group_starts(g1[order], g2[order])
        idx = order[starts]
        return pa.table({
            "gshard": pa.array(_gid_shard(g1[idx], g2[idx]), pa.int64()),
            "g1": pa.array(g1[idx]), "g2": pa.array(g2[idx]),
            "name": pa.array(names[idx], pa.string()),
            "cnt": pa.array(sizes, pa.int64())})

    def global_distinct(df):
        import pandas as pd
        if df.shape[0] == 0:
            return pa.table({
                "g1": pa.array([], pa.int64()),
                "g2": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64())})
        g = df.groupby(["g1", "g2"], sort=False, as_index=False) \
              .agg(name=("name", "first"), cnt=("cnt", "sum"))
        return pa.table({
            "g1": pa.array(g["g1"].to_numpy(), pa.int64()),
            "g2": pa.array(g["g2"].to_numpy(), pa.int64()),
            "name": pa.array(g["name"].to_numpy(), pa.string(),
                             from_pandas=True),
            "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64),
                            pa.int64())})

    # ---- phase 2: word blocking over DISTINCT names ----

    def block_rows(t: pa.Table) -> pa.Table:
        import pandas as pd

        if t.num_rows == 0 or "name" not in t.column_names:
            return pa.table({"wshard": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "g1": pa.array([], pa.int64()),
                             "g2": pa.array([], pa.int64()),
                             "name": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        col = t["name"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets).astype(np.int64)
        flat = parts.values.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
        words = flat.to_numpy(zero_copy_only=False)
        ridx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                         np.diff(offs))
        keep = words != ""
        df = pd.DataFrame({"w": words[keep], "r": ridx[keep]}) \
            .drop_duplicates()
        g1 = t["g1"].to_numpy(zero_copy_only=False)
        g2 = t["g2"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        names = col.to_numpy(zero_copy_only=False)
        w = df["w"].to_numpy(dtype=object)
        r = df["r"].to_numpy()
        return pa.table({
            "wshard": pa.array(_key_shards(w, nb, 131), pa.int64()),
            "word": pa.array(w, pa.string()),
            "g1": pa.array(g1[r]), "g2": pa.array(g2[r]),
            "name": pa.array(names[r].astype(object), pa.string()),
            "cnt": pa.array(cnt[r], pa.int64()),
        })

    def _verify(na: np.ndarray, nb: np.ndarray) -> np.ndarray:
        """Edit distances for aligned name arrays; max_dist == 1 uses
        the O(L) one-edit check instead of the full DP, and a length
        prefilter skips the DP for pairs it cannot accept."""
        if max_dist == 1:
            return one_edit_distance_pairs(na, nb)
        la = np.fromiter((len(s) for s in na), np.int64, len(na))
        lb = np.fromiter((len(s) for s in nb), np.int64, len(nb))
        d = np.full(len(na), max_dist + 1, np.int64)
        m = np.abs(la - lb) <= max_dist
        if m.any():
            d[m] = levenshtein_pairs(na[m], nb[m])
        return d

    def emit_gid_pairs(df):
        # pairs are emitted AND verified inside the word-shard group
        # (the distinct names are already co-located here), so the
        # pair DISTINCT exchange below carries only surviving
        # (gid_a, gid_b, dist) integer rows — never name payloads.
        # A pair sharing several words is verified once per word
        # (<= words per name), the price of collapsing the exchange.
        import pandas as pd

        out_empty = pa.table({c: pa.array([], pa.int64()) for c in
                              ("g1a", "g2a", "g1b", "g2b", "dist")})
        if df.shape[0] == 0:
            return out_empty
        df = df.copy()
        df["__len"] = df["name"].str.len()
        df = df.sort_values(["word", "__len", "g1", "g2"],
                            kind="stable")
        w = df["word"].to_numpy(dtype=object)
        lens = df["__len"].to_numpy().astype(np.int64)
        cnts = df["cnt"].to_numpy().astype(np.int64)
        g1 = df["g1"].to_numpy()
        g2 = df["g2"].to_numpy()
        names = df["name"].to_numpy(dtype=object)
        starts, sizes = _group_starts(w)
        n = len(w)
        # max_block counts INSTANCES (sum of duplicate counts), the
        # same block size the instance-level formulation sees
        bsz = np.add.reduceat(cnts, starts)
        okrow = np.repeat(bsz <= max_block, sizes)
        parts_out = []
        # self pairs: an identical-name group co-occurs with itself
        # in every one of its word blocks; one surviving block => the
        # instance pairs exist (dedup to one row per gid below)
        selfm = okrow & (cnts >= 2)
        if selfm.any():
            k = int(selfm.sum())
            parts_out.append(pd.DataFrame({
                "g1a": g1[selfm], "g2a": g2[selfm],
                "g1b": g1[selfm], "g2b": g2[selfm],
                "dist": np.zeros(k, np.int64)}))
        # LENGTH BAND (exact): |len(a) - len(b)| > max_dist implies
        # dist > max_dist.  Banded pairing vectorized ACROSS word
        # groups: a composite sort key (group_id * K + len,
        # K > len_max + max_dist, probe clamped at the group floor)
        # keeps every searchsorted probe inside its own group, so one
        # global searchsorted replaces a per-word Python loop.
        gidx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        K = int(lens.max()) + max_dist + 2
        ckey = gidx * K + lens
        lo = np.searchsorted(
            ckey, gidx * K + np.maximum(lens - max_dist, 0),
            side="left")
        counts = np.arange(n, dtype=np.int64) - lo
        counts[~okrow] = 0
        total = int(counts.sum())
        if total:
            off = np.zeros(n, np.int64)
            np.cumsum(counts[:-1], out=off[1:])
            ib = np.repeat(np.arange(n, dtype=np.int64), counts)
            ia = np.repeat(lo, counts) + (np.arange(total) -
                                          np.repeat(off, counts))
            d = _verify(names[ia], names[ib])
            keep = d <= max_dist
            ia, ib, d = ia[keep], ib[keep], d[keep]
            # canonical gid order so the pair DISTINCT keys agree
            # across word shards
            swap = (g1[ia] > g1[ib]) \
                | ((g1[ia] == g1[ib]) & (g2[ia] > g2[ib]))
            a = np.where(swap, ib, ia)
            b = np.where(swap, ia, ib)
            parts_out.append(pd.DataFrame({
                "g1a": g1[a], "g2a": g2[a],
                "g1b": g1[b], "g2b": g2[b], "dist": d}))
        if not parts_out:
            return out_empty
        allp = pd.concat(parts_out, ignore_index=True)
        return pa.table({c: pa.array(
            allp[c].to_numpy().astype(np.int64), pa.int64())
            for c in ("g1a", "g2a", "g1b", "g2b", "dist")})

    # ---- phase 3: gid-pair DISTINCT + two-hop expansion ----

    def pair_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g1a" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("g1a", "g2a", "g1b", "g2b", "dist",
                              "pshard")})
        h = _key_hash(t["g1a"].to_numpy(zero_copy_only=False), 11) \
            ^ _key_hash(t["g2b"].to_numpy(zero_copy_only=False), 12)
        sh = (h % np.uint64(nb)).astype(np.int64)
        return t.append_column("pshard", pa.array(sh, pa.int64()))

    def pair_distinct(df):
        # dist is a pure function of the (unordered) name pair, so
        # duplicates across word shards carry equal values
        df = df.sort_values("dist", kind="stable")
        df = df.drop_duplicates(["g1a", "g2a", "g1b", "g2b"]) \
               .drop(columns=["pshard"])
        return pa.table({c: pa.array(
            df[c].to_numpy().astype(np.int64), pa.int64())
            for c in ("g1a", "g2a", "g1b", "g2b", "dist")})

    X1 = ["xshard", "side", "g1", "g2", "og1", "og2", "dist", "key"]

    def _empty_x1() -> pa.Table:
        cols = {c: pa.array([], pa.int64()) for c in X1}
        cols["side"] = pa.array([], pa.int8())
        cols["key"] = pa.array([], key_type)
        return pa.table({c: cols[c] for c in X1})

    def tag_pairs1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g1a" not in t.column_names:
            return _empty_x1()
        g1 = t["g1a"].to_numpy(zero_copy_only=False)
        g2 = t["g2a"].to_numpy(zero_copy_only=False)
        return pa.table({
            "xshard": pa.array(_gid_shard(g1, g2), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
            "g1": pa.array(g1), "g2": pa.array(g2),
            "og1": t["g1b"], "og2": t["g2b"],
            "dist": pc.cast(t["dist"], pa.int64()),
            "key": _zero_keys(t.num_rows)})

    def tag_members1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g1" not in t.column_names:
            return _empty_x1()
        g1 = t["g1"].to_numpy(zero_copy_only=False)
        g2 = t["g2"].to_numpy(zero_copy_only=False)
        zeros = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({
            "xshard": pa.array(_gid_shard(g1, g2), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "g1": t["g1"], "g2": t["g2"],
            "og1": zeros, "og2": zeros, "dist": zeros,
            "key": t["key"]})

    def merge1(df):
        def to_arrow(frame):
            return pa.table({
                "og1": pa.array(frame["og1"].to_numpy().astype(np.int64),
                                pa.int64()),
                "og2": pa.array(frame["og2"].to_numpy().astype(np.int64),
                                pa.int64()),
                "dist": pa.array(frame["dist"].to_numpy().astype(np.int64),
                                 pa.int64()),
                "key_a": pa.array(frame["key_a"].to_numpy(),
                                  type=key_type, from_pandas=True)})

        p = df.loc[df["side"] == 0, ["g1", "g2", "og1", "og2", "dist"]]
        m = df.loc[df["side"] == 1, ["g1", "g2", "key"]]
        if p.empty or m.empty:
            out = p.iloc[:0][["og1", "og2", "dist"]].copy()
            out["key_a"] = m["key"].iloc[:0]
            return to_arrow(out)
        return to_arrow(p.merge(m, on=["g1", "g2"], how="inner")
                        .rename(columns={"key": "key_a"}))

    X2 = ["xshard", "side", "g1", "g2", "dist", "key_a", "key"]

    def _empty_x2() -> pa.Table:
        cols = {c: pa.array([], pa.int64()) for c in X2}
        cols["side"] = pa.array([], pa.int8())
        cols["key_a"] = pa.array([], key_type)
        cols["key"] = pa.array([], key_type)
        return pa.table({c: cols[c] for c in X2})

    def tag_half1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "og1" not in t.column_names:
            return _empty_x2()
        g1 = t["og1"].to_numpy(zero_copy_only=False)
        g2 = t["og2"].to_numpy(zero_copy_only=False)
        return pa.table({
            "xshard": pa.array(_gid_shard(g1, g2), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
            "g1": t["og1"], "g2": t["og2"],
            "dist": pc.cast(t["dist"], pa.int64()),
            "key_a": pc.cast(t["key_a"], key_type),
            "key": _zero_keys(t.num_rows)})

    def tag_members2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g1" not in t.column_names:
            return _empty_x2()
        g1 = t["g1"].to_numpy(zero_copy_only=False)
        g2 = t["g2"].to_numpy(zero_copy_only=False)
        zeros = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({
            "xshard": pa.array(_gid_shard(g1, g2), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "g1": t["g1"], "g2": t["g2"], "dist": zeros,
            "key_a": _zero_keys(t.num_rows), "key": t["key"]})

    def merge2(df):
        def to_arrow(frame):
            return pa.table({
                "key_a": pa.array(frame["key_a"].to_numpy(),
                                  type=key_type, from_pandas=True),
                "key_b": pa.array(frame["key_b"].to_numpy(),
                                  type=key_type, from_pandas=True),
                "dist": pa.array(frame["dist"].to_numpy().astype(np.int64),
                                 pa.int64())})

        p = df.loc[df["side"] == 0, ["g1", "g2", "dist", "key_a"]]
        m = df.loc[df["side"] == 1, ["g1", "g2", "key"]]
        if p.empty or m.empty:
            out = p.iloc[:0][["key_a", "dist"]].copy()
            out["key_b"] = m["key"].iloc[:0]
            return to_arrow(out)
        return to_arrow(p.merge(m, on=["g1", "g2"], how="inner")
                        .rename(columns={"key": "key_b"}))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key_a" not in t.column_names:
            return pa.table({"key_a": pa.array([], key_type),
                             "key_b": pa.array([], key_type),
                             "dist": pa.array([], pa.int64())})
        ka = t["key_a"].to_numpy(zero_copy_only=False)
        kb = t["key_b"].to_numpy(zero_copy_only=False)
        d = t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a (gid, gid, 0) self pair expands to the full ordered cross
        # product of its members — keep ka < kb (each unordered pair
        # once, no self rows).  A cross pair expands each unordered
        # key pair exactly once — normalize to (min, max).
        keep = np.where(d == 0, ka < kb, np.ones(len(d), bool))
        ka, kb, d = ka[keep], kb[keep], d[keep]
        return pa.table({
            "key_a": pc.cast(pa.array(np.minimum(ka, kb)), key_type),
            "key_b": pc.cast(pa.array(np.maximum(ka, kb)), key_type),
            "dist": pa.array(d, pa.int64())})

    # ---- adaptive small-side fast path: the SAME phase functions,
    # applied once to the whole collected projection (pure functions
    # of their input tables, so the answer is identical to the
    # exchange plan's shard-wise application) ----
    if size_hint_rows is not None and size_hint_rows <= small_rows_threshold:
        import ray.data as rd

        empty = pa.table({"key_a": pa.array([], key_type),
                          "key_b": pa.array([], key_type),
                          "dist": pa.array([], pa.int64())})
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
                 if b.num_rows]
        if not parts:
            return rd.from_arrow(empty)
        t_all = pa.concat_tables(parts).combine_chunks()
        dist_t = global_distinct(local_distinct(t_all).to_pandas())
        gp = pair_distinct(pair_shard(
            emit_gid_pairs(block_rows(dist_t).to_pandas())).to_pandas())
        mem = member_rows(t_all)
        if gp.num_rows == 0 or mem.num_rows == 0:
            return rd.from_arrow(empty)
        # member expansion as a pure-numpy run-length cross product —
        # the pandas double-merge here allocated GBs (name-duplicate
        # groups make the expansion output millions of rows from
        # thousands of gid pairs; measured 22.5k pairs -> 7.06M rows
        # at sf0.1, 17-30 s in loaded windows).  int-only temporaries:
        # joint dense codes for the (g1, g2) gid pairs of members and
        # both pair sides, per-group offsets, then offset arithmetic.
        mg = np.stack([mem["g1"].to_numpy(zero_copy_only=False),
                       mem["g2"].to_numpy(zero_copy_only=False)], 1)
        pga = np.stack([gp["g1a"].to_numpy(zero_copy_only=False),
                        gp["g2a"].to_numpy(zero_copy_only=False)], 1)
        pgb = np.stack([gp["g1b"].to_numpy(zero_copy_only=False),
                        gp["g2b"].to_numpy(zero_copy_only=False)], 1)
        dist = gp["dist"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m_n, p_n = len(mg), len(pga)
        _, inv = np.unique(np.concatenate([mg, pga, pgb]), axis=0,
                           return_inverse=True)
        inv = inv.reshape(-1)
        mcode = inv[:m_n]
        acode = inv[m_n:m_n + p_n]
        bcode = inv[m_n + p_n:]
        n_codes = int(inv.max()) + 1
        cnt = np.bincount(mcode, minlength=n_codes).astype(np.int64)
        order = np.argsort(mcode, kind="stable")
        offs = np.zeros(n_codes + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        na, nb = cnt[acode], cnt[bcode]
        tot = na * nb
        total = int(tot.sum())
        if total == 0:
            return rd.from_arrow(empty)
        rep = np.repeat(np.arange(p_n, dtype=np.int64), tot)
        base = np.cumsum(tot) - tot
        pos = np.arange(total, dtype=np.int64) - base[rep]
        nbr = nb[rep]
        ia = pos // nbr
        jb = pos - ia * nbr
        src_a = order[offs[acode][rep] + ia]
        src_b = order[offs[bcode][rep] + jb]
        keys = mem["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        out = finalize(pa.table({
            "key_a": pc.cast(keys.take(pa.array(src_a)), key_type),
            "key_b": pc.cast(keys.take(pa.array(src_b)), key_type),
            "dist": pa.array(dist[rep], pa.int64())}))
        return rd.from_arrow(out)

    distinct = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby("gshard") \
        .map_groups(global_distinct, batch_format="pandas")
    gid_pairs = distinct.map_batches(block_rows, batch_format="pyarrow") \
        .groupby("wshard") \
        .map_groups(emit_gid_pairs, batch_format="pandas") \
        .map_batches(pair_shard, batch_format="pyarrow") \
        .groupby("pshard") \
        .map_groups(pair_distinct, batch_format="pandas")

    # member table: text-free (gid, key) rows, one per input record;
    # materialized DISTRIBUTED (object-store blocks, never the
    # driver) because both expansion hops read it
    members = ds.map_batches(member_rows,
                             batch_format="pyarrow").materialize()
    if members.count() == 0:
        # zero valid records: the union below would have no schema to
        # infer (both sides empty) — return the pinned empty result
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "key_a": pa.array([], key_type),
            "key_b": pa.array([], key_type),
            "dist": pa.array([], pa.int64())}))

    union1 = gid_pairs.map_batches(tag_pairs1, batch_format="pyarrow") \
        .union(members.map_batches(tag_members1, batch_format="pyarrow"))
    assert union1.schema().names is not None  # keep lineage eager-safe
    half = union1.groupby("xshard").map_groups(
        merge1, batch_format="pandas")

    union2 = half.map_batches(tag_half1, batch_format="pyarrow") \
        .union(members.map_batches(tag_members2, batch_format="pyarrow"))
    assert union2.schema().names is not None
    full = union2.groupby("xshard").map_groups(
        merge2, batch_format="pandas")
    return full.map_batches(finalize, batch_format="pyarrow")
