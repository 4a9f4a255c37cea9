"""Record linkage: blocked fuzzy self-join on short name strings.

The classic two-phase linkage shape (Fellegi & Sunter 1969 framing;
blocking + verify as in any dedupe system — public method):

1. **Blocking**: each record emits one row per lowercased name WORD
   (the block key).  Blocks co-locate on a bounded word-hash shard;
   within a block, candidate pairs are the triangular pairs of the
   block's members (``_triu_pairs`` — same kernel as MinHash/winnow
   buckets), so records sharing NO word are never compared — the
   O(n^2) cross join never happens.
2. **Pair DISTINCT**: a pair sharing several words appears once per
   word, possibly on different shards; :func:`dedup.distinct_pairs`
   dedups on one pair-hash exchange.
3. **Verify**: Levenshtein distance computed VECTORIZED ACROSS PAIRS
   (one (n_pairs,) uint32 DP row per character step — numpy over the
   whole pair block, never a per-pair Python loop), keep pairs with
   distance <= ``max_dist``.

Oracle: DuckDB's ``levenshtein()`` reproduces phase 3 exactly, and
the blocking predicate (share >= 1 word) is expressible with
list_has_any over regexp_split_to_array — the whole operator is
SQL-checkable.

Blocking contract at scale: a word shared by B records produces
B(B-1)/2 candidates; stopword-like block keys must be capped or
stoplisted upstream (``max_block`` drops oversized blocks LOUDLY via
the returned stats, mirroring winnow_candidates' documented cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import (_default_shards, _group_starts, _key_shards,
                    _triu_pairs, distinct_pairs)


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
                     max_block: int = 200):
    """Dataset(key_a, key_b, dist): unordered record pairs whose
    names share >= 1 word AND are within ``max_dist`` edits.  Blocks
    larger than ``max_block`` are dropped (boilerplate words); the
    cap is part of the operator contract, not silent."""
    from .text import TOKEN_SPLIT_RE

    nb = num_shards or _default_shards()

    def block_rows(t: pa.Table) -> pa.Table:
        import pandas as pd

        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[name_col])))
        col = pc.utf8_lower(pc.utf8_trim_whitespace(t[name_col]))
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
        keys = t[key_col].to_numpy(zero_copy_only=False)
        names = col.to_numpy(zero_copy_only=False)
        w = df["w"].to_numpy(dtype=object)
        r = df["r"].to_numpy()
        return pa.table({
            "wshard": pa.array(_key_shards(w, nb, 131), pa.int64()),
            "word": pa.array(w, pa.string()),
            "key": pa.array(keys[r]),
            "name": pa.array(names[r].astype(object), pa.string()),
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

    def emit_pairs(df):
        # pairs are emitted AND verified inside the word-shard group
        # (the names are already co-located here), so the pair
        # DISTINCT exchange below carries only surviving
        # (key_a, key_b, dist) rows — never name payloads.  A pair
        # sharing several words is verified once per word (<= words
        # per name), the price of collapsing the candidate exchange.
        #
        # LENGTH BAND (exact): |len(a) - len(b)| > max_dist implies
        # dist > max_dist, so each block is sorted by name length and
        # only in-band pairs are generated at all — on natural-text
        # blocks this cuts the candidate count several-fold before
        # any verification runs.
        import pandas as pd

        df = df.drop_duplicates(["word", "key"]).copy()
        df["__len"] = df["name"].str.len()
        df = df.sort_values(["word", "__len", "key"], kind="stable")
        w = df["word"].to_numpy(dtype=object)
        lens = df["__len"].to_numpy().astype(np.int64)
        starts, sizes = _group_starts(w)
        n = len(w)
        # banded pairing vectorized ACROSS word groups: a composite
        # sort key (group_id * K + len, K > len_max + max_dist) keeps
        # every searchsorted probe inside its own group (the probe is
        # clamped at the group floor), so one global searchsorted
        # replaces a per-word Python loop — word groups are
        # vocabulary-many on natural text
        gid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        K = (int(lens.max()) if n else 0) + max_dist + 2
        ckey = gid * K + lens
        lo = np.searchsorted(
            ckey, gid * K + np.maximum(lens - max_dist, 0), side="left")
        counts = np.arange(n, dtype=np.int64) - lo
        counts[np.repeat(sizes > max_block, sizes)] = 0
        total = int(counts.sum())
        if total == 0:
            kd = df["key"].dtype  # pinned: key may be int or string
            return pd.DataFrame({"key_a": pd.Series([], dtype=kd),
                                 "key_b": pd.Series([], dtype=kd),
                                 "dist": pd.Series([], dtype=np.int64)})
        off = np.zeros(n, np.int64)
        np.cumsum(counts[:-1], out=off[1:])
        ib = np.repeat(np.arange(n, dtype=np.int64), counts)
        ia = np.repeat(lo, counts) + (np.arange(total) -
                                      np.repeat(off, counts))
        keys = df["key"].to_numpy()
        names = df["name"].to_numpy(dtype=object)
        d = _verify(names[ia], names[ib])
        keep = d <= max_dist
        ka, kb = keys[ia][keep], keys[ib][keep]
        return pd.DataFrame({
            "key_a": np.minimum(ka, kb), "key_b": np.maximum(ka, kb),
            "dist": d[keep],
        })

    cand = ds.map_batches(block_rows, batch_format="pyarrow") \
        .groupby("wshard").map_groups(emit_pairs, batch_format="pandas")
    # dist is a pure function of the pair, so any duplicate row
    # carries the same value; min_col just fixes the kept row
    return distinct_pairs(cand, min_col="dist")
