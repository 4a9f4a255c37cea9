"""Record linkage: vectorized Levenshtein parity with a classic DP
reference, blocking recall (shared-word pairs only), max_block cap."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyschema_ray.functions.linkage import (fuzzy_name_pairs,
                                            levenshtein_pairs)


def _ref_lev(a, b):
    dp = list(range(len(b) + 1))
    for i in range(len(a)):
        nxt = [i + 1] + [0] * len(b)
        for j in range(len(b)):
            nxt[j + 1] = min(dp[j] + (a[i] != b[j]), dp[j + 1] + 1,
                             nxt[j] + 1)
        dp = nxt
    return dp[len(b)]


def test_levenshtein_pairs_parity():
    import random

    random.seed(2)
    a, b = [], []
    for _ in range(300):
        a.append("".join(random.choices("abcd ", k=random.randint(0, 10))))
        b.append("".join(random.choices("abcd ", k=random.randint(0, 10))))
    a += ["", "kitten", "flaw", "résumé"]
    b += ["", "sitting", "lawn", "resume"]
    got = levenshtein_pairs(np.array(a, object), np.array(b, object))
    want = [_ref_lev(x, y) for x, y in zip(a, b)]
    assert got.tolist() == want


def test_one_edit_distance_pairs_parity():
    """O(L) clamped-at-2 fast path agrees with min(DP, 2) over an
    edit-heavy random mix (many true 0/1-distance pairs)."""
    import random

    from pyschema_ray.functions.linkage import one_edit_distance_pairs

    random.seed(7)
    a, b = [], []
    for _ in range(600):
        s = "".join(random.choices("abc", k=random.randint(0, 8)))
        t = list(s)
        op = random.randrange(4)
        if op == 0 and t:                      # substitute
            t[random.randrange(len(t))] = random.choice("abc")
        elif op == 1:                          # insert
            t.insert(random.randint(0, len(t)), random.choice("abc"))
        elif op == 2 and t:                    # delete
            del t[random.randrange(len(t))]
        # op == 3: identical
        a.append(s)
        b.append("".join(t))
    # adversarial exact cases for the lcp+lcs characterization
    a += ["", "", "a", "ab", "abc", "abc", "abcd", "aaa", "aba"]
    b += ["", "a", "", "ba", "abc", "acb", "abc", "aaaa", "bab"]
    got = one_edit_distance_pairs(np.array(a, object),
                                  np.array(b, object))
    want = [min(_ref_lev(x, y), 2) for x, y in zip(a, b)]
    assert got.tolist() == want


def _names_ds(rows):
    return rd.from_arrow(pa.table({
        "key": pa.array([k for k, _ in rows], pa.int64()),
        "name": pa.array([n for _, n in rows], pa.string()),
    })).repartition(2)


def test_fuzzy_name_pairs_blocking_and_verify():
    rows = [(1, "red widget"), (2, "red widgets"), (3, "red gear"),
            (4, "blue gear"), (5, "xyz thing"), (6, None)]
    ds = _names_ds(rows)
    out = pa.concat_tables(
        [b for b in fuzzy_name_pairs(ds, name_col="name",
                                     key_col="key", max_dist=2)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by([("key_a", "ascending"), ("key_b", "ascending")])
    got = list(zip(out["key_a"].to_pylist(), out["key_b"].to_pylist(),
                   out["dist"].to_pylist()))
    # (1,2): 1 edit; (3,4) share 'gear', dist 3 -> dropped;
    # (1,3)/(2,3) share 'red' but dist > 2; 5 shares no word with
    # anything; null name ignored
    assert got == [(1, 2, 1)]


def test_fuzzy_name_pairs_max_dist_one_fast_path():
    rows = [(1, "red widget"), (2, "red widgets"), (3, "red widgett"),
            (4, "red gadget"), (5, "red widge")]
    ds = _names_ds(rows)
    out = pa.concat_tables(
        [b for b in fuzzy_name_pairs(ds, name_col="name",
                                     key_col="key", max_dist=1)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by([("key_a", "ascending"), ("key_b", "ascending")])
    got = list(zip(out["key_a"].to_pylist(), out["key_b"].to_pylist(),
                   out["dist"].to_pylist()))
    # widget~widgets~widgett are one edit apart pairwise except
    # widgets/widgett (substitution at last char: also 1);
    # widge is 1 delete from widget, 2 from widgets/widgett;
    # gadget is 2+ from all
    assert got == [(1, 2, 1), (1, 3, 1), (1, 5, 1), (2, 3, 1)]


def test_fuzzy_duplicate_heavy_expansion():
    """Dedup-first path: identical names expand to within-group
    pairs (dist 0) and group-pair cross products (dist 1), exactly
    matching the instance-level brute force."""
    rows = [(1, "red widget"), (2, "red widget"), (3, "red widget"),
            (4, "red widgets"), (5, "red widgets"), (6, "blue gear")]
    ds = _names_ds(rows)
    out = pa.concat_tables(
        [b for b in fuzzy_name_pairs(ds, name_col="name",
                                     key_col="key", max_dist=1)
         .iter_batches(batch_format="pyarrow") if b.num_rows]) \
        .sort_by([("key_a", "ascending"), ("key_b", "ascending")])
    got = list(zip(out["key_a"].to_pylist(), out["key_b"].to_pylist(),
                   out["dist"].to_pylist()))
    # brute force over instances sharing a word
    names = dict(rows)
    want = []
    for i in range(1, 7):
        for j in range(i + 1, 7):
            a, b = names[i], names[j]
            if not set(a.split()) & set(b.split()):
                continue
            d = _ref_lev(a, b)
            if d <= 1:
                want.append((i, j, d))
    assert got == sorted(want)


def test_fuzzy_max_block_counts_instances():
    # 6 instances of ONE distinct name: the block holds 6 INSTANCES
    # (> 5 -> dropped, so no dist-0 pairs) though only 1 distinct
    # name (<= 5) — the cap must count instances
    rows = [(i, "widget") for i in range(6)]
    ds = _names_ds(rows)
    out = [b for b in fuzzy_name_pairs(ds, name_col="name",
                                       key_col="key", max_dist=1,
                                       max_block=5)
           .iter_batches(batch_format="pyarrow") if b.num_rows]
    assert not out


def test_fuzzy_max_block_cap_drops_boilerplate():
    rows = [(i, f"common name{i}") for i in range(20)]
    ds = _names_ds(rows)
    # 'common' block has 20 members > cap 5; 'nameN' blocks are
    # singletons -> no pairs at all
    out = [b for b in fuzzy_name_pairs(ds, name_col="name",
                                       key_col="key", max_dist=2,
                                       max_block=5)
           .iter_batches(batch_format="pyarrow") if b.num_rows]
    assert not out


def test_top_keys_exact():
    from pyschema_ray.functions.analytics import top_keys

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1] * 7 + [2] * 7 + [3] * 5 + [4] * 2 + [None],
                      pa.int64())})).repartition(4)
    out = pa.concat_tables(
        top_keys(ds, "k", k=3).iter_batches(batch_format="pyarrow"))
    # tie between 1 and 2 breaks ascending; null dropped
    assert out.to_pydict() == {"k": [1, 2, 3], "n": [7, 7, 5]}


def _fuzzy_tuples(ds, **kw):
    parts = [b for b in fuzzy_name_pairs(ds, name_col="name",
                                         key_col="key", **kw)
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return []
    out = pa.concat_tables(parts)
    return sorted(zip(out["key_a"].to_pylist(),
                      out["key_b"].to_pylist(),
                      out["dist"].to_pylist()))


def test_fuzzy_small_side_fast_path_parity():
    """size_hint_rows <= threshold runs the zero-exchange local path;
    its output must equal the distributed plan's on every scenario the
    distributed tests cover (shared phase functions = same answer)."""
    scenarios = [
        dict(rows=[(1, "red widget"), (2, "red widgets"),
                   (3, "red gear"), (4, "blue gear"),
                   (5, "xyz thing"), (6, None)], max_dist=2),
        dict(rows=[(1, "red widget"), (2, "red widget"),
                   (3, "red widget"), (4, "red widgets"),
                   (5, "red widgets"), (6, "blue gear")], max_dist=1),
        dict(rows=[(i, "widget") for i in range(6)], max_dist=1,
             max_block=5),
        dict(rows=[(i, f"common name{i}") for i in range(20)],
             max_dist=2, max_block=5),
        dict(rows=[], max_dist=1),
    ]
    for sc in scenarios:
        rows = sc.pop("rows")
        ds = _names_ds(rows) if rows else rd.from_arrow(pa.table({
            "key": pa.array([], pa.int64()),
            "name": pa.array([], pa.string())}))
        dist_out = _fuzzy_tuples(ds, **sc)
        local_out = _fuzzy_tuples(ds, size_hint_rows=len(rows), **sc)
        assert local_out == dist_out, (sc, local_out, dist_out)


def test_fuzzy_hint_above_threshold_stays_distributed():
    rows = [(1, "red widget"), (2, "red widgets")]
    ds = _names_ds(rows)
    # hint above the threshold: must take the exchange plan and still
    # produce the same pairs
    got = _fuzzy_tuples(ds, max_dist=1, size_hint_rows=10**9)
    assert got == [(1, 2, 1)]


def test_fuzzy_fast_path_string_keys():
    ds = rd.from_arrow(pa.table({
        "key": pa.array(["a", "b", "c"], pa.string()),
        "name": pa.array(["red widget", "red widgets", "red widget"],
                         pa.string())}))
    got = _fuzzy_tuples(ds, max_dist=1, size_hint_rows=3)
    assert got == [("a", "b", 1), ("a", "c", 0), ("b", "c", 1)]
