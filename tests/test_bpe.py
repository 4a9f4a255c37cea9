"""BPE training parity vs an independent dict-based reference
(Sennrich get_stats/merge semantics), plus encoder properties."""

import numpy as np
import pyarrow as pa

import ray


def _ref_train(words, counts, num_merges, min_count=2):
    """Straightforward dict/list reference: per-word symbol lists,
    pair counting with overlaps, greedy-leftmost merge, ties broken
    by (left_id, right_id) with codepoint-sorted initial ids."""
    chars = sorted({c for w in words for c in w})
    sym_id = {c: i for i, c in enumerate(chars)}
    seqs = [list(w) for w in words]
    merges = []
    for _ in range(num_merges):
        stats = {}
        for s, c in zip(seqs, counts):
            for a, b in zip(s, s[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        best = max(stats.items(),
                   key=lambda kv: (kv[1], -sym_id[kv[0][0]],
                                   -sym_id[kv[0][1]]))
        (a, b), n = best
        if n < min_count:
            break
        ab = a + b
        sym_id[ab] = len(sym_id)
        merges.append((a, b, ab, n))
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges


def test_train_parity_with_reference():
    from pyschema_ray.functions.bpe import bpe_train_local, merges_table

    rng = np.random.default_rng(11)
    alpha = "abcde"
    words = sorted({"".join(rng.choice(list(alpha),
                                       size=rng.integers(1, 8)))
                    for _ in range(40)})
    counts = rng.integers(1, 6, size=len(words)).tolist()
    want = _ref_train(words, counts, num_merges=15, min_count=1)
    model = bpe_train_local(words, counts, num_merges=15, min_count=1)
    mt = merges_table(model)
    got = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist(),
                   mt["merged"].to_pylist(),
                   mt["pair_count"].to_pylist()))
    assert got == want


def test_train_overlap_run_semantics():
    from pyschema_ray.functions.bpe import bpe_train_local

    # 'aaaa' x10: pair (a,a) counts 3 occurrences/word = 30;
    # greedy-leftmost merge gives [aa, aa]
    model = bpe_train_local(["aaaa"], [10], num_merges=2, min_count=1)
    assert model["id_to_str"][model["merges"][0][2]] == "aa"
    assert model["merges"][0][3] == 30
    # second merge: (aa, aa) count 10
    assert model["id_to_str"][model["merges"][1][2]] == "aaaa"
    assert model["merges"][1][3] == 10


def test_encoder_counts_and_ids_roundtrip():
    from pyschema_ray.functions.bpe import BpeEncoder, bpe_train_local

    corpus = ["low lower lowest", "low low newer", ""]
    words = sorted({w for s in corpus for w in s.split()})
    model = bpe_train_local(words, [1] * len(words), num_merges=10,
                            min_count=1)
    enc = BpeEncoder(model, text_col="text", return_ids=True)
    out = enc(pa.table({"text": corpus}))
    n_tok = out["n_tokens"].to_pylist()
    assert n_tok[2] == 0 and all(n > 0 for n in n_tok[:2])
    assert out["n_unk"].to_pylist() == [0, 0, 0]
    # decode property: concatenated token strings == words joined
    id_to_str = model["id_to_str"]
    for row, text in zip(out["token_ids"].to_pylist(), corpus):
        decoded = "".join(id_to_str[i] for i in row)
        assert decoded == text.replace(" ", "")
    # no merges -> one token per char
    enc0 = BpeEncoder({"merges": [],
                       "char_to_id": model["char_to_id"]},
                      text_col="text")
    out0 = enc0(pa.table({"text": corpus}))
    assert out0["n_tokens"].to_pylist() == \
        [len(s.replace(" ", "")) for s in corpus]
    # merges strictly reduce token counts on this corpus
    assert sum(n_tok) < sum(out0["n_tokens"].to_pylist())


def test_encoder_unknown_chars():
    from pyschema_ray.functions.bpe import BpeEncoder, bpe_train_local

    model = bpe_train_local(["ab"], [5], num_merges=1, min_count=1)
    enc = BpeEncoder(model, text_col="text")
    out = enc(pa.table({"text": ["ab xz"]}))
    # 'ab' merges to 1 token; x and z unknown -> 2 UNK tokens
    assert out["n_tokens"].to_pylist() == [3]
    assert out["n_unk"].to_pylist() == [2]


def test_distributed_train_and_encode():
    from pyschema_ray.functions.bpe import (bpe_token_counts, bpe_train,
                                            bpe_train_local)

    texts = ["the cat sat", "the cat ran", "a cat sat there",
             None, "the the the"]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
    model = bpe_train(ds, num_merges=8, min_count=1)
    # distributed word counting must equal local counting
    from collections import Counter
    wc = Counter(w for s in texts if s for w in s.lower().split())
    items = sorted(wc.items())
    local = bpe_train_local([w for w, _ in items],
                            [c for _, c in items], 8, 1)
    assert model["merges"] == local["merges"]
    out = [b for b in bpe_token_counts(ds, model, concurrency=1)
           .iter_batches(batch_format="pyarrow") if b.num_rows]
    t = pa.concat_tables(out)
    assert t.num_rows == 5
    assert all(n >= 0 for n in t["n_tokens"].to_pylist())


def test_max_vocab_words_cap_reported():
    from pyschema_ray.functions.bpe import bpe_train

    texts = ["aa bb cc dd ee ff"]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    model = bpe_train(ds, num_merges=3, min_count=1,
                      max_vocab_words=2)
    assert model["words_dropped"] == 4
