"""Misra-Gries heavy hitters (functions/text.py::heavy_hitter_words):
exactness against brute-force counting on skewed and adversarial
streams, and the compression bound that makes candidate recall 1."""

import numpy as np
import pyarrow as pa

from pyschema_ray.functions.text import _mg_compress, heavy_hitter_words


def test_mg_compress_bound():
    """After compressing a summary of n items to k counters, any
    item's undercount is at most the subtracted (k+1)-th largest
    value, and at most n/(k+1)."""
    rng = np.random.RandomState(3)
    counts = rng.zipf(1.5, size=5000).astype(np.int64)
    words = np.array([f"w{i}" for i in range(5000)], dtype=object)
    k = 100
    w2, n2 = _mg_compress(words, counts, k)
    assert len(w2) <= k
    n = counts.sum()
    lookup = dict(zip(w2, n2))
    for i in range(5000):
        kept = lookup.get(words[i], 0)
        assert kept <= counts[i]
        assert counts[i] - kept <= n / (k + 1)


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(pa.table({"text": pa.array(texts,
                                                          pa.string())}))


def _exact_hh(texts, phi):
    import math
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        c.update(w for w in t.strip().lower().split() if w)
    n = sum(c.values())
    thr = math.ceil(phi * n)
    return sorted((w, m) for w, m in c.items() if m >= thr)


def test_heavy_hitters_zipf_exact(ray_session):
    rng = np.random.RandomState(11)
    vocab = np.array([f"tok{i}" for i in range(2000)], dtype=object)
    texts = []
    for _ in range(300):
        idx = np.minimum(rng.zipf(1.3, size=40) - 1, 1999)
        texts.append(" ".join(vocab[idx]))
    texts += [None, "", "   "]
    got = heavy_hitter_words(_docs_ds(texts), phi=0.01)
    want = _exact_hh(texts, 0.01)
    assert list(zip(got["word"].to_pylist(),
                    got["n"].to_pylist())) == want
    assert len(want) > 0  # non-vacuous


def test_heavy_hitters_adversarial_threshold_edge(ray_session):
    """Items sitting EXACTLY at ceil(phi*n) must be included; one
    below excluded — the exact-verify pass decides, not the sketch."""
    # n = 1000 words total; phi=0.05 -> threshold 50
    texts = (["hot"] * 50) + (["warm"] * 49) + \
        [f"cold{i}" for i in range(901)]
    docs = [" ".join(texts[i::10]) for i in range(10)]
    got = heavy_hitter_words(_docs_ds(docs), phi=0.05)
    pairs = dict(zip(got["word"].to_pylist(), got["n"].to_pylist()))
    assert pairs.get("hot") == 50
    assert "warm" not in pairs
    assert all(not w.startswith("cold") for w in pairs)
