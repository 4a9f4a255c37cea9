"""top_bigram_pmi (functions/text.py): exact parity against a
pure-Python PMI reference, min_count pruning, and deterministic ties."""

import math

import pyarrow as pa

import ray

from pyschema_ray.functions.text import top_bigram_pmi


def _tbl(ds):
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    return pa.concat_tables(tables) if tables else None


def _ref(texts, k, min_count):
    wc, bc = {}, {}
    for t in texts:
        w = (t or "").lower().split()
        for x in w:
            wc[x] = wc.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    W = sum(wc.values())
    T = sum(bc.values())
    rows = []
    for (a, b), n in bc.items():
        if n < min_count:
            continue
        p = float(n) * W * W / T / wc[a] / wc[b]
        x = math.log(p) * 1000.0
        mp = int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))
        rows.append((f"{a} {b}", n, mp))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


DOCS = [
    "new york is a big city",
    "new york has new people",
    "people like new york a lot",
    "a big dog and a big cat",
    "the cat and the dog",
    "new deal but old york",
    None,
    "",
    "single",
]


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)


def test_matches_python_reference():
    got_t = _tbl(top_bigram_pmi(_ds(DOCS), k=10, min_count=2))
    got = list(zip(got_t["ngram"].to_pylist(), got_t["n"].to_pylist(),
                   got_t["milli_pmi"].to_pylist()))
    assert got == _ref(DOCS, 10, 2)
    # fixed phrases surface in the top-k
    names = [g[0] for g in got]
    assert "new york" in names and "a big" in names


def test_min_count_prunes():
    got_t = _tbl(top_bigram_pmi(_ds(DOCS), k=50, min_count=3))
    exp = _ref(DOCS, 50, 3)
    if got_t is None:
        assert exp == []
    else:
        assert got_t.num_rows == len(exp)
