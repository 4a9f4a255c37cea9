"""Deterministic synthetic `sequences` corpus per FIXTURES.md F1-F3.

Generates the canonical input table
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
with seeded violation injection at exact rates on disjoint row sets, so
the naive oracle validator and the engine must flag identical
``(doc_id, constraint)`` sets.  Written as multiple parquet files to
exercise partition lineage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_000
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_PROBS = [0.55, 0.2, 0.12, 0.08, 0.05]

# FIXTURES.md F1 injection table: (tag, rate)
RATES = {
    "null_doc_id": 0.002,
    "bad_regex": 0.002,
    "dup_doc_id": 0.005,
    "null_tokens": 0.001,
    "bad_element": 0.003,
    "bad_n_tok": 0.003,
    "bad_range": 0.002,
    "bad_source": 0.002,
}


def generate_sequences(n_rows: int, seed: int = 42, n_files: int = 16,
                       out_dir: str | None = None,
                       mean_len: float = 200.0, inject: bool = True,
                       row_group_size: int = 20_000):
    """Build the corpus; if ``out_dir`` is given, write ``n_files``
    parquet files and return their paths, else return one pa.Table.

    Determinism: a single ``default_rng(seed)`` drives everything; the
    defect row sets are drawn disjointly from a shuffled index pool.
    """
    rng = np.random.default_rng(seed)
    # token lengths ~ lognormal clipped to [1, 4096]
    lengths = np.clip(rng.lognormal(np.log(mean_len), 0.6, n_rows),
                      1, 4096).astype(np.int32)
    sources = rng.choice(np.array(SOURCES, dtype=object), size=n_rows,
                         p=SOURCE_PROBS)
    doc_ids = np.array([f"doc-{i:012d}" for i in range(n_rows)], dtype=object)

    total_tok = int(lengths.sum())
    flat = rng.integers(0, VOCAB, size=total_tok, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    n_tok = lengths.copy()

    expected: list[tuple[str, str]] = []  # (doc_id_or_<null>, constraint)
    if inject:
        pool = rng.permutation(n_rows)
        cursor = 0

        def take(rate: int) -> np.ndarray:
            nonlocal cursor
            k = int(round(n_rows * rate))
            idx = pool[cursor:cursor + k]
            cursor += k
            return idx

        null_ids = take(RATES["null_doc_id"])
        bad_ids = take(RATES["bad_regex"])
        dup_ids = take(RATES["dup_doc_id"])
        null_tok = take(RATES["null_tokens"])
        bad_elem = take(RATES["bad_element"])
        bad_ntok = take(RATES["bad_n_tok"])
        bad_rng = take(RATES["bad_range"])
        bad_src = take(RATES["bad_source"])

        for i in null_ids:
            doc_ids[i] = None
            expected.append(("<null>", "not_null(doc_id)"))
        for i in bad_ids:
            doc_ids[i] = f"BAD_{i}"
            expected.append((doc_ids[i], "regex(doc_id)"))
        # duplicates: overwrite with an existing clean id
        clean = pool[cursor:cursor + len(dup_ids)]
        for i, j in zip(dup_ids, clean):
            doc_ids[i] = doc_ids[j]
            expected.append((doc_ids[i], "unique(doc_id)"))
        null_tok_set = set(null_tok.tolist())
        for i in bad_elem:
            pos = offsets[i] + int(rng.integers(0, lengths[i]))
            flat[pos] = -1 if rng.random() < 0.5 else VOCAB + 7
            did = doc_ids[i] if doc_ids[i] is not None else "<null>"
            expected.append((did, "element_range(tokens)"))
        for i in bad_ntok:
            # stay inside the [1, 4096] range so ONLY length_eq fires
            # (a +1 on a max-length row would also violate range(n_tok))
            n_tok[i] = lengths[i] + 1 if lengths[i] < 4096 else lengths[i] - 1
            did = doc_ids[i] if doc_ids[i] is not None else "<null>"
            expected.append((did, "length_eq(n_tok,tokens)"))
        for i in bad_rng:
            # out-of-range n_tok; also breaks length_eq unless tokens null
            n_tok[i] = 0 if rng.random() < 0.5 else 5000
            did = doc_ids[i] if doc_ids[i] is not None else "<null>"
            expected.append((did, "range(n_tok)"))
            if i not in null_tok_set:
                expected.append((did, "length_eq(n_tok,tokens)"))
        for i in bad_src:
            sources[i] = "unknown-src"
            did = doc_ids[i] if doc_ids[i] is not None else "<null>"
            expected.append((did, "in_set(source)"))

        tokens_validity = np.ones(n_rows, dtype=bool)
        tokens_validity[null_tok] = False
        for i in null_tok:
            did = doc_ids[i] if doc_ids[i] is not None else "<null>"
            expected.append((did, "not_null(tokens)"))
    else:
        tokens_validity = np.ones(n_rows, dtype=bool)

    tokens_arr = _list_with_nulls(offsets, flat, tokens_validity)

    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.string(), from_pandas=True),
        "tokens": tokens_arr,
        "n_tok": pa.array(n_tok, pa.int32()),
        "source": pa.array(sources, pa.string(), from_pandas=True),
    })

    if out_dir is None:
        return table, expected

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_rows, n_files + 1).astype(np.int64)
    for f in range(n_files):
        part = table.slice(bounds[f], bounds[f + 1] - bounds[f])
        p = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(part, p, row_group_size=row_group_size)
        paths.append(p)
    return paths, expected


def _list_with_nulls(offsets: np.ndarray, flat: np.ndarray,
                     validity: np.ndarray) -> pa.ListArray:
    """list<int32> array with per-row nulls, built from flat buffers.
    Null slots must have zero-length extents (Parquet requirement), so
    the values of null rows are dropped and offsets recomputed."""
    otype = pa.int32() if offsets[-1] < 2**31 else pa.int64()
    if validity.all():
        return pa.ListArray.from_arrays(pa.array(offsets, otype),
                                        pa.array(flat, pa.int32()))
    lengths = np.diff(offsets)
    kept_lengths = np.where(validity, lengths, 0)
    new_offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(kept_lengths, out=new_offsets[1:])
    keep = np.ones(len(flat), dtype=bool)
    for i in np.nonzero(~validity)[0]:
        keep[offsets[i]:offsets[i + 1]] = False
    new_flat = flat[keep]
    otype = pa.int32() if new_offsets[-1] < 2**31 else pa.int64()
    return pa.ListArray.from_arrays(pa.array(new_offsets, otype),
                                    pa.array(new_flat, pa.int32()),
                                    mask=pa.array(~validity))


def _gen_one_shard(args) -> str:
    (i, rows, seed, out_dir, mean_len, inject, row_group_size) = args
    table, _ = generate_sequences(rows, seed=seed * 100_003 + i, n_files=1,
                                  mean_len=mean_len, inject=inject)
    # re-key doc ids so they are globally unique across shards
    ids = table["doc_id"].to_pylist()
    base = i * rows
    ids = [f"doc-{base + int(x.split('-')[1]):012d}"
           if x is not None and x.startswith("doc-") else x for x in ids]
    table = table.set_column(0, "doc_id",
                             pa.array(ids, pa.string(), from_pandas=True))
    p = os.path.join(out_dir, f"part-{i:05d}.parquet")
    pq.write_table(table, p, row_group_size=row_group_size)
    return p


def generate_sequences_sharded(n_rows: int, seed: int = 42,
                               n_files: int = 32,
                               out_dir: str = "/tmp/seq_corpus",
                               mean_len: float = 200.0, inject: bool = True,
                               processes: int = 8) -> list[str]:
    """Parallel (multiprocessing) corpus generation for bench-scale
    inputs: each file is generated independently from a per-file seed,
    with doc ids re-keyed to a disjoint range per file.  Deterministic
    given (n_rows, seed, n_files).  Duplicate-id injection stays within
    a file, so global dup counts still match the per-file injection."""
    import multiprocessing as mp

    os.makedirs(out_dir, exist_ok=True)
    rows_per = n_rows // n_files
    jobs = [(i, rows_per, seed, out_dir, mean_len, inject, 20_000)
            for i in range(n_files)]
    with mp.get_context("spawn").Pool(processes) as pool:
        return sorted(pool.map(_gen_one_shard, jobs))


def sources_dim_table() -> pa.Table:
    """FIXTURES.md F2 broadcast dimension table."""
    return pa.table({
        "source": pa.array(SOURCES, pa.string()),
        "license": pa.array(["cc", "pd", "mit", "cc", "cc"], pa.string()),
        "max_seq_len": pa.array([4096] * len(SOURCES), pa.int32()),
    })
