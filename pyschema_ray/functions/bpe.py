"""BPE tokenizer vocabulary induction and encoding, Ray-Data-first.

The training-data-pipeline shape (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm): byte-pair-encoding merges are learned from WORD
FREQUENCIES, not from the corpus stream, so the distributed part is
exactly :func:`pyschema_ray.functions.text.word_frequencies` (per-batch
value_counts combiner + bounded word-hash exchange — the corpus is
read once, and the exchange carries distinct words).  The merge loop
itself runs driver-side over the word-frequency table, which is
vocab-sized (distinct words), DATA-INDEPENDENT of corpus row count —
the documented contract that makes this scale: 100 TB of text with a
10^7-word vocabulary trains from a 10^7-row table.

Everything is vectorized numpy over ONE flat symbol array (words
separated by -1 sentinels; characters enter as UTF-32 codepoints via
``np.frombuffer`` — no per-character Python):

* pair counting: one boolean mask + bincount over composed pair
  codes, weighted by word counts;
* merge application: one match mask per merge with the classic
  greedy-leftmost overlap rule (for left==right runs like "aaa",
  run-parity keeps the 1st, 3rd, ... match), then a single masked
  copy;
* encoding replays merges in rank order over the WHOLE batch's flat
  array at once (not per doc), then splits token counts back per doc
  with reduceat over separator runs.

:class:`BpeEncoder` is the actor-pool ``map_batches`` stage: the
merge table and char map are decoded ONCE per actor in ``__init__``;
unknown characters map to a distinct UNK symbol and never merge.

No SQL oracle exists for an iterative merge loop — driver queries
over this module are rows-only; parity is pytest-enforced against an
independent dict-based reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEP = np.int64(-1)
_UNK = np.int64(-2)


def _char_arrays(char_to_id: dict[str, int]):
    """char map -> (sorted codepoints, ids aligned) for vectorized
    lookup."""
    if not char_to_id:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cps = np.array([ord(c) for c in char_to_id], np.int64)
    ids = np.array(list(char_to_id.values()), np.int64)
    o = np.argsort(cps)
    return cps[o], ids[o]


def _flatten_words(words: list[str], cps_sorted: np.ndarray,
                   ids_sorted: np.ndarray, counts: np.ndarray):
    """words -> (flat symbol array with one -1 separator after each
    word, per-position word-count weights).  Unknown chars -> _UNK.
    One UTF-32 decode + one searchsorted — no per-char Python."""
    n = len(words)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    concat = "".join(words)
    cp = np.frombuffer(concat.encode("utf-32-le"), np.uint32) \
        .astype(np.int64)
    lens = np.fromiter(map(len, words), np.int64, n)
    if len(cps_sorted):
        idx = np.searchsorted(cps_sorted, cp)
        idx = np.minimum(idx, len(cps_sorted) - 1)
        ids = np.where(cps_sorted[idx] == cp, ids_sorted[idx], _UNK)
    else:
        ids = np.full(len(cp), _UNK, np.int64)
    flat = np.full(len(cp) + n, _SEP, np.int64)
    pos = np.arange(len(cp), dtype=np.int64) \
        + np.repeat(np.arange(n, dtype=np.int64), lens)
    flat[pos] = ids
    wt = np.repeat(np.asarray(counts, np.int64), lens + 1)
    return flat, wt


def _pair_counts(flat: np.ndarray, wt: np.ndarray, n_symbols: int):
    """Weighted adjacent-pair counts -> (left ids, right ids, counts).
    Overlapping occurrences count individually (the Sennrich
    get_stats convention); separators/UNK (< 0) never pair."""
    if len(flat) < 2:
        return (np.empty(0, np.int64),) * 3
    l, r = flat[:-1], flat[1:]
    valid = (l >= 0) & (r >= 0)
    if not valid.any():
        return (np.empty(0, np.int64),) * 3
    codes = l[valid] * np.int64(n_symbols) + r[valid]
    w = wt[:-1][valid]
    uniq, inv = np.unique(codes, return_inverse=True)
    sums = np.bincount(inv, weights=w.astype(np.float64)) \
        .astype(np.int64)
    return uniq // n_symbols, uniq % n_symbols, sums


def _apply_merge(flat: np.ndarray, wt: np.ndarray, left: int,
                 right: int, new_id: int):
    """Replace greedy-leftmost non-overlapping (left, right) adjacent
    occurrences with new_id.  Overlap is only possible when left ==
    right (runs like 'aaa'); run-parity keeps the 1st, 3rd, ...
    match of each consecutive run."""
    if len(flat) < 2:
        return flat, wt
    m = (flat[:-1] == left) & (flat[1:] == right)
    pos = np.flatnonzero(m)
    if len(pos) == 0:
        return flat, wt
    if left == right:
        run_starts = np.flatnonzero(np.r_[True, np.diff(pos) != 1])
        sizes = np.diff(np.r_[run_starts, len(pos)])
        off = np.arange(len(pos)) - np.repeat(run_starts, sizes)
        pos = pos[(off % 2) == 0]
    out = flat.copy()
    out[pos] = new_id
    keep = np.ones(len(flat), bool)
    keep[pos + 1] = False
    return out[keep], wt[keep]


def bpe_train_local(words: list[str], counts, num_merges: int,
                    min_count: int = 2) -> dict:
    """Learn BPE merges from a (word, count) vocabulary — pure numpy,
    deterministic (ties: highest count, then smallest (left, right)
    id pair; initial ids are codepoint-sorted).  Returns dict with:

    * ``merges``: list of (left_id, right_id, new_id, pair_count)
    * ``id_to_str``: list mapping every symbol id to its string
    * ``char_to_id``: initial character map
    """
    counts = np.asarray(counts, np.int64)
    chars = sorted({ch for w in words for ch in w})
    char_to_id = {ch: i for i, ch in enumerate(chars)}
    id_to_str = list(chars)
    cps, cids = _char_arrays(char_to_id)
    flat, wt = _flatten_words(words, cps, cids, counts)
    merges: list[tuple[int, int, int, int]] = []
    for _ in range(num_merges):
        n_sym = len(id_to_str) + 1  # +1 headroom keeps codes unique
        l, r, c = _pair_counts(flat, wt, n_sym)
        if len(c) == 0 or c.max() < min_count:
            break
        # deterministic argmax: count desc, then (left, right) asc
        order = np.lexsort((r, l, -c))
        bl, br, bc = int(l[order[0]]), int(r[order[0]]), \
            int(c[order[0]])
        new_id = len(id_to_str)
        id_to_str.append(id_to_str[bl] + id_to_str[br])
        merges.append((bl, br, new_id, bc))
        flat, wt = _apply_merge(flat, wt, bl, br, new_id)
    return {"merges": merges, "id_to_str": id_to_str,
            "char_to_id": char_to_id}


def bpe_train(ds, text_col: str = "text", num_merges: int = 200,
              min_count: int = 2, lowercase: bool = True,
              max_vocab_words: int | None = None) -> dict:
    """Distributed word counting + local merge training.

    The corpus streams ONCE through word_frequencies' combiner
    exchange; only the distinct-word table reaches the driver (vocab-
    sized by contract — pass ``max_vocab_words`` to keep the top-N
    words by count as a hard cap; the dropped tail is reported in the
    result as ``words_dropped``, never silently)."""
    from .text import word_frequencies

    wf = word_frequencies(ds, text_col=text_col, lowercase=lowercase)
    tables = [b for b in wf.iter_batches(batch_format="pyarrow", batch_size=None)
              if b.num_rows]
    if not tables:
        return {"merges": [], "id_to_str": [], "char_to_id": {},
                "words_dropped": 0}
    t = pa.concat_tables(tables)
    words = t["word"].to_pylist()
    counts = np.asarray(t["n"].to_numpy(zero_copy_only=False),
                        np.int64)
    dropped = 0
    if max_vocab_words is not None and len(words) > max_vocab_words:
        order = np.lexsort((np.asarray(words, object), -counts))
        keep = np.sort(order[:max_vocab_words])
        dropped = len(words) - len(keep)
        words = [words[i] for i in keep]
        counts = counts[keep]
    out = bpe_train_local(words, counts, num_merges, min_count)
    out["words_dropped"] = dropped
    return out


def merges_table(model: dict) -> pa.Table:
    """Merge list -> pa.Table(rank, left, right, merged, pair_count)
    with human-readable symbol strings (the artifact a tokenizer
    build step persists)."""
    id_to_str = model["id_to_str"]
    merges = model["merges"]
    return pa.table({
        "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([id_to_str[m[0]] for m in merges],
                         pa.string()),
        "right": pa.array([id_to_str[m[1]] for m in merges],
                          pa.string()),
        "merged": pa.array([id_to_str[m[2]] for m in merges],
                           pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


class BpeEncoder:
    """Actor-pool encode stage: char map + merge list decoded ONCE in
    __init__, replayed in rank order over the WHOLE batch flat array
    (one _apply_merge pass per merge per batch — never per doc/row).
    Emits per-doc token counts (n_tokens, n_unk); pass
    ``return_ids=True`` to also emit the token-id list column."""

    def __init__(self, model: dict, text_col: str = "text",
                 lowercase: bool = True, return_ids: bool = False):
        self.cps, self.cids = _char_arrays(model["char_to_id"])
        self.merges = list(model["merges"])
        self.text_col = text_col
        self.lowercase = lowercase
        self.return_ids = return_ids

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .text import TOKEN_SPLIT_RE

        col = pc.utf8_trim_whitespace(pc.fill_null(t[self.text_col],
                                                   ""))
        if self.lowercase:
            col = pc.utf8_lower(col)
        n_docs = len(col)
        # ONE Arrow regex split for the whole batch (same kernel the
        # trainer's word_frequencies uses — encoder and trainer agree
        # on tokenization by construction); per-doc word counts come
        # from the list offsets + a cumulative nonempty mask, never a
        # per-row Python split.
        parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat_words = parts.flatten()
        nonempty = pc.not_equal(flat_words, "")
        offs = parts.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mask = nonempty.to_numpy(zero_copy_only=False)
        cum = np.r_[np.int64(0), np.cumsum(mask)]
        n_words = cum[offs[1:]] - cum[offs[:-1]]
        all_words = flat_words.filter(nonempty).to_pylist()
        ones = np.ones(len(all_words), np.int64)
        flat, wt = _flatten_words(all_words, self.cps, self.cids, ones)
        for left, right, new_id, _ in self.merges:
            flat, wt = _apply_merge(flat, wt, left, right, new_id)
        # tokens per word: symbols between separators
        sep_pos = np.flatnonzero(flat == _SEP)
        per_word = np.diff(np.r_[np.int64(-1), sep_pos]) - 1
        unk_flags = (flat == _UNK).astype(np.int64)
        # cumulative unk up to each separator -> per-word unk counts
        cum_unk = np.r_[np.int64(0), np.cumsum(unk_flags)]
        unk_at_sep = cum_unk[sep_pos + 1]
        per_word_unk = np.diff(np.r_[np.int64(0), unk_at_sep])
        # fold words back to docs
        doc_of_word = np.repeat(
            np.arange(n_docs, dtype=np.int64), n_words)
        n_tok = np.bincount(doc_of_word, weights=per_word,
                            minlength=n_docs).astype(np.int64)
        n_unk = np.bincount(doc_of_word, weights=per_word_unk,
                            minlength=n_docs).astype(np.int64)
        out = t.append_column("n_tokens", pa.array(n_tok, pa.int64()))
        out = out.append_column("n_unk", pa.array(n_unk, pa.int64()))
        if self.return_ids:
            toks = flat[flat != _SEP]
            doc_of_tok = np.repeat(doc_of_word, per_word)
            splits = np.r_[np.int64(0),
                           np.cumsum(np.bincount(
                               doc_of_tok, minlength=n_docs))] \
                .astype(np.int64)
            ids_col = pa.ListArray.from_arrays(
                pa.array(splits, pa.int32()),
                pa.array(toks, pa.int64()))
            out = out.append_column("token_ids", ids_col)
        return out


def bpe_token_counts(ds, model: dict, text_col: str = "text",
                     lowercase: bool = True, concurrency=(1, 8)):
    """Encode the corpus with a trained model -> per-doc
    (n_tokens, n_unk) columns appended; the model ships to each actor
    ONCE via the constructor (never per batch)."""
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs=dict(model=model, text_col=text_col,
                                   lowercase=lowercase),
        batch_format="pyarrow", concurrency=concurrency)
