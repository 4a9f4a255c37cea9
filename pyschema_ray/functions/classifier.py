"""Model-in-the-loop corpus classification.

Two distributed trainers, scoring via an actor-pool stage (state
built once per actor in ``__init__`` — the stateful-stage pattern):

* **Multinomial Naive Bayes** (:func:`nb_train` / :class:`NbScorer`) —
  training IS aggregation: per-(label, word) token counts on a
  word-hash shard exchange (the word_frequencies combiner with a
  composite key) plus per-label doc counts.  Prediction is exact
  INTEGER milli-nat scoring — ``round(1000 * ln(p))`` per term, the
  lm.py convention — so argmax (ties -> lexicographically smallest
  label) is deterministic and SQL-reproducible.  Add-one smoothing
  over the train vocabulary.

* **Logistic regression via deterministic parameter averaging**
  (:func:`logreg_train_avg`) — the classic one-pass-per-round
  distributed SGD: documents hash to FIXED logical shards (stable
  under any physical re-blocking), each shard runs a doc_id-ordered
  SGD epoch from the broadcast weights, the driver averages the
  shard weights, repeat.  Features are hashed token buckets built
  per shard (no global vocabulary pass).  Determinism contract:
  shard assignment + within-shard order depend only on doc_id, so
  the model is bit-identical across block splits / cluster widths.

Broadcast contract: both models are vocabulary/dimension-bounded
(labels x vocab counts; 2^b weight vector) — they ride ``ray.put``
once and never re-ship per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_shards, _key_shards
from .lm import _round_half_away
from .text import TOKEN_SPLIT_RE


def _doc_words(t: pa.Table, text_col: str):
    """(flat word array, per-row word counts) with the repo's shared
    tokenization: lower(trim(text)) split on whitespace, empties
    dropped — identical to the word_frequencies SQL contract."""
    col = pc.utf8_lower(pc.utf8_trim_whitespace(
        pc.fill_null(t[text_col], "")))
    parts = pc.split_pattern_regex(col, TOKEN_SPLIT_RE)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    nonempty = pc.not_equal(flat, "")
    # per-row counts of NON-empty words: subtract empties per row
    sizes = pc.list_value_length(parts).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    row_idx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    keep = nonempty.to_numpy(zero_copy_only=False)
    return flat.filter(nonempty), row_idx[keep]


def nb_train(ds, text_col: str = "text", label_col: str = "lang",
             num_shards: int | None = None):
    """Train multinomial NB: returns a plain-dict model
    ``{"labels", "label_docs", "label_tokens", "vocab", "counts"}``
    where ``counts[i, j]`` is the token count of vocab[j] under
    labels[i].  Rows with a null label are excluded from training.
    One word-hash shard exchange for the (label, word) counts (the
    combiner carries distinct-(label, word)-per-batch, never tokens);
    label doc totals are a second tiny aggregate.  The collected
    model is vocabulary x labels — the broadcast-bounded state."""
    import ray.data.aggregate as A

    nb = num_shards or _default_shards()

    def lw_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[label_col]))
        words, row_idx = _doc_words(t, text_col)
        labels = t[label_col].take(pa.array(row_idx, pa.int64()))
        g = pa.table({"label": labels, "word": words}) \
            .group_by(["label", "word"]).aggregate([([], "count_all")])
        w = g["word"].to_numpy(zero_copy_only=False)
        return pa.table({
            "wshard": pa.array(_key_shards(w, nb, 53), pa.int64()),
            "label": g["label"], "word": g["word"],
            "n": pc.cast(g["count_all"], pa.int64())})

    def lw_total(t: pa.Table) -> pa.Table:
        g = t.group_by(["label", "word"]).aggregate([("n", "sum")])
        return g.select(["label", "word", "n_sum"]) \
                .rename_columns(["label", "word", "n"])

    lw = ds.map_batches(lw_partial, batch_format="pyarrow") \
        .groupby("wshard").map_groups(lw_total, batch_format="pyarrow")

    def doc_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[label_col]))
        g = pa.table({"label": t[label_col]}) \
            .group_by("label").aggregate([([], "count_all")])
        return pa.table({"label": g["label"],
                         "nd": pc.cast(g["count_all"], pa.int64())})

    docs = ds.map_batches(doc_partial, batch_format="pyarrow") \
        .groupby("label").aggregate(A.Sum("nd"))

    lw_parts = [b for b in lw.iter_batches(batch_format="pyarrow",
                                           batch_size=None) if b.num_rows]
    d_parts = [b for b in docs.iter_batches(batch_format="pyarrow",
                                            batch_size=None) if b.num_rows]
    if not lw_parts or not d_parts:
        return {"labels": np.array([], object),
                "label_docs": np.array([], np.int64),
                "label_tokens": np.array([], np.int64),
                "vocab": np.array([], object),
                "counts": np.zeros((0, 0), np.int64)}
    lw_t = pa.concat_tables(lw_parts)
    d_t = pa.concat_tables(d_parts).sort_by("label")
    labels = d_t["label"].to_numpy(zero_copy_only=False)
    label_docs = pc.cast(d_t["sum(nd)"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    vocab = np.unique(lw_t["word"].to_numpy(zero_copy_only=False))
    li = {l: i for i, l in enumerate(labels)}
    counts = np.zeros((len(labels), len(vocab)), np.int64)
    rl = lw_t["label"].to_numpy(zero_copy_only=False)
    rw = lw_t["word"].to_numpy(zero_copy_only=False)
    rn = lw_t["n"].to_numpy(zero_copy_only=False)
    wi = np.searchsorted(vocab, rw)
    for lab, w_i, n in zip(rl, wi, rn):  # rows = distinct (label,word)
        counts[li[lab], w_i] += n
    return {"labels": labels, "label_docs": label_docs,
            "label_tokens": counts.sum(axis=1), "vocab": vocab,
            "counts": counts}


class NbScorer:
    """Actor-pool scorer: milli-nat log matrices built ONCE per actor
    in ``__init__`` from the broadcast model; ``__call__`` scores a
    batch with one tokenize + searchsorted + per-label float-weight
    bincount (integer-valued weights, exact below 2^53).  Ties pick
    the lexicographically smallest label (labels are sorted, argmax
    takes the first maximum)."""

    def __init__(self, model_ref, text_col: str = "text",
                 key_col: str = "doc_id"):
        import ray
        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.text_col = text_col
        self.key_col = key_col
        self.labels = model["labels"]
        self.vocab = model["vocab"]
        n_docs = int(model["label_docs"].sum())
        V = len(self.vocab)
        if len(self.labels):
            denom = (model["label_tokens"] + V).astype(np.float64)
            self.mlog = _round_half_away(1000.0 * np.log(
                (model["counts"] + 1) / denom[:, None])) \
                .astype(np.int64) if V else \
                np.zeros((len(self.labels), 0), np.int64)
            self.prior = _round_half_away(1000.0 * np.log(
                model["label_docs"] / float(n_docs))).astype(np.int64)
        else:
            self.mlog = np.zeros((0, 0), np.int64)
            self.prior = np.zeros(0, np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ktype = t.schema.field(self.key_col).type
        if n == 0 or len(self.labels) == 0:
            return pa.table({
                self.key_col: pa.array([], ktype),
                "pred_label": pa.array([], pa.string()),
                "score_mnat": pa.array([], pa.int64())})
        words, row_idx = _doc_words(t, self.text_col)
        w = words.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.vocab, w)
        inv = pos < len(self.vocab)
        ok = inv.copy()
        ok[inv] = self.vocab[pos[inv]] == w[inv]  # drop OOV tokens
        pos, row_idx = pos[ok], row_idx[ok]
        scores = np.empty((n, len(self.labels)), np.int64)
        for i in range(len(self.labels)):
            scores[:, i] = np.bincount(
                row_idx, weights=self.mlog[i][pos].astype(np.float64),
                minlength=n).astype(np.int64) + self.prior[i]
        best = scores.argmax(axis=1)
        return pa.table({
            self.key_col: t[self.key_col],
            "pred_label": pa.array(self.labels[best], pa.string()),
            "score_mnat": pa.array(scores[np.arange(n), best],
                                   pa.int64())})


def nb_predict(ds, model, text_col: str = "text",
               key_col: str = "doc_id", concurrency=(1, 4)):
    """Score ``ds`` under a trained NB model: broadcast the model via
    ``ray.put`` once, actor-pool ``map_batches`` over it.
    -> Dataset(key_col, pred_label, score_mnat)."""
    import ray

    model_ref = ray.put(model)
    return ds.map_batches(
        NbScorer,
        fn_constructor_kwargs=dict(model_ref=model_ref,
                                   text_col=text_col, key_col=key_col),
        batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# logistic regression by deterministic parameter averaging
# ---------------------------------------------------------------------------

def _hash_features(texts_tbl: pa.Table, text_col: str, n_bits: int):
    """Hashed bag-of-words: (flat bucket idx, row idx) per token."""
    from .dedup import _key_hash

    words, row_idx = _doc_words(texts_tbl, text_col)
    h = _key_hash(words.to_numpy(zero_copy_only=False), 29)
    return (h % np.uint64(1 << n_bits)).astype(np.int64), row_idx


def _shard_sgd(df, w0: np.ndarray, text_col: str, key_col: str,
               label_fn_col: str, n_bits: int, lr: float):
    """One deterministic SGD epoch over a shard: rows sorted by key,
    plain logistic gradient per doc, L2-free.  Returns (weights, n)."""
    t = pa.Table.from_pandas(df, preserve_index=False) \
        if not isinstance(df, pa.Table) else df
    t = t.sort_by([(key_col, "ascending")])
    buckets, row_idx = _hash_features(t, text_col, n_bits)
    y = t[label_fn_col].to_numpy(zero_copy_only=False).astype(np.float64)
    w = w0.copy()
    n = t.num_rows
    starts = np.searchsorted(row_idx, np.arange(n + 1))
    for i in range(n):
        bi = buckets[starts[i]:starts[i + 1]]
        if len(bi) == 0:
            continue
        z = np.clip(w[bi].sum(), -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g = lr * (y[i] - p)
        np.add.at(w, bi, g)
    return w, n


def logreg_train_avg(ds, label_expr, text_col: str = "text",
                     key_col: str = "doc_id", n_bits: int = 12,
                     rounds: int = 3, lr: float = 0.5,
                     num_shards: int = 8):
    """Distributed binary logistic regression by parameter averaging:
    ``rounds`` iterations of [broadcast w -> per-shard deterministic
    SGD epoch -> doc-count-weighted average].  ``label_expr(table) ->
    pa.Array(bool/int)`` derives the 0/1 label per row.

    Shards are FIXED logical key-hash shards (``num_shards`` is part
    of the model spec, not a tuning knob), and each shard processes
    its rows in key order — so the trained weights are bit-identical
    under any physical re-blocking or cluster width.  The exchange
    per round carries (key, label, text)->shard once; weights
    (2^n_bits floats) broadcast via ray.put.

    Returns (weights float64[2^n_bits], n_rows)."""
    import ray

    def exchange(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        lab = label_expr(t)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: t[key_col],
            text_col: pc.fill_null(t[text_col], ""),
            "_y": pc.cast(lab, pa.int64()),
            "kshard": pa.array(_key_shards(keys, num_shards, 97),
                               pa.int64())})

    sharded = ds.map_batches(exchange, batch_format="pyarrow") \
        .materialize()

    w = np.zeros(1 << n_bits, np.float64)
    total = 0
    for _ in range(rounds):
        w_ref = ray.put(w)

        def epoch(t: pa.Table) -> pa.Table:
            wl, n = _shard_sgd(t, ray.get(w_ref), text_col, key_col,
                               "_y", n_bits, lr)
            return pa.table({
                "shard": pa.array([int(t["kshard"][0].as_py())],
                                  pa.int64()),
                "n": pa.array([n], pa.int64()),
                "w": pa.array([wl.tobytes()], pa.binary())})

        parts = [b for b in sharded.groupby("kshard")
                 .map_groups(epoch, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None)
                 if b.num_rows]
        if not parts:
            return w, 0
        pt = pa.concat_tables(parts).sort_by("shard")
        ns = pt["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ws = np.stack([np.frombuffer(b.as_py(), np.float64)
                       for b in pt["w"]])
        total = int(ns.sum())
        w = (ws * (ns / ns.sum())[:, None]).sum(axis=0)
    return w, total


def logreg_score(ds, weights: np.ndarray, text_col: str = "text",
                 key_col: str = "doc_id", n_bits: int = 12,
                 concurrency=(1, 4)):
    """Score docs under a trained hashed-logistic model (broadcast
    weights, actor pool).  -> Dataset(key_col, logit milli-units
    int64, pred int64) — the logit rides as round(logit*1000) so
    downstream thresholds are reproducible."""
    import ray

    w_ref = ray.put(weights)

    class Scorer:
        def __init__(self):
            self.w = ray.get(w_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ktype = t.schema.field(key_col).type
            if t.num_rows == 0:
                return pa.table({
                    key_col: pa.array([], ktype),
                    "logit_milli": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.int64())})
            buckets, row_idx = _hash_features(t, text_col, n_bits)
            z = np.bincount(row_idx, weights=self.w[buckets],
                            minlength=t.num_rows)
            zm = _round_half_away(z * 1000.0).astype(np.int64)
            return pa.table({
                key_col: t[key_col],
                "logit_milli": pa.array(zm, pa.int64()),
                "pred": pa.array((zm > 0).astype(np.int64),
                                 pa.int64())})

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=concurrency)
