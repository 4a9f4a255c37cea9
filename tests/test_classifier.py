"""functions/classifier.py: NB scoring parity on hand-computable
corpora, and logistic parameter-averaging determinism under physical
re-blocking + learnability on a separable corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from pyschema_ray.functions.classifier import (logreg_score,
                                               logreg_train_avg,
                                               nb_predict, nb_train)


def _collect(ds):
    ts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None) if b.num_rows]
    return pa.concat_tables(ts).sort_by("doc_id") if ts else None


def _docs(ids, texts, langs):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "lang": pa.array(langs, pa.string())})


def test_nb_hand_computed_two_labels():
    # en: "cat cat", fr: "chien" -> vocab {cat, chien}, V=2
    t = _docs([1, 2, 3], ["cat cat", "chien", "cat chien"],
              ["en", "fr", None])
    ds = ray.data.from_arrow(t).repartition(2)
    model = nb_train(ds)
    assert sorted(model["labels"].tolist()) == ["en", "fr"]
    assert model["vocab"].tolist() == ["cat", "chien"]
    # counts: en has cat=2, fr has chien=1
    li = {l: i for i, l in enumerate(model["labels"])}
    assert model["counts"][li["en"]].tolist() == [2, 0]
    assert model["counts"][li["fr"]].tolist() == [0, 1]
    out = _collect(nb_predict(ds, model)).to_pandas()
    # doc 1 "cat cat": en score = 2*ln(3/4) + ln(1/2) vs
    # fr = 2*ln(1/3) + ln(1/2) -> en wins
    preds = dict(zip(out["doc_id"], out["pred_label"]))
    assert preds[1] == "en"
    assert preds[2] == "fr"
    e = round(1000 * np.log(3 / 4)) * 2 + round(1000 * np.log(1 / 2))
    got = out.set_index("doc_id")["score_mnat"]
    assert got[1] == e


def test_nb_tie_breaks_to_smallest_label():
    # perfectly symmetric corpus: every doc ties -> smallest label
    t = _docs([1, 2], ["x", "x"], ["aa", "zz"])
    ds = ray.data.from_arrow(t)
    model = nb_train(ds)
    out = _collect(nb_predict(ds, model)).to_pandas()
    assert out["pred_label"].tolist() == ["aa", "aa"]


def test_nb_zero_token_label_and_oov():
    # label 'b' has only empty text (zero tokens); doc 3 is all-OOV
    t = _docs([1, 2, 3], ["hello hello", "", "unseen"],
              ["a", "b", None])
    ds = ray.data.from_arrow(t)
    model = nb_train(ds)
    out = _collect(nb_predict(ds, model)).to_pandas()
    s = out.set_index("doc_id")
    # doc 3: OOV dropped -> prior-only tie ln(1/2) both -> label 'a'
    assert s.loc[3, "pred_label"] == "a"
    assert s.loc[3, "score_mnat"] == round(1000 * np.log(0.5))
    # doc 2 (empty): same prior-only argmax
    assert s.loc[2, "pred_label"] == "a"


def test_nb_reblocking_invariance():
    rng = np.random.default_rng(3)
    words = np.array(["aa", "bb", "cc", "dd"])
    ids = list(range(200))
    texts = [" ".join(rng.choice(words, 5)) for _ in ids]
    langs = [("en" if i % 3 else "fr") for i in ids]
    t = _docs(ids, texts, langs)
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        model = nb_train(ds)
        outs.append(_collect(nb_predict(ds, model)).to_pandas())
    assert outs[0].equals(outs[1])


def _separable(n=120):
    ids = list(range(n))
    texts = [("good great nice w%d" % (i % 7)) if i % 2 == 0
             else ("bad awful poor w%d" % (i % 5)) for i in ids]
    langs = ["en" if i % 2 == 0 else "fr" for i in ids]
    return _docs(ids, texts, langs)


def test_logreg_deterministic_across_blocks():
    t = _separable()
    lab = lambda tb: pc.equal(pc.fill_null(tb["lang"], ""), "en")  # noqa: E731
    ws = []
    for nblocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        w, n = logreg_train_avg(ds, lab, rounds=2, num_shards=4)
        assert n == 120
        ws.append(w)
    assert np.array_equal(ws[0], ws[1])


def test_logreg_learns_separable_corpus():
    t = _separable()
    ds = ray.data.from_arrow(t).repartition(3)
    lab = lambda tb: pc.equal(pc.fill_null(tb["lang"], ""), "en")  # noqa: E731
    w, _ = logreg_train_avg(ds, lab, rounds=3, num_shards=4)
    out = _collect(logreg_score(ds, w)).to_pandas()
    y = np.array([1 if i % 2 == 0 else 0 for i in range(120)])
    acc = (out.sort_values("doc_id")["pred"].to_numpy() == y).mean()
    assert acc >= 0.95


def test_pca_matches_numpy_and_reblocking():
    from pyschema_ray.functions.lm import _round_half_away
    from pyschema_ray.functions.pca import pca_fit, pca_project

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (300, 2))
    # embed a 2-D signal in 8-D with distinct variances
    x = np.zeros((300, 8))
    x[:, 0] = base[:, 0] * 3.0
    x[:, 3] = base[:, 1] * 1.5
    x[:, 6] = base[:, 0] * 0.5 + base[:, 1] * 0.5
    t = pa.table({
        "vec_id": pa.array(np.arange(300), pa.int64()),
        "embedding": pa.array(list(x.astype(np.float32))),
    })
    models = []
    for nblocks in (1, 11):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        models.append(pca_fit(ds, k=3))
    # exact-integer partials -> identical eigenvalues across blocks
    assert np.array_equal(models[0]["eigvals"], models[1]["eigvals"])
    # parity with a local numpy PCA over the SAME quantized matrix
    xm = _round_half_away(x.astype(np.float32).astype(np.float64)
                          * 1000.0)
    c = np.cov(xm.T / 1000.0, bias=True)
    w = np.sort(np.linalg.eigvalsh(c))[::-1][:3]
    assert np.allclose(models[0]["eigvals"], w, rtol=1e-9, atol=1e-9)
    # projection: variance along pc1 equals the top eigenvalue
    ds = ray.data.from_arrow(t)
    proj_parts = [b for b in pca_project(ds, models[0])
                  .iter_batches(batch_format="pyarrow",
                                batch_size=None) if b.num_rows]
    out = pa.concat_tables(proj_parts).sort_by("vec_id").to_pandas()
    v1 = out["pc1"].to_numpy().var()
    assert abs(v1 - models[0]["eigvals"][0]) < 1e-6 * max(1.0, v1)
