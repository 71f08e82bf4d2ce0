"""Distributed Naive-Bayes classifier (stages/classify.py) vs a pure
numpy/pandas driver reference — model equality, scoring equality,
partition independence, and end-to-end label recovery."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.classify import (
    NBModel,
    nb_classify,
    nb_filter,
    train_nb_classifier,
)
from ocr_dataset_builder_ray.functions.hashing import stable_hash64


def _h64(tok: str) -> np.int64:
    """Token hash reinterpreted as int64 (the bijective view the
    distributed exchange uses)."""
    return np.array([stable_hash64(tok)], dtype=np.uint64).view(np.int64)[0]


def _labeled_corpus(n=240, seed=11):
    """Two classes with skewed vocabularies + shared filler words."""
    rng = np.random.default_rng(seed)
    vocab_a = [f"alpha{i}" for i in range(25)]
    vocab_b = [f"beta{i}" for i in range(25)]
    shared = [f"fill{i}" for i in range(10)]
    rows = []
    for i in range(n):
        lab = "good" if i % 3 else "bad"
        own = vocab_a if lab == "good" else vocab_b
        k = int(rng.integers(3, 40))
        words = list(rng.choice(own, k)) + list(
            rng.choice(shared, int(rng.integers(0, 8)))
        )
        rng.shuffle(words)
        rows.append((i, lab, " ".join(words)))
    # edge rows: empty / whitespace / single-token
    rows[0] = (0, "good", "")
    rows[1] = (1, "bad", "   ")
    rows[2] = (2, "good", "solo")
    return pd.DataFrame(rows, columns=["doc_id", "label", "text"])


def _ref_model(df, alpha=1.0):
    """Driver-side reference: same hashes, same smoothing."""
    classes = sorted(df["label"].unique().tolist())
    tok_rows = []
    for _, r in df.iterrows():
        for t in r["text"].split():
            tok_rows.append((r["label"], _h64(t)))
    vocab = np.unique(np.array([h for _, h in tok_rows], dtype=np.int64))
    counts = np.zeros((len(classes), vocab.size), dtype=np.float64)
    for lab, h in tok_rows:
        counts[classes.index(lab), np.searchsorted(vocab, h)] += 1
    totals = counts.sum(axis=1)
    denom = totals + alpha * (vocab.size + 1)
    logprob = np.log((counts + alpha) / denom[:, None])
    oov = np.log(alpha / denom)
    docs = df["label"].value_counts()
    prior = np.log(
        np.array([docs[c] for c in classes], dtype=np.float64) / len(df)
    )
    return NBModel(
        classes=classes, vocab=vocab, logprob=logprob, oov=oov, log_prior=prior
    )


def _ref_scores(df, model):
    out = {}
    for _, r in df.iterrows():
        s = model.log_prior.copy()
        for t in r["text"].split():
            h = _h64(t)
            pos = np.searchsorted(model.vocab, h)
            if pos < model.vocab.size and model.vocab[pos] == h:
                s += model.logprob[:, pos]
            else:
                s += model.oov
        best = int(np.argmax(s))
        runner = sorted(s, reverse=True)[1] if len(s) > 1 else s[best]
        out[r["doc_id"]] = (model.classes[best], s[best], s[best] - runner)
    return out


@pytest.fixture(scope="module")
def corpus():
    return _labeled_corpus()


def test_model_matches_reference(ray_session, corpus):
    ds = ray.data.from_pandas(corpus).repartition(7)
    m = train_nb_classifier(ds, label_col="label")
    ref = _ref_model(corpus)
    assert m.classes == ref.classes
    np.testing.assert_array_equal(m.vocab, ref.vocab)
    np.testing.assert_allclose(m.logprob, ref.logprob, rtol=0, atol=1e-12)
    np.testing.assert_allclose(m.oov, ref.oov, rtol=0, atol=1e-12)
    np.testing.assert_allclose(m.log_prior, ref.log_prior, rtol=0, atol=1e-12)


def test_model_partition_independent(ray_session, corpus):
    a = train_nb_classifier(
        ray.data.from_pandas(corpus).repartition(2), label_col="label"
    )
    b = train_nb_classifier(
        ray.data.from_pandas(corpus).repartition(13),
        label_col="label",
        n_buckets=8,
    )
    assert a.classes == b.classes
    np.testing.assert_array_equal(a.vocab, b.vocab)
    np.testing.assert_allclose(a.logprob, b.logprob, atol=1e-12)
    np.testing.assert_allclose(a.log_prior, b.log_prior, atol=1e-12)


def test_classify_matches_reference(ray_session, corpus):
    ds = ray.data.from_pandas(corpus).repartition(5)
    m = train_nb_classifier(ds, label_col="label")
    got = nb_classify(ds, m, key_col="doc_id").to_pandas()
    ref = _ref_scores(corpus, m)
    assert len(got) == len(corpus)
    for _, r in got.iterrows():
        lab, score, margin = ref[r["doc_id"]]
        assert r["pred_label"] == lab
        assert math.isclose(r["score"], round(score, 9), abs_tol=1e-8)
        assert math.isclose(r["margin"], round(margin, 9), abs_tol=1e-8)


def test_label_recovery_and_margin(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    m = train_nb_classifier(ds, label_col="label")
    got = nb_classify(ds, m, key_col="doc_id", extra_cols=("label",)).to_pandas()
    body = got[got["doc_id"] >= 3]  # skip the degenerate edge rows
    acc = (body["pred_label"] == body["label"]).mean()
    assert acc == 1.0  # disjoint class vocabularies -> perfect recovery
    assert (body["margin"] > 0).all()
    # empty docs classify on priors alone: "good" is the 2/3 majority
    edge = got[got["doc_id"] < 2]
    assert set(edge["pred_label"]) == {"good"}


def test_classify_partition_independent(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    m = train_nb_classifier(ds, label_col="label")
    a = (
        nb_classify(ds.repartition(2), m, key_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        nb_classify(ds.repartition(11), m, key_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_nb_filter_gate(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    m = train_nb_classifier(ds, label_col="label")
    kept = nb_filter(ds, m, keep_label="bad").to_pandas()
    body = corpus[corpus["doc_id"] >= 3]
    want = set(body[body["label"] == "bad"]["doc_id"])
    assert set(kept["doc_id"]) == want
    # schema is the full input payload, untouched
    assert list(kept.columns) == ["doc_id", "label", "text"]
    with pytest.raises(ValueError):
        nb_filter(ds, m, keep_label="nope")


def test_single_class_model(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "label": ["only"] * 5,
            "text": ["a b c", "a a", "b", "", "c c c"],
        }
    )
    ds = ray.data.from_pandas(df)
    m = train_nb_classifier(ds, label_col="label")
    got = nb_classify(ds, m, key_col="doc_id").to_pandas()
    assert (got["pred_label"] == "only").all()
    assert (got["margin"] == 0.0).all()


def test_empty_input_raises(ray_session):
    df = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                       "label": pd.Series([], dtype=str),
                       "text": pd.Series([], dtype=str)})
    with pytest.raises(ValueError):
        train_nb_classifier(ray.data.from_pandas(df), label_col="label")


def test_null_label_raises_clearly(ray_session):
    # ADVICE r4: null labels used to die inside np.unique with an
    # opaque TypeError; the trainer must name the column and the fix
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "label": ["a", None, "b", "a"],
            "text": ["x y", "y z", "z", "x"],
        }
    )
    # Ray wraps the task-side ValueError in RayTaskError/UserCodeException
    with pytest.raises(Exception, match="null label"):
        train_nb_classifier(ray.data.from_pandas(df), label_col="label")


def test_empty_vocabulary_scores_on_priors(ray_session):
    """A model trained on all-empty texts has an empty vocabulary;
    scoring any document must fall back to priors+OOV, not IndexError
    (np.where evaluates both branches eagerly)."""
    import pandas as pd

    train = pd.DataFrame(
        {"doc_id": [1, 2], "label": ["a", "b"], "text": ["", "   "]}
    )
    model = train_nb_classifier(
        ray.data.from_pandas(train), label_col="label"
    )
    assert model.vocab.size == 0
    score = pd.DataFrame({"doc_id": [9], "text": ["some real words here"]})
    got = nb_classify(ray.data.from_pandas(score), model).to_pandas()
    assert len(got) == 1 and got["pred_label"].iloc[0] in ("a", "b")
    kept = nb_filter(
        ray.data.from_pandas(score), model,
        keep_label=got["pred_label"].iloc[0],
    ).to_pandas()
    assert len(kept) == 1
