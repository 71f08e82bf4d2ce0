"""Composed web-curation pipeline (pipelines/web_curation.py): every
stage's planted artifact is removed, stage counts line up, skipping
stages works, and the chain is partition-invariant."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.pipelines.web_curation import (
    web_curation_pipeline,
)
from ocr_dataset_builder_ray.stages.classify import train_nb_classifier

NAV = "Home | Products | Contact Us"
SHARED_LINE = "this exact sentence appears in many documents verbatim"


def _corpus(seed=31):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i}" for i in range(4000)])

    def body(k=40):
        return " ".join(rng.choice(vocab, k, replace=False))

    rows = []
    kid = 0

    def add(domain, lang, text):
        nonlocal kid
        rows.append((kid, domain, lang, text))
        kid += 1

    # 30 normal docs on a.com (en), nav chrome on all of them
    for _ in range(30):
        add("a.com", "en", NAV + "\n" + body())
    # 20 normal docs on b.org (de), no chrome
    for _ in range(20):
        add("b.org", "de", body())
    # the shared line rides in 6 docs across both domains
    for i in range(6):
        dom, lang = ("a.com", "en") if i % 2 else ("b.org", "de")
        add(dom, lang, body() + "\n" + SHARED_LINE)
    # 2 pure-repetition spam docs (line-distinct so ONLY the
    # repetition gate catches them, not line dedup)
    for i in range(2):
        add("b.org", "de", " ".join(["spam"] * 60) + f" tail{i}")
    # a near-dup pair (one trailing token differs: line dedup misses,
    # MinHash at 0.9 catches)
    nd = body()
    add("a.com", "en", nd + " extraA")
    add("a.com", "en", nd + " extraB")
    return pd.DataFrame(rows, columns=["doc_id", "domain", "lang", "text"])


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.fixture(scope="module")
def quality_model(ray_session):
    rng = np.random.default_rng(7)
    vocab_g = [f"good{i}" for i in range(30)]
    vocab_b = [f"bad{i}" for i in range(30)]
    rows = []
    for i in range(200):
        lab = "good" if i % 2 else "bad"
        v = vocab_g if lab == "good" else vocab_b
        rows.append((i, lab, " ".join(rng.choice(v, 25))))
    df = pd.DataFrame(rows, columns=["doc_id", "label", "text"])
    return train_nb_classifier(
        ray.data.from_pandas(df), label_col="label"
    )


def test_full_chain_removes_planted_artifacts(ray_session, corpus):
    ds = ray.data.from_pandas(corpus).repartition(5)
    report = {}
    out = web_curation_pipeline(
        ds,
        boilerplate_min_docs=10,
        minhash_threshold=0.9,
        report=report,
    ).to_pandas()
    # boilerplate: nav stripped everywhere (30 a.com docs carried it)
    assert report["boilerplate_hot_lines"] == 1
    assert not out["text"].str.contains(NAV, regex=False).any()
    # line dedup: the shared line survives exactly once corpus-wide
    assert out["text"].str.count(SHARED_LINE.replace("|", "\\|")).sum() == 1
    assert report["line_dedup_loser_lines"] == 5
    # repetition: both spam docs gone
    assert not out["text"].str.startswith("spam spam").any()
    # minhash: one of the identical pair gone (min key survives)
    pair_ids = corpus["doc_id"].iloc[-2:].tolist()
    assert min(pair_ids) in set(out["doc_id"])
    assert max(pair_ids) not in set(out["doc_id"])
    # counts are consistent: 60 docs in, spam(2) + near-dup(1) dropped
    assert report["after_repetition"] == 58
    assert report["after_minhash"] == 57
    assert len(out) == 57


def test_quality_and_perplexity_and_mix(ray_session, corpus, quality_model):
    # docs written in the 'good' vocabulary pass the gate; the corpus
    # docs (neither vocab) are OOV on both classes — gate them with a
    # margin they can't reach, so only planted good docs survive
    rng = np.random.default_rng(8)
    planted = []
    for i in range(10):
        lab_v = "good" if i < 6 else "bad"
        words = " ".join(
            rng.choice([f"{lab_v}{j}" for j in range(30)], 25)
        )
        planted.append((1000 + i, "c.net", "en" if i % 2 else "de", words))
    df = pd.concat(
        [corpus, pd.DataFrame(planted, columns=corpus.columns)],
        ignore_index=True,
    )
    ds = ray.data.from_pandas(df)
    out = web_curation_pipeline(
        ds,
        boilerplate_min_docs=None,
        line_dedup_min_chars=None,
        max_dup_word_frac=None,
        max_top_bigram_frac=None,
        minhash_threshold=None,
        quality_model=quality_model,
        keep_label="good",
        min_margin=5.0,
        report=None,
    ).to_pandas()
    assert set(out["doc_id"]) == set(range(1000, 1006))
    # perplexity gate alone keeps ~2/3 per language
    out2 = web_curation_pipeline(
        ds,
        boilerplate_min_docs=None,
        line_dedup_min_chars=None,
        max_dup_word_frac=None,
        max_top_bigram_frac=None,
        minhash_threshold=None,
        perplexity_keep=("head", "middle"),
    ).to_pandas()
    assert 0.5 < len(out2) / len(df) < 0.8
    # temperature mix flattens languages
    out3 = web_curation_pipeline(
        ds,
        boilerplate_min_docs=None,
        line_dedup_min_chars=None,
        max_dup_word_frac=None,
        max_top_bigram_frac=None,
        minhash_threshold=None,
        temperature_alpha=0.0,
    ).to_pandas()
    sizes = out3.groupby("lang").size()
    assert sizes.max() - sizes.min() <= 1


def test_partition_invariance(ray_session, corpus):
    outs = []
    for parts in (2, 9):
        out = (
            web_curation_pipeline(
                ray.data.from_pandas(corpus).repartition(parts),
                boilerplate_min_docs=10,
                minhash_threshold=0.9,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_stage_parameter_validation(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    with pytest.raises(ValueError):
        web_curation_pipeline(ds, domain_col=None)  # boilerplate needs it
    with pytest.raises(ValueError):
        web_curation_pipeline(
            ds, boilerplate_min_docs=None, keep_label="good"
        )  # model without label
