"""corpus_report (pipelines/metrics.py): exact counts on a constructed
corpus, dup-rate estimate, distributions, JSON-serializability."""

import json

import numpy as np
import pandas as pd
import ray
import ray.data

from ocr_dataset_builder_ray.pipelines.metrics import corpus_report


def _corpus():
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(300)]
    rows = []
    for i in range(400):
        lang = ["en", "de", "fr"][i % 3]
        dom = f"d{i % 10}.com"
        text = " ".join(rng.choice(vocab, 20))
        rows.append((i, lang, dom, text))
    # 50 exact duplicates of doc 0's text
    for i in range(400, 450):
        rows.append((i, "en", "dup.com", rows[0][3]))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "domain", "text"])


def test_corpus_report_contents(ray_session):
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(6)
    rep = corpus_report(
        ds, lang_col="lang", domain_col="domain", top_k=5
    )
    assert rep["n_docs"] == 450
    assert rep["n_tokens"]["min"] == 20 and rep["n_tokens"]["max"] == 20
    assert rep["n_tokens"]["total"] == 450 * 20
    # 400 distinct texts + 50 dups of one of them -> 400 distinct
    assert abs(rep["approx_distinct_texts"] - 400) / 400 < 0.05
    assert 0.05 < rep["approx_exact_dup_rate"] < 0.18
    assert rep["languages"]["de"] == 133 and rep["languages"]["fr"] == 133
    assert rep["languages"]["en"] == 134 + 50
    doms = {d["domain"]: d["docs"] for d in rep["top_domains"]}
    assert doms["dup.com"] == 50 and len(rep["top_domains"]) == 5
    assert len(rep["top_tokens"]) == 5
    json.dumps(rep)  # fully serializable


def test_corpus_report_partition_invariant(ray_session):
    df = _corpus()
    a = corpus_report(ray.data.from_pandas(df).repartition(2), lang_col="lang")
    b = corpus_report(ray.data.from_pandas(df).repartition(11), lang_col="lang")
    # HLL sketches merge identically regardless of block boundaries
    assert a == b


def test_corpus_report_empty(ray_session):
    df = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                       "text": pd.Series([], dtype=str)})
    rep = corpus_report(ray.data.from_pandas(df))
    assert rep == {"n_docs": 0}
