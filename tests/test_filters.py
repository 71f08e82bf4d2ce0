"""Repetition / decontamination filters (stages/filters.py) and
distributed k-means (stages/similarity.py) vs brute-force references."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.filters import (
    benchmark_window_hashes,
    contamination_report,
    decontaminate,
    repetition_filter,
    repetition_signals,
)
from ocr_dataset_builder_ray.stages.similarity import (
    _as_matrix,
    kmeans_assign,
    kmeans_fit,
)


def _corpus(n=300, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n):
        k = int(rng.integers(2, 60))
        words = list(rng.choice(vocab, k))
        if i % 7 == 0:  # heavy repetition
            words = words[:3] * max(1, k // 3)
        texts.append(" ".join(words))
    # edge cases
    texts[0] = ""
    texts[1] = "   "
    texts[2] = "solo"
    texts[3] = "a b"
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _ref_signals(df):
    rows = []
    for _, r in df.iterrows():
        toks = r["text"].split()
        if len(toks) < 2:
            continue
        dup = 1.0 - len(set(toks)) / len(toks)
        bis = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        top = max(pd.Series(bis).value_counts()) / len(bis)
        rows.append((r["doc_id"], dup, top))
    return pd.DataFrame(rows, columns=["doc_id", "dup_word_frac", "top_bigram_frac"])


def test_repetition_signals_match_reference(ray_session):
    df = _corpus()
    ds = ray.data.from_pandas(df)
    got = (
        repetition_signals(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _ref_signals(df).sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["dup_word_frac"].values, want["dup_word_frac"].values)
    assert np.array_equal(
        got["top_bigram_frac"].values, want["top_bigram_frac"].values
    )


def test_repetition_filter_thresholds(ray_session):
    df = _corpus()
    ds = ray.data.from_pandas(df)
    kept = repetition_filter(
        ds, max_dup_word_frac=0.5, max_top_bigram_frac=0.2
    ).to_pandas()
    ref = _ref_signals(df)
    want = ref[(ref.dup_word_frac <= 0.5) & (ref.top_bigram_frac <= 0.2)]
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    assert 0 < len(kept) < len(ref)  # thresholds actually split this corpus


def _ref_windows(text, w):
    toks = text.split()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_contamination_matches_string_reference(ray_session):
    df = _corpus(n=200, seed=9)
    bench_df = df[df.doc_id % 10 == 0]
    eval_df = df[df.doc_id % 10 != 0]
    w = 3
    bench_wins = set()
    for t in bench_df["text"]:
        bench_wins |= _ref_windows(t, w)
    want = {}
    for _, r in eval_df.iterrows():
        toks = r["text"].split()
        hits = sum(
            1
            for i in range(len(toks) - w + 1)
            if " ".join(toks[i : i + w]) in bench_wins
        )
        if hits:
            want[r["doc_id"]] = hits
    assert want, "reference contamination is non-degenerate"

    bh = benchmark_window_hashes(ray.data.from_pandas(bench_df), w=w)
    rep = (
        contamination_report(ray.data.from_pandas(eval_df), bh, w=w)
        .to_pandas()
        .sort_values("doc_id")
    )
    got = dict(zip(rep["doc_id"], rep["n_hits"]))
    assert got == want

    clean = decontaminate(ray.data.from_pandas(eval_df), bh, w=w).to_pandas()
    assert sorted(clean["doc_id"]) == sorted(
        set(eval_df["doc_id"]) - set(want)
    )
    assert list(clean.columns) == ["doc_id", "text"]  # passthrough preserved


def test_contamination_empty_benchmark(ray_session):
    df = _corpus(n=50)
    bh = np.empty(0, dtype=np.int64)
    rep = contamination_report(ray.data.from_pandas(df), bh).to_pandas()
    assert len(rep) == 0
    clean = decontaminate(ray.data.from_pandas(df), bh).to_pandas()
    assert len(clean) == len(df)


def _vectors(n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, d))),
        }
    )


def test_kmeans_assign_matches_reference_and_ties(ray_session):
    df = _vectors()
    X = _as_matrix(df["embedding"])
    C = X[:5].copy()
    # plant an exact duplicate centroid: ties must go to the LOWEST id
    C[4] = C[1]
    got = (
        kmeans_assign(ray.data.from_pandas(df), C)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(np.round(np.sqrt(d2), 9), axis=1)
    assert np.array_equal(got["cluster"].values, want)
    assert not (got["cluster"] == 4).any()  # duplicate centroid never wins


def test_kmeans_assign_chunked_equals_unchunked(ray_session):
    df = _vectors(n=123)
    C = _as_matrix(df["embedding"])[:7]
    a = (
        kmeans_assign(ray.data.from_pandas(df), C, chunk_elems=64)
        .to_pandas()
        .sort_values("vec_id")
    )
    b = (
        kmeans_assign(ray.data.from_pandas(df), C)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert a["cluster"].tolist() == b["cluster"].tolist()


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    from ocr_dataset_builder_ray.stages.curation import sample_ticket

    df = _vectors(n=500, d=8, seed=12)
    k, iters = 6, 4
    cents = kmeans_fit(ray.data.from_pandas(df), k, n_iters=iters)
    X = _as_matrix(df["embedding"])
    ids = df["vec_id"].to_numpy().astype(np.int64)
    c = X[np.argsort(sample_ticket(ids), kind="stable")[:k]].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(k):
            m = X[a == j]
            if len(m):
                c[j] = m.mean(axis=0)
    assert np.allclose(cents, c, atol=1e-10)
    # fit centroids drive a sane assignment (every cluster non-empty here)
    assign = (
        kmeans_assign(ray.data.from_pandas(df), cents).to_pandas()["cluster"]
    )
    assert set(assign) == set(range(k))


def test_tfidf_top_terms_matches_reference(ray_session):
    import math

    from ocr_dataset_builder_ray.stages.filters import tfidf_top_terms

    df = _corpus(n=150, seed=21)
    got = (
        tfidf_top_terms(ray.data.from_pandas(df), k=2)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    # brute-force reference
    docs = {r.doc_id: r.text.split() for r in df.itertuples() if r.text.split()}
    n = len(docs)
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    rows = []
    for did, toks in docs.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        ranked = sorted(
            tf.items(),
            key=lambda kv: (-round(kv[1] * math.log(n / dfreq[kv[0]]), 9), kv[0]),
        )[:2]
        for t, f in ranked:
            rows.append((did, t, f, dfreq[t]))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "token", "tf", "df"])
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert got["df"].tolist() == want["df"].tolist()


def test_curation_pipeline_partition_independent(ray_session):
    from ocr_dataset_builder_ray.pipelines.curation import curation_pipeline

    df = _corpus(n=240, seed=31)
    bench_df = df[df.doc_id % 12 == 0]
    corp_df = df[df.doc_id % 12 != 0].copy()
    corp_df["lang"] = np.where(corp_df.doc_id % 3 == 0, "en", "de")
    props = {"en": 0.6, "de": 0.4}
    runs = []
    for parts in (1, 5):
        out = curation_pipeline(
            ray.data.from_pandas(corp_df).repartition(parts),
            ray.data.from_pandas(bench_df),
            max_dup_word_frac=0.9,
            max_top_bigram_frac=0.5,
            window=3,
            proportions=props,
        ).to_pandas()
        runs.append(out.sort_values("doc_id").reset_index(drop=True))
    assert runs[0]["doc_id"].tolist() == runs[1]["doc_id"].tolist()
    assert len(runs[0]) > 0
    # mix proportions hold exactly
    by = runs[0].groupby("lang").size()
    assert abs(by["en"] / len(runs[0]) - 0.6) < 0.02


def test_export_training_shards_deterministic(ray_session, tmp_path):
    import json

    from ocr_dataset_builder_ray.pipelines.export import export_training_shards

    df = _corpus(n=400, seed=17)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_training_shards(
        ray.data.from_pandas(df), out1, 8, key_col="doc_id"
    )
    m2 = export_training_shards(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(5),
        out2,
        8,
        key_col="doc_id",
    )
    assert m1["total_rows"] == m2["total_rows"] == len(df)
    assert m1["shards"] == m2["shards"]  # membership independent of layout
    assert len(m1["shards"]) == 8
    # shard membership is reproducible per key
    a = (
        ray.data.read_parquet(out1)
        .to_pandas()[["doc_id", "shard"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ray.data.read_parquet(out2)
        .to_pandas()[["doc_id", "shard"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["shard"].astype(int).tolist() == b["shard"].astype(int).tolist()
    disk = json.load(open(f"{out1}/_shards_manifest.json"))
    assert disk == m1


def test_hash_embed_deterministic_and_neardup_cosine(ray_session):
    from ocr_dataset_builder_ray.stages.filters import hash_embed

    df = _corpus(n=120, seed=41)
    a = (
        hash_embed(ray.data.from_pandas(df), dim=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        hash_embed(ray.data.from_pandas(df).repartition(6), dim=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    for va, vb in zip(a["embedding"], b["embedding"]):
        assert np.array_equal(np.asarray(va), np.asarray(vb))
    # empty/whitespace docs dropped, all vectors unit norm
    assert 0 not in set(a["doc_id"]) and 1 not in set(a["doc_id"])
    norms = np.array([np.linalg.norm(v) for v in a["embedding"]])
    assert np.allclose(norms, 1.0)
    # a near-duplicate text lands closer to its source than a random doc
    base = df.loc[10, "text"]
    df2 = pd.concat(
        [
            df,
            pd.DataFrame(
                {"doc_id": [9000], "text": [base + " extraword"]}
            ),
        ],
        ignore_index=True,
    )
    e = hash_embed(ray.data.from_pandas(df2), dim=32).to_pandas()
    vecs = {r.doc_id: np.asarray(r.embedding) for r in e.itertuples()}
    near = float(vecs[9000] @ vecs[10])
    far = float(vecs[9000] @ vecs[50])
    assert near > 0.9 and near > far


# --- perplexity_buckets (CCNet head/middle/tail) ---------------------------


def _ppl_corpus(n=300, seed=17):
    rng = np.random.default_rng(seed)
    vocab_common = ["the", "a", "of", "and", "to"]
    vocab_rare = [f"rare{i}" for i in range(400)]
    rows = []
    for i in range(n):
        lang = "en" if i % 3 else "de"
        # vary the common/rare mix so logprob spreads widely
        n_common = int(rng.integers(0, 20))
        n_rare = int(rng.integers(1, 10))
        words = list(rng.choice(vocab_common, n_common)) + list(
            rng.choice(vocab_rare, n_rare)
        )
        rng.shuffle(words)
        rows.append((i, lang, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def _disc_quantile(vals, q):
    """SQL quantile_disc: value at 1-indexed position ceil(q*n)."""
    import math as _math

    s = np.sort(vals)
    pos = max(1, int(_math.ceil(q * len(s))))
    return s[pos - 1]


def test_perplexity_buckets_match_reference(ray_session):
    from ocr_dataset_builder_ray.stages.filters import (
        perplexity_buckets,
        unigram_logprob,
    )

    df = _ppl_corpus()
    ds = ray.data.from_pandas(df).repartition(5)
    got = perplexity_buckets(ds).to_pandas()
    # reference: trusted unigram_logprob output + literal disc-quantile
    scored = unigram_logprob(
        ray.data.from_pandas(df), extra_cols=("lang",)
    ).to_pandas()
    assert len(got) == len(scored)
    for lang, sub in scored.groupby("lang"):
        lo = _disc_quantile(sub["logprob"].to_numpy(), 1 / 3)
        hi = _disc_quantile(sub["logprob"].to_numpy(), 2 / 3)
        g = got[got["lang"] == lang].set_index("doc_id")
        for _, r in sub.iterrows():
            want = (
                "head"
                if r["logprob"] >= hi
                else ("middle" if r["logprob"] >= lo else "tail")
            )
            assert g.loc[r["doc_id"], "bucket"] == want
    # distinct scores -> terciles within 2 rows of n/3 per language
    for lang, sub in got.groupby("lang"):
        sizes = sub.groupby("bucket").size()
        n = len(sub)
        if sub["logprob"].nunique() == n:
            for b in ("head", "middle", "tail"):
                assert abs(sizes.get(b, 0) - n / 3) <= 2, (lang, dict(sizes))


def test_perplexity_buckets_partition_invariant(ray_session):
    from ocr_dataset_builder_ray.stages.filters import perplexity_buckets

    df = _ppl_corpus(n=200, seed=18)
    a = (
        perplexity_buckets(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        perplexity_buckets(ray.data.from_pandas(df).repartition(11))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_perplexity_buckets_all_ties(ray_session):
    from ocr_dataset_builder_ray.stages.filters import perplexity_buckets

    # identical docs -> identical logprob -> everything is 'head'
    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "lang": ["en"] * 30,
            "text": ["same text here"] * 30,
        }
    )
    got = perplexity_buckets(ray.data.from_pandas(df)).to_pandas()
    assert (got["bucket"] == "head").all()


def test_perplexity_buckets_label_validation(ray_session):
    from ocr_dataset_builder_ray.stages.filters import perplexity_buckets

    df = _ppl_corpus(n=30)
    with pytest.raises(ValueError):
        perplexity_buckets(
            ray.data.from_pandas(df), labels=("only", "two")
        )


def test_perplexity_gate_equals_bucket_selection(ray_session):
    from ocr_dataset_builder_ray.stages.filters import (
        perplexity_buckets,
        perplexity_gate,
    )

    df = _ppl_corpus(n=240, seed=19)
    df.loc[5, "text"] = ""  # empty doc: never passes any gate
    ds = ray.data.from_pandas(df).repartition(4)
    buckets = perplexity_buckets(ds).to_pandas()
    for keep in (("head",), ("head", "middle"), ("head", "middle", "tail")):
        got = set(
            perplexity_gate(ds, keep=keep).to_pandas()["doc_id"]
        )
        want = set(buckets[buckets["bucket"].isin(keep)]["doc_id"])
        assert got == want, keep
        assert 5 not in got


def test_perplexity_gate_keeps_full_schema(ray_session):
    from ocr_dataset_builder_ray.stages.filters import perplexity_gate

    df = _ppl_corpus(n=60, seed=20)
    got = perplexity_gate(ray.data.from_pandas(df)).to_pandas()
    assert list(got.columns) == ["doc_id", "lang", "text"]
    assert 0 < len(got) < len(df)


def test_perplexity_gate_rejects_non_contiguous(ray_session):
    from ocr_dataset_builder_ray.stages.filters import perplexity_gate

    df = _ppl_corpus(n=30)
    for keep in (("middle",), ("tail",), ("head", "tail"), ("nope",)):
        with pytest.raises(ValueError):
            perplexity_gate(ray.data.from_pandas(df), keep=keep)


# --- blockword_filter (C4 banned-word rule) + hash_split -------------------


def test_blockword_filter(ray_session):
    from ocr_dataset_builder_ray.stages.filters import blockword_filter

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "a clean document with plain words",
                "contains BadWord right here",
                "badword twice badword here",
                "punctuation-attached badword, does not match",  # token is 'badword,'
                "",
                "BADWORD",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    kept = blockword_filter(ds, ["badword"]).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 3, 4]
    # case-sensitive: only exact-case tokens match
    kept_cs = blockword_filter(
        ds, ["badword"], case_insensitive=False
    ).to_pandas()
    assert sorted(kept_cs["doc_id"]) == [0, 1, 3, 4, 5]
    # max_hits allows single occurrences
    kept1 = blockword_filter(ds, ["badword"], max_hits=1).to_pandas()
    assert sorted(kept1["doc_id"]) == [0, 1, 3, 4, 5]
    # audit mode counts instead of filtering
    counts = (
        blockword_filter(ds, ["badword"], count_col="hits")
        .to_pandas()
        .set_index("doc_id")["hits"]
        .to_dict()
    )
    assert counts == {0: 0, 1: 1, 2: 2, 3: 0, 4: 0, 5: 1}
    with pytest.raises(ValueError):
        blockword_filter(ds, [])


def test_hash_split(ray_session):
    from ocr_dataset_builder_ray.stages.curation import (
        TICKET_MOD,
        hash_split,
        sample_ticket,
    )

    n = 2000
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64) * 13 + 1,
         "text": ["x"] * n}
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = (
        hash_split(ray.data.from_pandas(df).repartition(7), "doc_id", fr)
        .to_pandas()
    )
    sizes = got.groupby("split").size()
    assert abs(sizes["train"] / n - 0.8) < 0.03
    assert abs(sizes["val"] / n - 0.1) < 0.02
    assert got["split"].notna().all()  # fractions sum to 1
    # exact ticket-range reference
    tick = sample_ticket(df["doc_id"].to_numpy())
    b1, b2 = int(0.8 * TICKET_MOD), int(0.9 * TICKET_MOD)
    want = np.where(tick < b1, "train", np.where(tick < b2, "val", "test"))
    merged = got.set_index("doc_id")["split"]
    assert (merged.loc[df["doc_id"]].to_numpy() == want).all()
    # stability: a row's split is unchanged when the corpus grows
    bigger = pd.concat(
        [df, pd.DataFrame({"doc_id": [10_000_001], "text": ["y"]})],
        ignore_index=True,
    )
    got2 = hash_split(
        ray.data.from_pandas(bigger), "doc_id", fr
    ).to_pandas().set_index("doc_id")["split"]
    assert (got2.loc[df["doc_id"]] == merged.loc[df["doc_id"]]).all()
    # partial fractions leave a None remainder
    got3 = hash_split(
        ray.data.from_pandas(df), "doc_id", {"sample": 0.25}
    ).to_pandas()
    assert got3["split"].isna().sum() > 0
    with pytest.raises(ValueError):
        hash_split(ray.data.from_pandas(df), "doc_id", {"a": 0.7, "b": 0.4})


def test_perplexity_null_lang_deterministic(ray_session):
    from ocr_dataset_builder_ray.stages.filters import (
        perplexity_buckets,
        perplexity_gate,
    )

    df = _ppl_corpus(n=90, seed=21)
    df.loc[[3, 40], "lang"] = None
    ds = ray.data.from_pandas(df)
    buckets = perplexity_buckets(ds).to_pandas().set_index("doc_id")
    assert (buckets.loc[[3, 40], "bucket"] == "tail").all()
    # partition-invariant (the old -1 wraparound was batch-dependent)
    b2 = (
        perplexity_buckets(ray.data.from_pandas(df).repartition(9))
        .to_pandas()
        .set_index("doc_id")
    )
    assert (buckets["bucket"].sort_index() == b2["bucket"].sort_index()).all()
    # gate: null-lang docs drop with head+middle, pass when tail kept
    kept = set(
        perplexity_gate(ds, keep=("head", "middle")).to_pandas()["doc_id"]
    )
    assert not {3, 40} & kept
    kept_all = set(
        perplexity_gate(
            ds, keep=("head", "middle", "tail")
        ).to_pandas()["doc_id"]
    )
    assert {3, 40} <= kept_all


def test_compression_filter(ray_session):
    from ocr_dataset_builder_ray.functions.textstats import compression_ratio
    from ocr_dataset_builder_ray.stages.filters import compression_filter

    rep = "spam ham " * 300                      # highly compressible
    nat = ("the quick brown fox jumps over the lazy dog and then "
           "wanders through seventeen unrelated meadows musing ") * 6
    import random
    rng = random.Random(5)
    gib = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(2000))
    assert compression_ratio(rep) < compression_ratio(nat) < compression_ratio(gib)
    assert compression_ratio("") == 1.0

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [rep, nat, gib]})
    kept = compression_filter(
        ray.data.from_pandas(df), min_ratio=compression_ratio(rep) + 1e-6,
        max_ratio=compression_ratio(gib) - 1e-6, out_col="cr",
    ).to_pandas()
    assert kept["doc_id"].tolist() == [2]
    assert abs(kept["cr"].iloc[0] - compression_ratio(nat)) < 1e-9


def _bigram_reference(texts, keys, lam, min_count):
    """Literal-python interpolated bigram scorer."""
    from collections import Counter

    uni, bi = Counter(), Counter()
    toks = {k: t.split() for k, t in zip(keys, texts)}
    for tk in toks.values():
        uni.update(tk)
        bi.update(zip(tk, tk[1:]))
    n = sum(uni.values())
    bi = {p: c for p, c in bi.items() if c >= min_count}
    out = {}
    for k, tk in toks.items():
        if len(tk) < 2:
            continue
        lps = []
        for a, b in zip(tk, tk[1:]):
            p = lam * (bi.get((a, b), 0) / uni[a]) + (1 - lam) * (uni[b] / n)
            lps.append(np.log(p))
        out[k] = (len(lps), round(float(np.mean(lps)), 9))
    return out


def test_bigram_logprob_matches_reference(ray_session):
    from ocr_dataset_builder_ray.stages.filters import bigram_logprob

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 30)))
        for _ in range(80)
    ]
    texts += ["solo", ""]  # <2 tokens: dropped
    keys = list(range(len(texts)))
    df = pd.DataFrame({"doc_id": keys, "text": texts})
    want = _bigram_reference(texts, keys, lam=0.9, min_count=2)

    outs = []
    for nparts in (1, 5):
        got = (
            bigram_logprob(
                ray.data.from_pandas(df).repartition(nparts),
                lam=0.9, min_count=2,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    got = outs[0]
    assert sorted(got["doc_id"]) == sorted(want)
    for r in got.itertuples(index=False):
        n, lp = want[r.doc_id]
        assert r.n_bigrams == n
        assert abs(r.logprob - lp) < 1e-8, (r.doc_id, r.logprob, lp)
    # bigram scores must order a shuffled-token doc below natural text
    # built from the same tokens (unigram scores cannot tell them apart)
    base = "alpha beta gamma delta " * 20
    shuf = base.split(); rng.shuffle(shuf)
    df2 = pd.DataFrame({"doc_id": [0, 1], "text": [base, " ".join(shuf)]})
    corpus = pd.concat([df, df2.assign(doc_id=[1000, 1001])])
    s = (
        bigram_logprob(ray.data.from_pandas(corpus), lam=0.9, min_count=2)
        .to_pandas()
        .set_index("doc_id")["logprob"]
    )
    assert s[1000] > s[1001]


def test_bigram_logprob_pure_backoff(ray_session):
    """Every bigram unique (all below min_count): the pruned table is
    empty and scoring must degrade to pure unigram backoff, not crash
    on the schema-less empty aggregate."""
    from ocr_dataset_builder_ray.stages.filters import bigram_logprob

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b", "c d", "e f"]}
    )
    got = (
        bigram_logprob(ray.data.from_pandas(df), lam=0.9, min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _bigram_reference(df["text"], df["doc_id"], lam=0.9, min_count=2)
    assert len(got) == 3
    for r in got.itertuples(index=False):
        n, lp = want[r.doc_id]
        assert r.n_bigrams == n and abs(r.logprob - lp) < 1e-8
