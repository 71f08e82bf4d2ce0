"""BM25 retrieval, chunking, unigram-logprob scoring, and semantic
dedup vs brute-force numpy/python references."""

import math

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.curation import chunk_documents
from ocr_dataset_builder_ray.stages.dedup import semantic_dedup
from ocr_dataset_builder_ray.stages.filters import token_counts, unigram_logprob
from ocr_dataset_builder_ray.stages.retrieval import bm25_topk


def _corpus(n=400, seed=9):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(n):
        k = int(rng.integers(1, 80))
        texts.append(" ".join(rng.choice(vocab, k)))
    texts[0] = ""
    texts[1] = "   "
    texts[2] = "w0"
    texts[3] = "w0 w0 w0 w0 w0"
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _brute_bm25(df, terms, k=10, k1=1.2, b=0.75):
    docs = []
    for _, r in df.iterrows():
        toks = r["text"].split()
        if toks:
            docs.append((r["doc_id"], toks))
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    df_t = {t: sum(1 for _, toks in docs if t in toks) for t in terms}
    idf = {t: math.log(1 + (n - df_t[t] + 0.5) / (df_t[t] + 0.5)) for t in terms}
    rows = []
    for key, toks in docs:
        tf = {t: toks.count(t) for t in terms}
        if not any(tf.values()):
            continue
        score = sum(
            idf[t] * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * len(toks) / avgdl))
            for t in terms
            if tf[t]
        )
        rows.append((key, round(score, 9), len(toks), sum(1 for t in terms if tf[t])))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(
        rows[:k], columns=["doc_id", "score", "dl", "matched_terms"]
    )


def test_bm25_matches_brute(ray_session):
    df = _corpus()
    terms = ["w0", "w7", "w33"]
    got = bm25_topk(ray.data.from_pandas(df), terms, k=10)
    want = _brute_bm25(df, sorted(set(terms)), k=10)
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_bm25_partition_invariant(ray_session):
    df = _corpus()
    terms = ["w1", "w2"]
    a = bm25_topk(ray.data.from_pandas(df).repartition(1), terms, k=7)
    b = bm25_topk(ray.data.from_pandas(df).repartition(13), terms, k=7)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_bm25_no_match_terms(ray_session):
    df = _corpus(50)
    out = bm25_topk(ray.data.from_pandas(df), ["zzz_not_in_vocab"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score", "dl", "matched_terms"]


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def _brute_chunks(df, window, stride):
    rows = []
    for _, r in df.iterrows():
        toks = r["text"].split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, math.ceil(max(n - window, 0) / stride))
        for i in range(n_chunks):
            piece = toks[i * stride : i * stride + window]
            rows.append((r["doc_id"], i, " ".join(piece), len(piece)))
    return pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "chunk_text", "n_tokens"]
    )


@pytest.mark.parametrize("window,stride", [(32, 24), (8, 8), (16, 1)])
def test_chunk_documents_matches_brute(ray_session, window, stride):
    df = _corpus(200)
    got = (
        chunk_documents(
            ray.data.from_pandas(df).repartition(7),
            window=window,
            stride=stride,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = (
        _brute_chunks(df, window, stride)
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunk_documents_full_coverage(ray_session):
    """Every token of every document appears in at least one chunk."""
    df = _corpus(100)
    out = chunk_documents(ray.data.from_pandas(df), window=10, stride=7).to_pandas()
    for doc_id, grp in out.groupby("doc_id"):
        toks = df.loc[df["doc_id"] == doc_id, "text"].iloc[0].split()
        covered = []
        for _, r in grp.sort_values("chunk_id").iterrows():
            covered.extend(r["chunk_text"].split())
        # stride 7 < window 10: consecutive chunks overlap by 3 tokens
        assert len(covered) >= len(toks)
        assert set(covered) == set(toks)


def test_chunk_documents_rejects_bad_stride(ray_session):
    with pytest.raises(ValueError):
        chunk_documents(
            ray.data.from_pandas(_corpus(5)), window=4, stride=5
        )


# ---------------------------------------------------------------------------
# token counts / unigram logprob
# ---------------------------------------------------------------------------


def test_token_counts_exact(ray_session):
    df = _corpus(300)
    hashes, counts, total = token_counts(ray.data.from_pandas(df).repartition(9))
    all_toks = [t for txt in df["text"] for t in txt.split()]
    assert total == len(all_toks)
    assert counts.sum() == total
    assert len(hashes) == len(set(all_toks))
    assert (np.diff(hashes) > 0).all()  # sorted, unique


def test_unigram_logprob_matches_brute(ray_session):
    df = _corpus(250)
    got = (
        unigram_logprob(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    from collections import Counter

    all_toks = [t for txt in df["text"] for t in txt.split()]
    cnt = Counter(all_toks)
    total = len(all_toks)
    rows = []
    for _, r in df.iterrows():
        toks = r["text"].split()
        if not toks:
            continue
        lp = sum(math.log(cnt[t] / total) for t in toks) / len(toks)
        rows.append((r["doc_id"], len(toks), round(lp, 9)))
    want = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "logprob"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-8)


def test_unigram_logprob_extra_cols(ray_session):
    df = _corpus(60)
    df["lang"] = [f"l{i % 3}" for i in range(len(df))]
    out = (
        unigram_logprob(ray.data.from_pandas(df).repartition(4), extra_cols=("lang",))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    nonempty = df[df["text"].str.split().str.len() > 0]
    assert list(out["doc_id"]) == list(nonempty["doc_id"])
    assert list(out["lang"]) == list(nonempty["lang"])


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def _vectors(n=300, d=16, seed=3, planted=12):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    # planted near-duplicates: copies with tiny noise, keys n..n+planted
    src = rng.integers(0, n, planted)
    dup = m[src] + rng.standard_normal((planted, d)) * 1e-4
    mat = np.vstack([m, dup])
    keys = np.arange(n + planted, dtype=np.int64)
    return keys, mat, src


def _brute_semantic(keys, mat, cents, threshold):
    d = np.sqrt(((mat[:, None, :] - cents[None]) ** 2).sum(-1)).round(9)
    assign = np.argmin(d, axis=1)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    parent = {int(k): int(k) for k in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in range(len(cents)):
        idx = np.where(assign == c)[0]
        sims = nm[idx] @ nm[idx].T
        iu = np.triu_indices(len(idx), 1)
        for h in np.flatnonzero(sims[iu] >= threshold):
            a, b = int(keys[idx[iu[0][h]]]), int(keys[idx[iu[1][h]]])
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return sorted(k for k in parent if find(int(k)) == int(k))


@pytest.mark.parametrize("components", ["driver", "distributed"])
def test_semantic_dedup_matches_brute(ray_session, components):
    keys, mat, _ = _vectors()
    cents = mat[:6].copy()
    df = pd.DataFrame({"vec_id": keys, "embedding": list(mat)})
    out = semantic_dedup(
        ray.data.from_pandas(df).repartition(8),
        cents,
        threshold=0.9,
        components=components,
    )
    got = sorted(out.select_columns(["vec_id"]).to_pandas()["vec_id"])
    want = _brute_semantic(keys, mat, cents, 0.9)
    assert got == want
    assert len(got) < len(keys)  # planted dups actually dropped


def test_semantic_dedup_drops_planted_duplicates(ray_session):
    keys, mat, src = _vectors()
    cents = mat[:6].copy()
    df = pd.DataFrame({"vec_id": keys, "embedding": list(mat)})
    out = semantic_dedup(ray.data.from_pandas(df), cents, threshold=0.999)
    surv = set(out.select_columns(["vec_id"]).to_pandas()["vec_id"])
    # every planted copy (key >= 300, cosine ~1 to its source) lands in
    # its source's cluster and loses to the smaller key; no random
    # 16-d pair reaches 0.999 — survivors are exactly the originals
    assert surv == set(range(300))


# ---------------------------------------------------------------------------
# column profile
# ---------------------------------------------------------------------------


def test_profile_columns_matches_pandas(ray_session):
    from ocr_dataset_builder_ray.pipelines.metrics import profile_columns

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "a": rng.normal(10, 3, 500),
            "b": rng.uniform(0, 1, 500),
        }
    )
    df.loc[df.index % 7 == 0, "b"] = np.nan
    got = profile_columns(ray.data.from_pandas(df).repartition(9), ["a", "b"])
    assert list(got["col"]) == ["a", "b"]
    for i, c in enumerate(["a", "b"]):
        s = df[c]
        assert got["n_rows"][i] == 500
        assert got["n_nulls"][i] == int(s.isna().sum())
        assert got["min_val"][i] == s.min()
        assert got["max_val"][i] == s.max()
        want_cents = int(np.floor(s.dropna() * 100 + 0.5).sum())
        assert got["sum_cents"][i] == want_cents


def test_profile_columns_all_null_column(ray_session):
    from ocr_dataset_builder_ray.pipelines.metrics import profile_columns

    df = pd.DataFrame({"a": [np.nan, np.nan, np.nan]})
    got = profile_columns(ray.data.from_pandas(df), ["a"])
    assert got["n_rows"][0] == 3
    assert got["n_nulls"][0] == 3
    assert pd.isna(got["min_val"][0])
    assert got["sum_cents"][0] == 0


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


def test_build_postings_matches_brute(ray_session):
    """Segmented postings equal a brute-force per-(token, key-range)
    index, at a span that splits the corpus into several segments AND
    at a span covering everything (single segment per token)."""
    from ocr_dataset_builder_ray.stages.retrieval import build_postings

    df = _corpus(150)
    for key_span in (64, 65536):
        got = (
            build_postings(
                ray.data.from_pandas(df).repartition(11), key_span=key_span
            )
            .to_pandas()
            .sort_values(["token", "seg_id"])
            .reset_index(drop=True)
        )
        ref = {}
        for _, r in df.iterrows():
            for t in set(r["text"].split()):
                ref.setdefault((t, r["doc_id"] // key_span), set()).add(
                    r["doc_id"]
                )
        want = pd.DataFrame(
            sorted(
                (t, s, len(ks), ",".join(map(str, sorted(ks))))
                for (t, s), ks in ref.items()
            ),
            columns=["token", "seg_id", "df_seg", "postings"],
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_profile_columns_nan_values_count_as_nulls(ray_session):
    """NaN stored as a VALUE (not arrow null) must not crash the cents
    cast and counts as a null in the profile."""
    import pyarrow as pa

    from ocr_dataset_builder_ray.pipelines.metrics import profile_columns

    t = pa.table({"x": pa.array([1.0, float("nan"), 3.0], pa.float64())})
    got = profile_columns(ray.data.from_arrow(t), ["x"])
    assert got["n_rows"][0] == 3
    assert got["n_nulls"][0] == 1
    assert got["min_val"][0] == 1.0
    assert got["max_val"][0] == 3.0
    assert got["sum_cents"][0] == 400


def test_bm25_empty_terms(ray_session):
    out = bm25_topk(ray.data.from_pandas(_corpus(20)), [], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score", "dl", "matched_terms"]


def test_cli_search_index_profile(ray_session, tmp_path, capsys):
    """The three retrieval/profile CLI forms run in-process against a
    small parquet table and print well-formed JSON."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_dataset_builder_ray.cli import main

    df = _corpus(80)
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(df), src)

    assert main(["search", "--input", src, "--terms", "w0", "w3", "--k", "4"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < len(rows) <= 4 and {"doc_id", "score"} <= set(rows[0])

    idx = str(tmp_path / "index")
    assert main(["index", "--input", src, "--output", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # default key_span covers all 80 keys -> one segment per token
    assert out["segments"] == 50  # the corpus vocabulary

    idx2 = str(tmp_path / "index2")
    assert (
        main(
            ["index", "--input", src, "--output", idx2, "--key-span", "40"]
        )
        == 0
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 80 keys / span 40 = 2 segments; tokens spanning both double up
    assert 50 < out2["segments"] <= 100

    assert main(["profile", "--input", src, "--columns", "doc_id"]) == 0
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prof[0]["n_rows"] == 80 and prof[0]["min_val"] == 0.0


def test_redact_pii_patterns(ray_session):
    from ocr_dataset_builder_ray.stages.filters import redact_pii

    texts = [
        "mail a@b.co and c.d+x@e-f.org now",
        "ips 10.0.0.1 and 255.1.2.3",
        "call +4915123456789 ok",
        "clean text stays",
        None,
        "mixed a@b.io 1.2.3.4 +1234567",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    out = (
        redact_pii(ray.data.from_pandas(df), out_col="redacted")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["redacted"]) == [
        "mail <EMAIL> and <EMAIL> now",
        "ips <IP> and <IP>",
        "call <PHONE> ok",
        "clean text stays",
        None,
        "mixed <EMAIL> <IP> <PHONE>",
    ]
    # in-place mode rewrites the text column itself
    out2 = redact_pii(ray.data.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out2["text"][0] == "mail <EMAIL> and <EMAIL> now"


def test_group_histogram_matches_numpy(ray_session):
    from ocr_dataset_builder_ray.pipelines.metrics import group_histogram

    rng = np.random.default_rng(12)
    n = 2000
    df = pd.DataFrame(
        {
            "g": [f"g{i % 3}" for i in range(n)],
            "v": rng.uniform(-10, 110, n),
        }
    )
    df.loc[df.index % 17 == 0, "v"] = np.nan
    got = group_histogram(
        ray.data.from_pandas(df).repartition(7), "g", "v", lo=0.0, hi=100.0, n_bins=10
    )
    ref = {}
    for _, r in df.iterrows():
        if pd.isna(r["v"]):
            continue
        b = int(np.clip(np.floor((r["v"] - 0.0) / 100.0 * 10), 0, 9))
        ref[(r["g"], b)] = ref.get((r["g"], b), 0) + 1
    want = pd.DataFrame(
        sorted((g, b, c) for (g, b), c in ref.items()),
        columns=["g", "bin", "n"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # out-of-range values landed in the edge bins
    assert got[got["bin"] == 0]["n"].sum() > 0
    assert got[got["bin"] == 9]["n"].sum() > 0


def test_group_histogram_inf_and_empty_blocks(ray_session):
    from ocr_dataset_builder_ray.pipelines.metrics import group_histogram

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "v": [float("inf"), float("-inf"), 50.0, np.nan, np.nan],
        }
    )
    got = group_histogram(
        ray.data.from_pandas(df).repartition(4), "g", "v", lo=0.0, hi=100.0, n_bins=10
    )
    rows = {(r["g"], r["bin"]): r["n"] for _, r in got.iterrows()}
    # +inf clamps into the TOP bin, -inf into the bottom; the all-NaN
    # group vanishes; blocks with no valid values keep a typed schema
    assert rows == {("a", 0): 1, ("a", 5): 1, ("a", 9): 1}
