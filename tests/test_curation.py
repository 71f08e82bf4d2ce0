"""Curation operators (stages/curation.py) vs brute-force references."""

import math

import numpy as np
import pandas as pd
import pytest
import ray

from ocr_dataset_builder_ray.stages.curation import (
    TICKET_MOD,
    pack_sequences,
    quality_percentile_filter,
    sample_ticket,
    stratified_sample,
)


def _frame(n=900, seed=11, tie_heavy=False):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 7 + 3,  # non-contiguous keys
            "lang": rng.choice(["en", "de", "zh", "fr"], n),
            "score": (
                np.full(n, 42, dtype=np.int64)
                if tie_heavy
                else rng.integers(0, 10_000, n).astype(np.int64)
            ),
        }
    )


def _brute_sample(df, fractions, default=0.0):
    tick = sample_ticket(df["doc_id"].to_numpy())
    thr = (
        df["lang"]
        .map({g: math.floor(f * TICKET_MOD) for g, f in fractions.items()})
        .fillna(math.floor(default * TICKET_MOD))
        .to_numpy()
        .astype(np.uint64)
    )
    return df[tick < thr].reset_index(drop=True)


def _brute_topk(df, frac):
    out = []
    for _, sub in df.groupby("lang"):
        k = math.ceil(frac * len(sub))
        out.append(
            sub.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        )
    return (
        pd.concat(out).sort_values("doc_id").reset_index(drop=True)
        if out
        else df.iloc[:0]
    )


def _brute_pack(df, mx):
    rows = []
    for g, sub in df.groupby("lang"):
        sid, pos, acc = 0, 0, 0
        for _, r in sub.sort_values("doc_id").iterrows():
            if pos > 0 and acc + r["score"] > mx:
                sid, pos, acc = sid + 1, 0, 0
            rows.append((g, r["doc_id"], r["score"], sid, pos))
            acc += r["score"]
            pos += 1
    return pd.DataFrame(
        rows, columns=["lang", "doc_id", "score", "seq_id", "seq_pos"]
    ).sort_values(["lang", "doc_id"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "fractions,default",
    [
        ({"en": 0.5, "de": 0.25, "zh": 0.1}, 0.0),
        ({"en": 1.0, "de": 0.0}, 0.33),
        ({}, 0.5),
    ],
)
def test_stratified_sample_matches_brute(ray_session, fractions, default):
    df = _frame()
    got = (
        stratified_sample(
            ray.data.from_pandas(df), "lang", "doc_id", fractions, default
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(_brute_sample(df, fractions, default))


def test_stratified_sample_parallelism_invariant(ray_session):
    df = _frame()
    fr = {"en": 0.4, "de": 0.6, "zh": 0.2, "fr": 0.9}
    a = (
        stratified_sample(
            ray.data.from_pandas(df), "lang", "doc_id", fr
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        stratified_sample(
            ray.data.from_pandas(df).repartition(13), "lang", "doc_id", fr
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


@pytest.mark.parametrize("frac", [0.25, 0.5, 1.0])
@pytest.mark.parametrize("n_buckets", [4096, 7])
def test_quality_percentile_matches_row_number(ray_session, frac, n_buckets):
    # tiny n_buckets forces every group through the boundary-bucket
    # exact-cut logic
    df = _frame()
    got = (
        quality_percentile_filter(
            ray.data.from_pandas(df), "lang", "score", "doc_id", frac, n_buckets
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(_brute_topk(df, frac))


def test_quality_percentile_all_ties(ray_session):
    # every score identical: one bucket holds the whole group
    # (documented tie-bounded collect); the key tiebreak must still cut
    # exactly
    df = _frame(tie_heavy=True)
    got = (
        quality_percentile_filter(
            ray.data.from_pandas(df), "lang", "score", "doc_id", 0.5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(_brute_topk(df, 0.5))


def test_pack_sequences_matches_brute(ray_session):
    df = _frame(n=400)
    got = (
        pack_sequences(ray.data.from_pandas(df), "lang", "doc_id", "score", 25_000)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    assert got[["lang", "doc_id", "seq_id", "seq_pos"]].equals(
        _brute_pack(df, 25_000)[["lang", "doc_id", "seq_id", "seq_pos"]]
    )


def test_pack_sequences_oversized_rows_get_own_sequence(ray_session):
    df = pd.DataFrame(
        {
            "lang": ["en"] * 5,
            "doc_id": np.arange(5, dtype=np.int64),
            "score": np.array([10, 99999, 10, 10, 10], dtype=np.int64),
        }
    )
    got = (
        pack_sequences(ray.data.from_pandas(df), "lang", "doc_id", "score", 100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 exceeds the budget: alone in its sequence, neighbours split
    assert got["seq_id"].tolist() == [0, 1, 2, 2, 2]
    assert got["seq_pos"].tolist() == [0, 0, 0, 1, 2]
    assert got.equals(
        _brute_pack(df, 100)
        .sort_values("doc_id")
        .reset_index(drop=True)[got.columns.tolist()]
    )


def test_fixed_size_sample_matches_ticket_order(ray_session):
    from ocr_dataset_builder_ray.stages.curation import fixed_size_sample

    df = _frame(n=700, seed=21)
    got = (
        fixed_size_sample(ray.data.from_pandas(df), "lang", "doc_id", 40)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = []
    for _, sub in df.groupby("lang"):
        tick = sample_ticket(sub["doc_id"].to_numpy())
        want.append(sub.assign(_t=tick).sort_values(["_t", "doc_id"]).head(40))
    want = (
        pd.concat(want)
        .drop(columns="_t")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # k larger than the group: whole group survives
    tiny = df.head(10)
    got_all = (
        fixed_size_sample(ray.data.from_pandas(tiny), "lang", "doc_id", 99)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got_all.equals(tiny.sort_values("doc_id").reset_index(drop=True))


def test_top_tokens_exact(ray_session):
    from ocr_dataset_builder_ray.stages.curation import top_tokens

    rng = np.random.default_rng(4)
    vocab = [f"t{i}" for i in range(40)]
    weights = np.linspace(5, 1, 40)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, 30, p=weights)) for _ in range(200)
    ] + ["", "   "]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = top_tokens(ds, "text", 10).to_pandas().reset_index(drop=True)
    exact = (
        pd.Series(" ".join(texts).split())
        .value_counts()
        .rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert got["token"].tolist() == exact["token"].tolist()
    assert got["n"].astype(int).tolist() == exact["n"].tolist()


def test_group_quantiles_matches_numpy_order_stats(ray_session):
    import math as _math

    from ocr_dataset_builder_ray.stages.curation import group_quantiles

    df = _frame(n=1200, seed=7)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = group_quantiles(
        ray.data.from_pandas(df), "lang", "score", qs, n_buckets=32
    ).sort_values("lang")
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df.lang == row["lang"], "score"].to_numpy())
        for q in qs:
            pos = max(1, int(_math.ceil(q * len(vals))))
            assert row[f"q{q}"] == vals[pos - 1], (row["lang"], q)


def test_group_quantiles_all_ties(ray_session):
    from ocr_dataset_builder_ray.stages.curation import group_quantiles

    df = _frame(n=300, seed=8, tie_heavy=True)  # every score identical
    got = group_quantiles(ray.data.from_pandas(df), "lang", "score", [0.5])
    assert (got["q0.5"] == 42).all()


def test_mix_to_proportions_exact_and_order_independent(ray_session):
    from ocr_dataset_builder_ray.stages.curation import mix_to_proportions

    df = _frame(n=1000, seed=13)
    props = {"en": 0.5, "de": 0.3, "zh": 0.2}  # 'fr' dropped entirely
    got = (
        mix_to_proportions(ray.data.from_pandas(df), "lang", "doc_id", props)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    counts = {g: int((df.lang == g).sum()) for g in props}
    n_target = min(int(math.floor(counts[g] / p)) for g, p in props.items())
    ks = {g: int(math.floor(p * n_target)) for g, p in props.items()}
    by_lang = got.groupby("lang").size().to_dict()
    assert by_lang == {g: k for g, k in ks.items() if k > 0}
    assert "fr" not in set(got["lang"])
    # binding group is kept (nearly) whole; proportions are exact
    total = sum(ks.values())
    for g, p in props.items():
        assert abs(by_lang[g] / total - p / sum(props.values())) < 0.01
    # identical result from a shuffled, re-partitioned input
    df2 = df.sample(frac=1.0, random_state=99).reset_index(drop=True)
    got2 = (
        mix_to_proportions(
            ray.data.from_pandas(df2).repartition(7), "lang", "doc_id", props
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == got2["doc_id"].tolist()


def test_temperature_mix_alpha_one_keeps_everything(ray_session):
    from ocr_dataset_builder_ray.stages.curation import temperature_mix

    df = _frame(n=800, seed=21)
    got = temperature_mix(
        ray.data.from_pandas(df), "lang", "doc_id", alpha=1.0
    ).to_pandas()
    # p_g == n_g / N exactly -> every group keeps all rows
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])


def test_temperature_mix_alpha_zero_uniform(ray_session):
    from ocr_dataset_builder_ray.stages.curation import temperature_mix

    df = _frame(n=800, seed=22)
    got = temperature_mix(
        ray.data.from_pandas(df), "lang", "doc_id", alpha=0.0
    ).to_pandas()
    sizes = got.groupby("lang").size()
    n_min = df.groupby("lang").size().min()
    # uniform proportions, no upsampling: every group cut to the
    # smallest group's size (modulo the floor in k_g)
    assert set(sizes) <= {n_min, n_min - 1}
    assert len(sizes) == df["lang"].nunique()


def test_temperature_mix_flattens(ray_session):
    from ocr_dataset_builder_ray.stages.curation import temperature_mix

    # skewed sources: en dominates
    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "lang": ["en"] * 700 + ["de"] * 200 + ["fr"] * 100,
        }
    )
    got = temperature_mix(
        ray.data.from_pandas(df), "lang", "doc_id", alpha=0.3
    ).to_pandas()
    out = got.groupby("lang").size()
    in_ratio = 700 / 100
    out_ratio = out["en"] / out["fr"]
    # flattening: the dominant/smallest ratio shrinks toward
    # (700/100)^0.3 ~ 1.79
    assert out_ratio < in_ratio / 2
    expected = (700 / 100) ** 0.3
    assert abs(out_ratio - expected) / expected < 0.2
    # matches the explicit-proportions path exactly
    from ocr_dataset_builder_ray.stages.curation import mix_to_proportions

    w = {g: n**0.3 for g, n in {"en": 700, "de": 200, "fr": 100}.items()}
    p = {g: x / sum(w.values()) for g, x in w.items()}
    via_props = mix_to_proportions(
        ray.data.from_pandas(df), "lang", "doc_id", p
    ).to_pandas()
    assert sorted(got["doc_id"]) == sorted(via_props["doc_id"])


def test_temperature_mix_rejects_bad_alpha(ray_session):
    from ocr_dataset_builder_ray.stages.curation import temperature_mix

    df = _frame(n=50)
    with pytest.raises(ValueError):
        temperature_mix(ray.data.from_pandas(df), "lang", "doc_id", alpha=1.5)


def test_null_group_values_are_loud(ray_session):
    import pandas as pd
    import pytest

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "lang": ["en", None, "de"], "score": [1.0, 2.0, 3.0]}
    )
    with pytest.raises(Exception, match="null"):
        stratified_sample(
            ray.data.from_pandas(df), "lang", "doc_id", {"en": 1.0}
        ).to_pandas()


def test_hash_split_rejects_negative_fraction():
    import pytest

    with pytest.raises(ValueError, match="negative"):
        from ocr_dataset_builder_ray.stages.curation import hash_split
        hash_split(None, "doc_id", {"train": 0.9, "val": -0.1, "test": 0.2})
