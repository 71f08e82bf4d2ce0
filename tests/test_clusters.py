"""Near-dup cluster assignment (dedup.clusters_from_pairs /
minhash_clusters): representative invariant vs minhash_lsh_dedup,
engine equality, singleton semantics."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.dedup import (
    clusters_from_pairs,
    minhash_clusters,
    minhash_lsh_dedup,
)


def _grouped_corpus():
    """Documents in known near-dup groups: identical text within a
    group (estimated Jaccard 1.0), wildly different across groups."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(4000)]
    groups = {
        0: [3, 7, 11],       # min key 3
        1: [20, 21],         # min key 20
        2: [30],             # singleton
        3: [40, 41, 42, 43], # min key 40
        4: [50],             # singleton
    }
    rows = []
    for gid, keys in groups.items():
        words = rng.choice(vocab, 60, replace=False)
        text = " ".join(words)
        for k in keys:
            rows.append((k, text))
    return pd.DataFrame(rows, columns=["doc_id", "text"]), groups


@pytest.fixture(scope="module")
def corpus():
    return _grouped_corpus()


def _expected(groups):
    out = {}
    for keys in groups.values():
        rep = min(keys)
        for k in keys:
            out[k] = rep
    return out


def test_minhash_clusters_match_groups(ray_session, corpus):
    df, groups = corpus
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        minhash_clusters(ds, "text", "doc_id", threshold=0.9)
        .to_pandas()
        .set_index("doc_id")["cluster"]
        .to_dict()
    )
    assert got == _expected(groups)


def test_survivor_invariant(ray_session, corpus):
    df, _ = corpus
    ds = ray.data.from_pandas(df).repartition(3)
    clusters = minhash_clusters(ds, "text", "doc_id", threshold=0.9).to_pandas()
    reps = set(clusters[clusters["cluster"] == clusters["doc_id"]]["doc_id"])
    survivors = set(
        minhash_lsh_dedup(ds, "text", "doc_id", threshold=0.9)
        .to_pandas()["doc_id"]
    )
    assert reps == survivors


def test_engine_equality(ray_session, corpus):
    df, _ = corpus
    ds = ray.data.from_pandas(df)
    pairs = pd.DataFrame({"a": [7, 3, 41, 40, 42], "b": [11, 7, 40, 42, 43]})
    a = (
        clusters_from_pairs(pairs, ds, "doc_id", components="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        clusters_from_pairs(pairs, ds, "doc_id", components="distributed")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    got = a.set_index("doc_id")["cluster"].to_dict()
    assert got[3] == got[7] == got[11] == 3
    assert got[40] == got[41] == got[42] == got[43] == 40
    assert got[20] == 20 and got[21] == 21  # untouched by pairs: self
    assert got[30] == 30


def test_empty_pairs_all_singletons(ray_session, corpus):
    df, _ = corpus
    ds = ray.data.from_pandas(df)
    pairs = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    got = clusters_from_pairs(pairs, ds, "doc_id").to_pandas()
    assert (got["cluster"] == got["doc_id"]).all()


def test_chain_transitivity(ray_session, corpus):
    df, _ = corpus
    ds = ray.data.from_pandas(df)
    # chain 3-7, 7-11, 11-20, 20-21: one component with min 3
    pairs = pd.DataFrame({"a": [3, 7, 11, 20], "b": [7, 11, 20, 21]})
    for comp in ("driver", "distributed"):
        got = (
            clusters_from_pairs(pairs, ds, "doc_id", components=comp)
            .to_pandas()
            .set_index("doc_id")["cluster"]
            .to_dict()
        )
        for k in (3, 7, 11, 20, 21):
            assert got[k] == 3, (comp, k, got[k])
