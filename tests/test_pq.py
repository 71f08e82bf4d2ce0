"""IVF-PQ (stages/pq.py): code shape, determinism, recall against the
exact brute-force baseline, and exact re-rank semantics."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.pq import (
    PQModel,
    _codes_matrix,
    _encode_mat,
    pq_encode,
    pq_search,
    pq_train,
)
from ocr_dataset_builder_ray.stages.similarity import (
    _normalize,
    knn_bruteforce,
)

D, M = 32, 8


def _clustered_vecs(n=600, n_clusters=12, seed=7):
    """Well-separated clusters with small in-cluster noise — the regime
    where IVF probing and PQ codes should recover the exact top-k."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, D)) * 8.0
    assign = rng.integers(0, n_clusters, size=n)
    # in-cluster spread large enough that top-10 distances differ by
    # more than the code quantization error (a too-tight cluster makes
    # every member equidistant and recall@10 ill-posed for ANY PQ)
    vecs = cents[assign] + rng.normal(size=(n, D)) * 1.5
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
        }
    )


@pytest.fixture(scope="module")
def vecs():
    return _clustered_vecs()


@pytest.fixture(scope="module")
def queries(vecs):
    # queries = perturbed corpus vectors: their source row must be the
    # top-1 neighbor
    rng = np.random.default_rng(3)
    rows = [10, 123, 450, 577]
    q = np.stack([np.asarray(vecs["embedding"][i], dtype=np.float64) for i in rows])
    return rows, q + rng.normal(size=q.shape) * 0.05


def test_train_and_encode_shapes(ray_session, vecs):
    ds = ray.data.from_pandas(vecs).repartition(4)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, seed=42)
    assert model.coarse.shape == (12, D)
    assert model.codebooks.shape == (M, 64, D // M)
    codes = pq_encode(ds, model)
    tbl = codes.to_pandas()
    assert len(tbl) == len(vecs)
    assert set(tbl.columns) == {"vec_id", "cluster", "codes"}
    assert all(len(c) == M for c in tbl["codes"])  # m bytes per vector
    assert tbl["cluster"].between(0, 11).all()


def test_train_rejects_bad_params(ray_session, vecs):
    ds = ray.data.from_pandas(vecs)
    with pytest.raises(ValueError):
        pq_train(ds, m=5)  # 32 % 5 != 0
    with pytest.raises(ValueError):
        pq_train(ds, m=8, ks=300)


def test_encode_partition_invariant(ray_session, vecs):
    model = pq_train(ray.data.from_pandas(vecs), n_centroids=12, m=M, ks=64)
    a = (
        pq_encode(ray.data.from_pandas(vecs).repartition(2), model)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        pq_encode(ray.data.from_pandas(vecs).repartition(11), model)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_codes_matrix_roundtrip(ray_session, vecs):
    model = pq_train(ray.data.from_pandas(vecs), n_centroids=12, m=M, ks=64)
    mat = _normalize(
        np.stack([np.asarray(v, np.float64) for v in vecs["embedding"][:50]])
    )
    assign, codes = _encode_mat(mat, model)
    import pyarrow as pa

    arr = pa.Array.from_buffers(
        pa.binary(M), len(codes), [None, pa.py_buffer(codes.tobytes())]
    )
    np.testing.assert_array_equal(_codes_matrix(arr, M), codes)
    # sliced arrays honor the offset
    np.testing.assert_array_equal(_codes_matrix(arr.slice(10, 20), M), codes[10:30])


def test_recall_vs_bruteforce(ray_session, vecs, queries):
    rows, q = queries
    ds = ray.data.from_pandas(vecs).repartition(5)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, train_sample=600)
    codes = pq_encode(ds, model).materialize()
    exact = knn_bruteforce(ds, q, k=10)
    got = pq_search(codes, model, q, k=10, nprobe=4)
    assert list(got.columns) == ["query_id", "vec_id", "approx_cosine", "rank"]
    def _recalls(res):
        out = []
        for qi in range(len(q)):
            want = set(exact[exact["query_id"] == qi]["vec_id"])
            have = set(res[res["query_id"] == qi]["vec_id"])
            out.append(len(want & have) / len(want))
        return out

    # raw ADC at an 8-byte code: textbook recall@10 without re-rank
    assert np.mean(_recalls(got)) >= 0.6, _recalls(got)
    # the perturbed source row is the top-1 hit for every query
    top1 = got[got["rank"] == 1].set_index("query_id")["vec_id"]
    for qi, src in enumerate(rows):
        assert top1[qi] == src
    # a bigger code budget buys recall (m=16, ks=256 -> 16-byte codes)
    model_hi = pq_train(ds, n_centroids=12, m=16, ks=256, train_sample=600)
    codes_hi = pq_encode(ds, model_hi).materialize()
    got_hi = pq_search(codes_hi, model_hi, q, k=10, nprobe=4)
    assert np.mean(_recalls(got_hi)) >= 0.8, _recalls(got_hi)


def test_search_partition_invariant(ray_session, vecs, queries):
    _, q = queries
    ds = ray.data.from_pandas(vecs)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, train_sample=600)
    a = pq_search(
        pq_encode(ds.repartition(2), model).materialize(), model, q, k=5
    )
    b = pq_search(
        pq_encode(ds.repartition(13), model).materialize(), model, q, k=5
    )
    pd.testing.assert_frame_equal(a, b)


def test_rerank_exact_scores(ray_session, vecs, queries):
    rows, q = queries
    ds = ray.data.from_pandas(vecs).repartition(3)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, train_sample=600)
    codes = pq_encode(ds, model).materialize()
    got = pq_search(
        codes, model, q, k=10, nprobe=4, rerank_ds=ds, rerank_factor=4
    )
    assert list(got.columns) == ["query_id", "vec_id", "cosine", "rank"]
    exact = knn_bruteforce(ds, q, k=10)
    # re-ranked scores are EXACT cosines: every returned (query, key)
    # matches the brute-force cosine for that pair
    ex = exact.set_index(["query_id", "vec_id"])["cosine"].to_dict()
    hit = 0
    for r in got.itertuples(index=False):
        if (r.query_id, r.vec_id) in ex:
            assert abs(r.cosine - ex[(r.query_id, r.vec_id)]) < 1e-9
            hit += 1
    # with a 4x shortlist on clustered data the top-k matches nearly
    # everywhere; require high overlap and exact top-1
    assert hit >= int(0.8 * len(got))
    top1 = got[got["rank"] == 1].set_index("query_id")["vec_id"]
    for qi, src in enumerate(rows):
        assert top1[qi] == src


def test_compression_ratio(ray_session, vecs):
    ds = ray.data.from_pandas(vecs)
    model = pq_train(ds, n_centroids=12, m=M, ks=64)
    raw_bytes = D * 4
    assert M / raw_bytes <= 0.0625  # 16x+ compression at m=8, 32-d f32


def test_tied_duplicate_vectors_partition_invariant(ray_session):
    # >shortlist exact-duplicate vectors in one cluster: the per-batch
    # cut must resolve ties by key or survivors vary with partitioning
    rng = np.random.default_rng(5)
    base = rng.normal(size=D)
    n_dup = 120
    vecs = pd.DataFrame(
        {
            "vec_id": np.arange(n_dup + 50, dtype=np.int64),
            "embedding": [base.astype(np.float32)] * n_dup
            + [rng.normal(size=D).astype(np.float32) for _ in range(50)],
        }
    )
    ds = ray.data.from_pandas(vecs)
    model = pq_train(ds, n_centroids=4, m=M, ks=16, train_sample=200)
    q = base[None, :] * 1.0
    results = []
    for parts in (1, 7, 13):
        codes = pq_encode(ds.repartition(parts), model).materialize()
        got = pq_search(codes, model, q, k=10, nprobe=2)
        results.append(got["vec_id"].tolist())
    assert results[0] == results[1] == results[2]
    # ties resolve to the smallest keys
    assert results[0] == sorted(results[0])


def test_rerank_missing_key_is_loud(ray_session, vecs, queries):
    """A rerank table missing shortlisted keys must raise, not silently
    score the next-larger key's vector (the unchecked-searchsorted
    hazard)."""
    _rows, q = queries
    ds = ray.data.from_pandas(vecs).repartition(3)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, train_sample=600)
    codes = pq_encode(ds, model).materialize()
    # drop half the vectors (including the largest keys, exercising the
    # out-of-range searchsorted branch) from the rerank side only
    holey = ray.data.from_pandas(vecs[vecs["vec_id"] % 2 == 0])
    with pytest.raises(KeyError, match="missing"):
        pq_search(
            codes, model, q, k=10, nprobe=4, rerank_ds=holey, rerank_factor=4
        )


def test_rerank_fully_missing_table_is_loud(ray_session, vecs, queries):
    """A rerank table sharing NO keys with the shortlist (wrong table /
    wrong key_col) must get the diagnostic KeyError, not an
    empty-array IndexError."""
    _rows, q = queries
    ds = ray.data.from_pandas(vecs).repartition(3)
    model = pq_train(ds, n_centroids=12, m=M, ks=64, train_sample=600)
    codes = pq_encode(ds, model).materialize()
    other = vecs.copy()
    other["vec_id"] = other["vec_id"] + 1_000_000
    with pytest.raises(KeyError, match="none of the"):
        pq_search(
            codes, model, q, k=10, nprobe=4,
            rerank_ds=ray.data.from_pandas(other), rerank_factor=4,
        )
