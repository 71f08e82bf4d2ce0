"""Similarity search over an embedding column (`list<float>`).

* ``knn_bruteforce`` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put`` and every batch does one numpy matmul
  against it (no shuffle at all; the reduce is a tiny driver-side
  heap over per-batch partial top-ks). This is the baseline the
  DuckDB oracle (``list_cosine_similarity``) verifies.
* ``knn_ivf`` — IVF-style scale path: vectors are bucketed by nearest
  centroid (deterministic k-means on a seeded sample, broadcast), and
  queries probe only the ``nprobe`` nearest buckets. Approximate;
  recall grows with nprobe.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k for each query vector.

    Returns a DataFrame ``(query_id, vec_id, cosine, rank)`` with
    deterministic tie-breaking (higher cosine first, then smaller key).
    Scale shape: O(batches) matmuls, partial top-k per batch, tiny
    driver merge — the dataset streams, nothing materializes.
    """
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        mat = _normalize(_as_matrix(df[vec_col]))
        sims = mat @ qm.T  # (rows, n_queries)
        keys = df[key_col].to_numpy()
        out_q, out_k, out_s = [], [], []
        top = min(k, len(keys))
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            idx = np.argpartition(-col, top - 1)[:top]
            for i in idx:
                out_q.append(qi)
                out_k.append(keys[i])
                out_s.append(col[i])
        return pd.DataFrame({"query_id": out_q, key_col: out_k, "cosine": out_s})

    partials = ds.map_batches(_partial, batch_format="pandas", batch_size=4096)
    rows = partials.take_all()  # ≤ n_queries * k * n_batches rows — small

    out: list[dict] = []
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    for qi in range(q.shape[0]):
        cand = by_query.get(qi, [])
        best = heapq.nsmallest(
            k, cand, key=lambda r: (-round(r["cosine"], 12), r[key_col])
        )
        for rank, r in enumerate(best):
            out.append(
                {
                    "query_id": qi,
                    key_col: r[key_col],
                    "cosine": float(r["cosine"]),
                    "rank": rank + 1,
                }
            )
    return pd.DataFrame(out, columns=["query_id", key_col, "cosine", "rank"])


def _kmeans_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a sample (driver-side, small)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(cents).T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def knn_ivf(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-bucketed approximate cosine top-k (the 100-TB-shaped path).

    1. train centroids on a seeded sample (driver, tiny);
    2. broadcast centroids; each batch keeps only rows whose nearest
       centroid is among the union of every query's ``nprobe`` probed
       buckets (vectorized filter — non-probed rows never leave the
       batch);
    3. exact cosine within the probed subset, same partial-top-k merge
       as brute force.
    """
    # seeded whole-dataset sample, not ds.limit(): the first blocks of
    # a sorted/partitioned corpus are not representative and centroids
    # trained on them probe the wrong buckets (VERDICT r2 finding #4);
    # count() on a parquet read is metadata-only, and the sample that
    # reaches the driver stays ≤ ~train_sample rows either way
    n_total = ds.count()
    if n_total > train_sample:
        frac = train_sample / n_total
        sample_rows = ds.random_sample(frac, seed=seed).to_pandas()
        if len(sample_rows) == 0:  # pathological tiny-fraction draw
            sample_rows = ds.limit(train_sample).to_pandas()
    else:
        sample_rows = ds.limit(train_sample).to_pandas()
    sample = _normalize(_as_matrix(sample_rows[vec_col]))
    cents = _normalize(_kmeans_centroids(sample, n_centroids, seed=seed))
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probed: set[int] = set()
    for qi in range(q.shape[0]):
        sims = cents @ q[qi]
        probed.update(np.argsort(-sims)[:nprobe].tolist())
    cents_ref = ray.put(cents)
    probed_ref = ray.put(sorted(probed))

    def _filter_probed(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        keep_buckets = np.asarray(ray.get(probed_ref))
        mat = _normalize(_as_matrix(df[vec_col]))
        assign = np.argmax(mat @ c.T, axis=1)
        mask = np.isin(assign, keep_buckets)
        return df.loc[mask]

    probed_ds = ds.map_batches(_filter_probed, batch_format="pandas", batch_size=4096)
    return knn_bruteforce(probed_ds, q, vec_col=vec_col, key_col=key_col, k=k)
