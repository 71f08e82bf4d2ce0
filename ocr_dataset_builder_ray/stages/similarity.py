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
import pyarrow as pa

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


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd) over the embedding column
# ---------------------------------------------------------------------------


def assign_nearest(
    mat: np.ndarray,
    cents: np.ndarray,
    *,
    decimals: int | None = 9,
    chunk_elems: int = 4_000_000,
) -> np.ndarray:
    """Chunked nearest-centroid (Euclidean) assignment kernel — THE
    single assignment contract: explicit (x - c)^2 distance in row
    chunks (the n x k x d temporary stays under ``chunk_elems``
    floats), distance rounded to ``decimals`` before the argmin,
    ties to the lowest centroid id (argmin first-occurrence). Shared
    by ``kmeans_assign`` and ``stages.dedup.semantic_dedup`` so the
    two can never drift apart from the q51/q59 SQL-oracle contract."""
    n = mat.shape[0]
    step = max(1, chunk_elems // max(1, cents.shape[0] * cents.shape[1]))
    out = np.empty(n, dtype=np.int64)
    for i in range(0, n, step):
        d2 = ((mat[i : i + step, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        dist = np.sqrt(d2)
        if decimals is not None:
            dist = np.round(dist, decimals)
        out[i : i + step] = np.argmin(dist, axis=1)
    return out


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    decimals: int | None = 9,
    chunk_elems: int = 4_000_000,
) -> ray.data.Dataset:
    """Nearest-centroid (Euclidean) assignment: ``(key, cluster)``.

    Centroids broadcast once via ``ray.put``; each batch computes the
    explicit (x - c)^2 distance tensor in row chunks sized so the
    n x k x d temporary stays under ``chunk_elems`` floats regardless
    of batch size / k / d. Ties (exact-duplicate vectors) break to the
    lowest cluster id (np.argmin first-occurrence), matching the SQL
    oracle's ORDER BY (dist, cid). ``decimals`` rounds the distance
    before the argmin so last-ulp summation-order differences can't
    flip an ordering against an oracle computing the same distance in
    a different association order.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    cents_ref = ray.put(cents)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _as_matrix(batch[vec_col].to_pylist())
        out = assign_nearest(
            mat, c, decimals=decimals, chunk_elems=chunk_elems
        )
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({key_col: keys, "cluster": pa.array(out, pa.int64())})

    return ds.map_batches(_assign, batch_format="pyarrow")


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_iters: int = 5,
    chunk_elems: int = 4_000_000,
) -> np.ndarray:
    """Distributed Lloyd iterations; returns the (k, d) centroids.

    Init is deterministic: the k rows with the smallest multiplicative
    hash ticket of ``key_col`` (stages/curation.py's ticket — a seeded
    sample without an order-dependent reservoir). Each iteration is
    one streaming pass: per-batch partial (cluster, count, sum) rows —
    k rows per batch, never the vectors — reduced by a k-group
    ``groupby``. Empty clusters keep their previous centroid.

    Scale note: every iteration re-executes the input pipeline (Ray
    datasets are lazy); fit on a sampled/materialized subset and use
    ``kmeans_assign`` for the full-corpus pass.
    """
    from .curation import sample_ticket

    def _init_partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_pylist(), dtype=np.int64)
        tick = sample_ticket(keys)
        # key as the tie-break so a rare 32-bit ticket collision can't
        # make the init depend on block arrival order
        top = np.lexsort((keys, tick))[:k]
        vecs = batch[vec_col].to_pylist()
        mat = _as_matrix([vecs[i] for i in top])
        return pa.table(
            {
                "ticket": pa.array(tick[top].astype(np.int64)),
                "key": pa.array(keys[top]),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    cand = ds.map_batches(_init_partial, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (r["ticket"], r["key"]))
    cents = np.asarray([r["vec"] for r in cand[:k]], dtype=np.float64)
    if cents.shape[0] < k:
        raise ValueError(f"kmeans_fit: fewer than k={k} rows in input")
    cents_ref = ray.put(cents)

    for _ in range(n_iters):

        def _partials(batch: pa.Table, _ref=cents_ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _as_matrix(batch[vec_col].to_pylist())
            n = mat.shape[0]
            step = max(1, chunk_elems // max(1, c.shape[0] * c.shape[1]))
            assign = np.empty(n, dtype=np.int64)
            for i in range(0, n, step):
                d2 = ((mat[i : i + step, None, :] - c[None, :, :]) ** 2).sum(
                    axis=2
                )
                assign[i : i + step] = np.argmin(d2, axis=1)
            sums = np.zeros((c.shape[0], mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=c.shape[0])
            present = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(present.astype(np.int64)),
                    "n": pa.array(counts[present].astype(np.int64)),
                    "vsum": pa.array(list(sums[present]), pa.list_(pa.float64())),
                }
            )

        def _reduce(group: pa.Table) -> pa.Table:
            vs = np.asarray(group["vsum"].to_pylist(), dtype=np.float64)
            return pa.table(
                {
                    "cluster": group["cluster"][:1],
                    "n": pa.array([int(np.sum(group["n"].to_numpy()))]),
                    "vsum": pa.array([vs.sum(axis=0)], pa.list_(pa.float64())),
                }
            )

        rows = (
            ds.map_batches(_partials, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(_reduce, batch_format="pyarrow")
            .take_all()
        )
        new_cents = cents.copy()
        for r in rows:
            cid = int(r["cluster"])
            if r["n"]:
                new_cents[cid] = np.asarray(r["vsum"], dtype=np.float64) / r["n"]
        cents = new_cents
        cents_ref = ray.put(cents)

    return cents
