"""IVF-PQ approximate nearest neighbor — product quantization over the
embedding column (published recipe: Jegou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — IVFADC:
coarse inverted lists + PQ codes of the residuals, asymmetric
distance computation via per-query lookup tables).

Why this exists next to ``knn_bruteforce``/``knn_ivf``: at 100 TB the
vectors themselves are the memory problem (1B x 64-d float32 = 256
GB/replica just to scan). PQ compresses each vector to ``m`` bytes
(64-d -> 8 bytes at m=8), so the scan reads ~3% of the bytes and the
codes of a trillion-token corpus fit an object-store-resident index.

Ray-Data shape (everything is a broadcast map; the ONLY driver state
is models and per-query top-k heaps):

* ``pq_train`` — coarse k-means + per-subspace residual codebooks on a
  seeded driver sample (same sampling contract as ``knn_ivf``);
* ``pq_encode`` — one streaming pass: nearest coarse centroid,
  residual, per-subspace nearest codeword; emits
  ``(key, cluster, codes fixed_size_binary(m))``;
* ``pq_search`` — per-(query, probed-cluster) ADC tables are tiny
  (nq x nprobe x m x ks floats) and broadcast; each batch gathers
  table entries by code byte — no vector math in the scan — and keeps
  a partial top-k; optional exact re-rank pass over the original
  vectors for the shortlisted candidates (candidate-bounded).

Vectors are L2-normalized at train/encode/query time so squared
Euclidean distance is a monotone proxy for cosine (d2 = 2 - 2cos);
results report ``approx_cosine = 1 - d2/2`` and re-ranked results the
exact cosine. Deterministic: seeded training, ties break to the
smaller key, scores rounded before ranking.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .similarity import (
    _as_matrix,
    _kmeans_centroids,
    _normalize,
    knn_bruteforce,
)


@dataclass
class PQModel:
    """Broadcast-sized index model: ``coarse`` is the (n_centroids, d)
    coarse codebook; ``codebooks`` the (m, ks, d/m) per-subspace
    residual codebooks."""

    coarse: np.ndarray
    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ks(self) -> int:
        return self.codebooks.shape[1]


def _sample_rows(ds, vec_col, train_sample, seed) -> np.ndarray:
    """Seeded whole-dataset sample (the knn_ivf contract: never
    ds.limit() on a big input — leading blocks are unrepresentative)."""
    n_total = ds.count()
    if n_total > train_sample:
        rows = ds.random_sample(train_sample / n_total, seed=seed).to_pandas()
        if len(rows) == 0:  # pathological tiny-fraction draw
            rows = ds.limit(train_sample).to_pandas()
    else:
        rows = ds.limit(train_sample).to_pandas()
    return _normalize(_as_matrix(rows[vec_col]))


def pq_train(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 256,
    train_sample: int = 4096,
    seed: int = 42,
) -> PQModel:
    """Train the coarse codebook and the ``m`` residual sub-codebooks
    on one seeded sample (driver-side, deterministic)."""
    sample = _sample_rows(ds, vec_col, train_sample, seed)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    if ks > 256:
        raise ValueError("pq_train: ks > 256 does not fit uint8 codes")
    coarse = _normalize(
        _kmeans_centroids(sample, n_centroids, seed=seed)
    )
    assign = np.argmax(sample @ coarse.T, axis=1)
    resid = sample - coarse[assign]
    dsub = d // m
    ks_eff = min(ks, sample.shape[0])
    codebooks = np.empty((m, ks_eff, dsub), dtype=np.float64)
    for j in range(m):
        sub = resid[:, j * dsub : (j + 1) * dsub]
        # per-subspace seed keeps the codebooks independent but the
        # whole model a pure function of (data, seed)
        codebooks[j] = _kmeans_centroids(sub, ks_eff, seed=seed + 1 + j)
    return PQModel(coarse=coarse, codebooks=codebooks)


def _codes_matrix(col, m: int) -> np.ndarray:
    """fixed_size_binary(m) column -> (n, m) uint8 matrix, zero-copy
    from the Arrow data buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = np.frombuffer(col.buffers()[1], dtype=np.uint8)
    start = col.offset * m
    return buf[start : start + len(col) * m].reshape(-1, m)


def _encode_mat(mat: np.ndarray, model: PQModel):
    """(assign, codes) for a normalized (n, d) matrix."""
    assign = np.argmax(mat @ model.coarse.T, axis=1)
    resid = mat - model.coarse[assign]
    m, ks, dsub = model.codebooks.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for j in range(m):
        sub = resid[:, j * dsub : (j + 1) * dsub]
        # (n, ks) distances in one subspace: small (dsub-dim) matmul
        d2 = (
            (sub**2).sum(1)[:, None]
            - 2.0 * sub @ model.codebooks[j].T
            + (model.codebooks[j] ** 2).sum(1)[None, :]
        )
        codes[:, j] = np.argmin(np.round(d2, 12), axis=1)
    return assign, codes


def pq_encode(
    ds: ray.data.Dataset,
    model: PQModel,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> ray.data.Dataset:
    """Streaming encode: ``(key, cluster, codes)`` — d x 4 bytes in,
    ``m`` bytes out. Pure broadcast map."""
    model_ref = ray.put((model.coarse, model.codebooks))

    def _encode(batch: pa.Table) -> pa.Table:
        coarse, books = ray.get(model_ref)
        mdl = PQModel(coarse=coarse, codebooks=books)
        mat = _normalize(_as_matrix(batch[vec_col].to_pylist()))
        assign, codes = _encode_mat(mat, mdl)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes_arr = pa.Array.from_buffers(
            pa.binary(mdl.m),
            len(codes),
            [None, pa.py_buffer(codes.tobytes())],
        )
        return pa.table(
            {
                key_col: keys,
                "cluster": pa.array(assign.astype(np.int64)),
                "codes": codes_arr,
            }
        )

    return ds.map_batches(_encode, batch_format="pyarrow")


def _adc_tables(q: np.ndarray, model: PQModel, probes: list[np.ndarray]):
    """Per-(query, probed cluster) ADC tables: ``(m, ks)`` squared
    sub-distances of the query residual to every codeword."""
    m, ks, dsub = model.codebooks.shape
    luts: dict[tuple[int, int], np.ndarray] = {}
    for qi in range(q.shape[0]):
        for c in probes[qi]:
            resid = q[qi] - model.coarse[c]
            lut = np.empty((m, ks), dtype=np.float64)
            for j in range(m):
                sub = resid[j * dsub : (j + 1) * dsub]
                lut[j] = ((model.codebooks[j] - sub[None, :]) ** 2).sum(1)
            luts[(qi, int(c))] = lut
    return luts


def pq_search(
    codes_ds: ray.data.Dataset,
    model: PQModel,
    query_vecs: np.ndarray,
    *,
    key_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
    rerank_ds: ray.data.Dataset | None = None,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ADC top-k over the encoded corpus.

    Returns ``(query_id, key, approx_cosine, rank)``; with
    ``rerank_ds`` the shortlist (``rerank_factor * k`` per query) is
    re-scored exactly against the original vectors (one candidate-
    bounded membership pass + the brute-force kernel) and the output
    carries exact ``cosine`` instead.
    """
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    sims = q @ model.coarse.T
    nprobe = min(nprobe, model.coarse.shape[0])
    probes = [
        np.argsort(-np.round(sims[qi], 12), kind="stable")[:nprobe]
        for qi in range(q.shape[0])
    ]
    luts = _adc_tables(q, model, probes)
    shortlist = (rerank_factor * k) if rerank_ds is not None else k
    lut_ref = ray.put((luts, probes))
    m = model.m

    def _scan(batch: pa.Table) -> pa.Table:
        luts_l, probes_l = ray.get(lut_ref)
        clusters = batch["cluster"].to_numpy(zero_copy_only=False)
        codes = _codes_matrix(batch["codes"], m)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        jj = np.arange(m)
        out_q, out_k, out_d = [], [], []
        for qi, probed in enumerate(probes_l):
            for c in probed:
                rows = np.flatnonzero(clusters == c)
                if not rows.size:
                    continue
                lut = luts_l[(qi, int(c))]
                d2 = lut[jj[:, None], codes[rows].T].sum(axis=0)
                top = min(shortlist, rows.size)
                # rounded lexsort, not argpartition: ties (duplicate
                # vectors) straddling the cut must resolve by key or
                # the per-batch survivors vary with partitioning
                idx = np.lexsort((keys[rows], np.round(d2, 12)))[:top]
                out_q.append(np.full(top, qi, dtype=np.int64))
                out_k.append(keys[rows[idx]])
                out_d.append(d2[idx])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                key_col: pa.array(np.concatenate(out_k)),
                "d2": pa.array(np.concatenate(out_d)),
            }
        )

    parts = codes_ds.map_batches(_scan, batch_format="pyarrow").to_pandas()
    # one lexsort over (query_id, rounded d2, key) replaces the
    # per-query selection loop; rank-within-query falls out of group
    # start offsets
    qid_p = parts["query_id"].to_numpy()
    d2r_p = np.round(parts["d2"].to_numpy(), 12)
    keys_p = parts[key_col].to_numpy()
    order_p = np.lexsort((keys_p, d2r_p, qid_p))
    qs, d2s, ks = qid_p[order_p], d2r_p[order_p], keys_p[order_p]
    if len(qs):
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        grp_start = np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
        rank_p = np.arange(len(qs)) - grp_start + 1
        keep = rank_p <= shortlist
    else:
        rank_p = np.empty(0, np.int64)
        keep = np.empty(0, bool)
    approx = pd.DataFrame(
        {
            "query_id": qs[keep],
            key_col: ks[keep],
            "approx_cosine": 1.0 - d2s[keep] / 2.0,
            "rank": rank_p[keep],
        }
    )
    if rerank_ds is None:
        return approx[approx["rank"] <= k].reset_index(drop=True)

    # exact re-rank: one candidate-bounded membership pass fetches the
    # shortlisted vectors, then each query re-scores ONLY ITS OWN
    # candidates on the driver (a shared brute-force top-k over the
    # candidate union lets another query's closer candidates crowd a
    # query's allowed keys out of the cut and silently return < k rows)
    cand = np.unique(approx[key_col].to_numpy())
    cand_ref = ray.put(np.sort(cand))

    def _member(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t[key_col], value_set=pa.array(ray.get(cand_ref)))
        )

    cand_rows = rerank_ds.map_batches(
        _member, batch_format="pyarrow", batch_size=4096
    ).to_pandas()  # shortlist-bounded: <= nq * shortlist rows
    if not len(approx):
        return pd.DataFrame(
            columns=["query_id", key_col, "cosine", "rank"]
        )
    if len(cand_rows) == 0:
        # a fully-missing rerank table (wrong key_col / wrong table)
        # must get the diagnostic, not an empty-frame KeyError (the
        # schema-less empty to_pandas doesn't even have the columns)
        raise KeyError(
            f"rerank_ds contains none of the {len(cand)} shortlisted "
            f"{key_col} values, e.g. {cand[:5].tolist()}"
        )
    cand_mat = _normalize(_as_matrix(cand_rows[vec_col]))
    cand_keys = cand_rows[key_col].to_numpy()
    # every (query, candidate) pair re-scored in one row-wise einsum;
    # key -> matrix-row lookup via searchsorted over the sorted keys
    qid_a = approx["query_id"].to_numpy()
    keys_a = approx[key_col].to_numpy()
    sort_i = np.argsort(cand_keys, kind="stable")
    raw_pos = np.searchsorted(cand_keys[sort_i], keys_a)
    clipped = np.minimum(raw_pos, len(cand_keys) - 1)
    # loud on a rerank table missing shortlisted keys — an unchecked
    # gather would silently score the next-larger key's vector
    missing = cand_keys[sort_i][clipped] != keys_a
    if missing.any():
        raise KeyError(
            f"rerank_ds is missing {int(missing.sum())} shortlisted "
            f"{key_col} value(s), e.g. {keys_a[missing][:5].tolist()}"
        )
    pos = sort_i[clipped]
    cos_a = np.einsum("ij,ij->i", cand_mat[pos], q[qid_a])
    order_a = np.lexsort((keys_a, -np.round(cos_a, 12), qid_a))
    qs_a, ks_a, cs_a = qid_a[order_a], keys_a[order_a], cos_a[order_a]
    starts_a = np.flatnonzero(np.r_[True, qs_a[1:] != qs_a[:-1]])
    grp_start_a = np.repeat(
        starts_a, np.diff(np.r_[starts_a, len(qs_a)])
    )
    rank_a = np.arange(len(qs_a)) - grp_start_a + 1
    keep_a = rank_a <= k
    return pd.DataFrame(
        {
            "query_id": qs_a[keep_a],
            key_col: ks_a[keep_a],
            "cosine": cs_a[keep_a],
            "rank": rank_a[keep_a],
        }
    )
