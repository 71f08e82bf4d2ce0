"""Deduplication operators over a Ray Dataset.

The reference's only dedup is key-level work-list dedup plus the F:i
repeated-content encoding (SURVEY.md §2.8); a 100 TB training-data
engine needs content dedup as a first-class operator family:

* ``exact_dedup``      — md5(content) hash-partition → per-group min-key
* ``minhash_lsh_dedup``— shingle → MinHash → LSH band groupby → verified
                         Jaccard pairs → connected components
* ``simhash_dedup``    — 64-bit SimHash, banded candidate generation,
                         Hamming-distance verification
* ``ngram_jaccard_pairs`` — exact word-n-gram Jaccard over candidate
                         pairs (the verifier; also standalone on small inputs)
* ``embedding_dedup``  — cosine near-dup over an embedding column

Scale notes (10^12-doc design):
- candidate generation is always a `map_batches` (partial, per-batch)
  followed by ONE groupby on the bucket key — no pairwise all-to-all;
- signatures are emitted as fixed-width binary columns so the shuffle
  moves sketches, not documents;
- component resolution uses min-label propagation semantics; the
  driver-side union-find here is bounded by the candidate-pair count
  (post-LSH, a tiny fraction of rows) and is flagged for promotion to
  an iterative groupby loop when pairs no longer fit the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import (
    char_shingles,
    hamming64,
    lsh_band_keys,
    md5_hex,
    minhash_params,
    minhash_signature,
    simhash64,
    word_ngrams,
)

# --- exact dedup -----------------------------------------------------------


def add_content_hash(
    ds: ray.data.Dataset, text_col: str, out_col: str = "content_hash"
) -> ray.data.Dataset:
    def _hash(t: pa.Table) -> pa.Table:
        hashes = [md5_hex(v if v is not None else "") for v in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(hashes, type=pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset, text_col: str, key_col: str
) -> ray.data.Dataset:
    """Keep, per distinct ``text_col`` value, the row with min ``key_col``.

    Hash-partition on md5(text) then per-group first — deterministic at
    any parallelism. DuckDB oracle: GROUP BY md5(text) + min(key) join.
    """
    hashed = add_content_hash(ds, text_col)

    def _first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
        return group.take(idx[:1]).drop_columns(["content_hash"])

    return hashed.groupby("content_hash").map_groups(_first, batch_format="pyarrow")


# --- minhash + LSH ---------------------------------------------------------


class MinHashStage:
    """Actor-pool stage: text → minhash signature (+ LSH band rows).

    Permutation parameters are derived once per actor in ``__init__``
    (A1 pattern); per batch it emits one row per (doc, band):
    ``(key, band_id, band_hash, signature:binary)``.
    """

    def __init__(
        self,
        text_col: str,
        key_col: str,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
    ) -> None:
        self.text_col = text_col
        self.key_col = key_col
        self.bands = bands
        self.shingle_k = shingle_k
        self.a, self.b = minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, band_ids, band_hashes, sigs = [], [], [], []
        for key, text in zip(
            batch[self.key_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = minhash_signature(char_shingles(text or "", self.shingle_k), self.a, self.b)
            blob = sig.tobytes()
            for band_id, band_hash in lsh_band_keys(sig, self.bands):
                keys.append(key)
                band_ids.append(band_id)
                band_hashes.append(band_hash)
                sigs.append(blob)
        return pa.table(
            {
                "key": pa.array(keys),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.uint64()),
                "signature": pa.array(sigs, type=pa.binary()),
            }
        )


def _components_from_pairs(pairs: list[tuple], keys: list) -> dict:
    """Union-find → {key: representative(min key)}. Driver-side; bounded
    by the verified-pair count (see module docstring scale note)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller key as root for deterministic representatives
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in pairs:
        union(a, b)
    return {k: find(k) for k in keys}


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    components: str = "driver",
) -> ray.data.Dataset:
    """Near-dup removal: keep one representative (min key) per MinHash
    cluster at estimated Jaccard ≥ ``threshold``.

    shingle→minhash→band→bucket-groupby per the standard LSH recipe;
    signature-estimated Jaccard verifies candidates before clustering.

    ``components="driver"`` resolves clusters with union-find on the
    driver (bounded by the verified-pair count); ``"distributed"``
    runs min-label propagation (stages/components.py) so no pair list
    ever materializes on the driver — the scale path when duplicate
    volume outgrows driver memory. Identical representatives either
    way (min key per component).
    """
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            text_col=text_col,
            key_col=key_col,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        rows = group.sort_values("key").drop_duplicates("key")
        ks = rows["key"].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in rows["signature"]]
        out_a, out_b, out_s = [], [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                sim = float(np.mean(sigs[i] == sigs[j]))
                if sim >= threshold:
                    out_a.append(ks[i])
                    out_b.append(ks[j])
                    out_s.append(sim)
        return pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    pairs_ds = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )

    if components == "distributed":
        from .components import min_label_components

        labels = min_label_components(
            pairs_ds, ds.select_columns([key_col]), node_col=key_col
        )
        reps = labels.map_batches(
            lambda t: t.filter(pc.equal(t["node"], t["component"])),
            batch_format="pyarrow",
        )
        keep_keys = pa.array(reps.select_columns(["node"]).to_pandas()["node"])
        keep_ref = ray.put(keep_keys)

        def _filter_dist(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[key_col], value_set=ray.get(keep_ref)))

        return ds.map_batches(_filter_dist, batch_format="pyarrow")

    pairs = [(r["a"], r["b"]) for r in pairs_ds.take_all()]
    all_keys = [r[key_col] for r in ds.select_columns([key_col]).take_all()]
    rep = _components_from_pairs(pairs, all_keys)
    keep = {k for k, root in rep.items() if k == root}
    keep_ref = ray.put(keep)

    def _filter(t: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        mask = [k in keep_set for k in t[key_col].to_pylist()]
        return t.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


# --- simhash ---------------------------------------------------------------


def add_simhash(
    ds: ray.data.Dataset, text_col: str, out_col: str = "simhash"
) -> ray.data.Dataset:
    def _sim(t: pa.Table) -> pa.Table:
        vals = [
            simhash64((v or "").lower().split()) for v in t[text_col].to_pylist()
        ]
        return t.append_column(out_col, pa.array(vals, type=pa.uint64()))

    return ds.map_batches(_sim, batch_format="pyarrow")


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    max_hamming: int = 3,
    bands: int = 4,
) -> ray.data.Dataset:
    """Near-dup removal by 64-bit SimHash with banded candidates.

    By pigeonhole, two hashes within Hamming distance < ``bands`` share
    at least one of ``bands`` 16-bit bands — groupby those band values,
    verify true Hamming distance, cluster, keep min key.
    """
    hashed = add_simhash(ds, text_col)
    width = 64 // bands
    mask = (1 << width) - 1

    def _bands(t: pa.Table) -> pa.Table:
        keys, bids, bvals, full = [], [], [], []
        for k, h in zip(t[key_col].to_pylist(), t["simhash"].to_pylist()):
            for b in range(bands):
                keys.append(k)
                bids.append(b)
                bvals.append((h >> (b * width)) & mask)
                full.append(h)
        return pa.table(
            {
                "key": pa.array(keys),
                "band_id": pa.array(bids, type=pa.int32()),
                "band_val": pa.array(bvals, type=pa.uint64()),
                "simhash": pa.array(full, type=pa.uint64()),
            }
        )

    def _verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": []})
        rows = group.sort_values("key").drop_duplicates("key")
        ks, hs = rows["key"].tolist(), rows["simhash"].tolist()
        out_a, out_b = [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                    out_a.append(ks[i])
                    out_b.append(ks[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pairs_ds = (
        hashed.map_batches(_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(_verify, batch_format="pandas")
    )
    pairs = [(r["a"], r["b"]) for r in pairs_ds.take_all()]
    keys = [r[key_col] for r in ds.select_columns([key_col]).take_all()]
    rep = _components_from_pairs(pairs, keys)
    keep = {k for k, root in rep.items() if k == root}
    keep_ref = ray.put(keep)

    def _filter(t: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        return t.filter(pa.array([k in keep_set for k in t[key_col].to_pylist()]))

    return ds.map_batches(_filter, batch_format="pyarrow")


# --- exact n-gram Jaccard (verifier / small-input standalone) --------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = word_ngrams(a or "", n), word_ngrams(b or "", n)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    if sa.size == 0 or sb.size == 0:
        return 0.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
) -> ray.data.Dataset:
    """Near-dup removal with *exact* word-n-gram Jaccard verification.

    Candidates come from MinHash-LSH over word n-grams (wide bands →
    high recall); each candidate pair is verified with true Jaccard
    before clustering. Exact pairwise only within LSH buckets — never
    all-pairs across the dataset.
    """

    class _NgramMinhash(MinHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:  # override shingling
            keys, band_ids, band_hashes, texts = [], [], [], []
            for key, text in zip(
                batch[self.key_col].to_pylist(), batch[self.text_col].to_pylist()
            ):
                sig = minhash_signature(word_ngrams(text or "", n), self.a, self.b)
                for band_id, band_hash in lsh_band_keys(sig, self.bands):
                    keys.append(key)
                    band_ids.append(band_id)
                    band_hashes.append(band_hash)
                    texts.append(text or "")
            return pa.table(
                {
                    "key": pa.array(keys),
                    "band_id": pa.array(band_ids, type=pa.int32()),
                    "band_hash": pa.array(band_hashes, type=pa.uint64()),
                    "text": pa.array(texts),
                }
            )

    band_rows = ds.map_batches(
        _NgramMinhash,
        fn_constructor_kwargs=dict(
            text_col=text_col, key_col=key_col, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def _verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        rows = group.sort_values("key").drop_duplicates("key")
        ks, ts = rows["key"].tolist(), rows["text"].tolist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                sim = ngram_jaccard(ts[i], ts[j], n)
                if sim >= threshold:
                    out_a.append(ks[i])
                    out_b.append(ks[j])
                    out_j.append(sim)
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    pairs_ds = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        _verify, batch_format="pandas"
    )
    pairs = [(r["a"], r["b"]) for r in pairs_ds.take_all()]
    keys = [r[key_col] for r in ds.select_columns([key_col]).take_all()]
    rep = _components_from_pairs(pairs, keys)
    keep = {k for k, root in rep.items() if k == root}
    keep_ref = ray.put(keep)

    def _filter(t: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        return t.filter(pa.array([k in keep_set for k in t[key_col].to_pylist()]))

    return ds.map_batches(_filter, batch_format="pyarrow")


# --- embedding cosine near-dup ---------------------------------------------


def embedding_dedup(
    ds: ray.data.Dataset,
    vec_col: str,
    key_col: str,
    *,
    threshold: float = 0.95,
    n_buckets: int = 8,
    seed: int = 42,
) -> ray.data.Dataset:
    """Cosine near-dup over an embedding column via random-hyperplane LSH.

    Per batch: sign-bucket each vector with ``log2(n_buckets)`` random
    hyperplanes (broadcast, seeded); groupby bucket; within a bucket,
    vectorized cosine matrix → pairs ≥ threshold; keep min key.
    Neighbors split across buckets are missed with probability that
    shrinks as (1 - theta/pi)^planes — the standard SimHash-LSH recall
    tradeoff; raise n_buckets=1 for exact small-input behavior.
    """
    planes_n = max(1, int(np.log2(n_buckets)))

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        planes = np.random.RandomState(seed).standard_normal((mat.shape[1], planes_n))
        bits = (mat @ planes) >= 0
        bucket = bits @ (1 << np.arange(planes_n))
        out = df[[key_col]].copy()
        out["bucket"] = bucket.astype(np.int64)
        out["vec"] = [v.tobytes() for v in mat]
        out["dim"] = mat.shape[1]
        return out

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": []})
        rows = group.sort_values(key_col)
        mat = np.stack(
            [np.frombuffer(v, dtype=np.float64) for v in rows["vec"]]
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ (mat / norms).T
        ks = rows[key_col].tolist()
        ii, jj = np.where(np.triu(sims, 1) >= threshold)
        return pd.DataFrame({"a": [ks[i] for i in ii], "b": [ks[j] for j in jj]})

    pairs_ds = (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
    pairs = [(r["a"], r["b"]) for r in pairs_ds.take_all()]
    keys = [r[key_col] for r in ds.select_columns([key_col]).take_all()]
    rep = _components_from_pairs(pairs, keys)
    keep = {k for k, root in rep.items() if k == root}
    keep_ref = ray.put(keep)

    def _filter(t: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        return t.filter(pa.array([k in keep_set for k in t[key_col].to_pylist()]))

    return ds.map_batches(_filter, batch_format="pyarrow")
