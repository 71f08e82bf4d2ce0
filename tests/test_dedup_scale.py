"""Over-cap bucket kernels: the memory-bounded recursive paths must
produce the same pairs as a brute-force reference (simhash: exactly;
embedding: exactly when the exact margin applies, else >= measured
recall on planted near-identical pairs).

These guard the VERDICT r2 scale fixes: a hot LSH bucket (every row
sharing one band value) must never allocate O(m x m); see
``bench.py --dedup`` "hot_bucket" for the volume evidence (200k rows,
169/590 MB peak RSS)."""

import numpy as np
import pandas as pd
import pytest

from ocr_dataset_builder_ray.stages.dedup import (
    _BUCKET_PAIR_CAP,
    _cosine_pairs_recursive,
    _simhash_bucket_pairs,
    _tiled_cosine_pairs,
    _tiled_hamming_pairs,
)

_FREE_BITS = np.array([b for b in range(64) if b >= 16], dtype=np.int64)


def _brute_hamming(ks, hs, max_h):
    out = set()
    for i in range(len(ks)):
        x = hs[i] ^ hs
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.where(ham <= max_h)[0]:
            if i < j:
                out.add((int(ks[i]), int(ks[j])))
    return out


def _hot_hashes(m: int, seed: int = 5) -> np.ndarray:
    """m hashes sharing band 0's 16 bits; planted hamming<=3 pairs."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 2**63, size=m, dtype=np.int64).astype(np.uint64)
    hs = (base & ~np.uint64(0xFFFF)) | np.uint64(0x1234)
    for i in range(m // 10):
        hs[2 * i + 1] = hs[2 * i] ^ (np.uint64(1) << np.uint64(20 + (i % 40)))
    return hs


def test_simhash_overcap_matches_bruteforce():
    """m > cap forces the recursive bit-block path; pair set must equal
    brute force exactly (the split is pigeonhole-exact)."""
    m = _BUCKET_PAIR_CAP + 1500
    hs = _hot_hashes(m)
    ks = np.arange(m, dtype=np.int64)
    a, b = _simhash_bucket_pairs(ks, hs, _FREE_BITS, 3)
    got = set(zip(a.tolist(), b.tolist()))
    # brute force on a subsample is too slow at 5.5k; instead compare
    # against the TILED direct kernel, which the small-bucket tests pin
    oa, ob = [], []
    _tiled_hamming_pairs(ks, hs, 3, oa, ob)
    want = set(zip(np.concatenate(oa).tolist(), np.concatenate(ob).tolist()))
    assert got == want and len(want) >= m // 10


def test_simhash_tiled_matches_bruteforce_small():
    rng = np.random.RandomState(3)
    m = 300
    hs = _hot_hashes(m, seed=9)
    ks = np.arange(m, dtype=np.int64)
    oa, ob = [], []
    _tiled_hamming_pairs(ks, hs, 3, oa, ob)
    got = set(zip(np.concatenate(oa).tolist(), np.concatenate(ob).tolist()))
    assert got == _brute_hamming(ks, hs, 3)


def test_simhash_identical_hash_star():
    """An over-cap all-identical group emits a star with the min key as
    hub — same connected component as the full clique."""
    m = _BUCKET_PAIR_CAP + 100
    hs = np.full(m, np.uint64(0xABCD_1234_0000_1234), dtype=np.uint64)
    ks = np.arange(m, dtype=np.int64)
    a, b = _simhash_bucket_pairs(ks, hs, _FREE_BITS, 3)
    assert len(a) == m - 1
    assert (np.asarray(a) == 0).all()
    assert set(np.asarray(b).tolist()) == set(range(1, m))


def test_cosine_overcap_exact_low_dim():
    """In low dimension the exact margin delta >= projection spread, so
    the recursive split loses nothing: pair set equals the tiled direct
    kernel exactly."""
    rng = np.random.RandomState(7)
    m, dim = _BUCKET_PAIR_CAP + 1200, 4
    base = rng.standard_normal((m, dim))
    for i in range(m // 10):
        base[2 * i + 1] = base[2 * i] + 0.01 * rng.standard_normal(dim)
    nm = base / np.linalg.norm(base, axis=1, keepdims=True)
    ks = np.arange(m, dtype=np.int64)
    threshold = 0.95
    oa, ob = [], []
    _cosine_pairs_recursive(ks, nm, threshold, 42, 0, oa, ob)
    got = set(
        pd.DataFrame(
            {"a": np.concatenate(oa), "b": np.concatenate(ob)}
        ).drop_duplicates().itertuples(index=False, name=None)
    )
    oa2, ob2 = [], []
    _tiled_cosine_pairs(ks, nm, threshold, oa2, ob2)
    want = set(zip(np.concatenate(oa2).tolist(), np.concatenate(ob2).tolist()))
    assert got == want and len(want) > 0


def test_cosine_overcap_high_dim_planted_recall():
    """In high dimension the spill band is approximate; planted
    near-identical pairs (cosine ~0.9998) must all survive."""
    rng = np.random.RandomState(17)
    m, dim = _BUCKET_PAIR_CAP + 2000, 64
    n_plant = m // 10
    base = rng.standard_normal((m, dim))
    for i in range(n_plant):
        base[2 * i + 1] = base[2 * i] + 0.02 * rng.standard_normal(dim)
    nm = base / np.linalg.norm(base, axis=1, keepdims=True)
    ks = np.arange(m, dtype=np.int64)
    oa, ob = [], []
    _cosine_pairs_recursive(ks, nm, 0.99, 42, 0, oa, ob)
    got = set(
        pd.DataFrame(
            {"a": np.concatenate(oa), "b": np.concatenate(ob)}
        ).drop_duplicates().itertuples(index=False, name=None)
    )
    planted = {(2 * i, 2 * i + 1) for i in range(n_plant)}
    assert planted <= got


def test_cosine_identical_vector_star():
    m, dim = _BUCKET_PAIR_CAP + 50, 8
    nm = np.tile(np.ones(dim) / np.sqrt(dim), (m, 1))
    ks = np.arange(m, dtype=np.int64)
    oa, ob = [], []
    _cosine_pairs_recursive(ks, nm, 0.99, 42, 0, oa, ob)
    a = np.concatenate(oa)
    b = np.concatenate(ob)
    assert len(a) == m - 1 and (a == 0).all()
    assert set(b.tolist()) == set(range(1, m))


@pytest.mark.parametrize("n_buckets", ["auto", 1])
def test_embedding_dedup_auto_buckets_survivors(ray_session, n_buckets):
    """n_buckets='auto' (data-sized) and n_buckets=1 (exact) agree on a
    corpus of well-separated vectors + tight planted duplicate pairs
    (planted dups land in one bucket under any hyperplane cut with
    overwhelming probability at this scale)."""
    import ray.data

    rng = np.random.RandomState(23)
    n, dim = 600, 16
    base = rng.standard_normal((n, dim))
    for i in range(60):
        base[2 * i + 1] = base[2 * i] + 0.001 * rng.standard_normal(dim)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(n)]
    from ocr_dataset_builder_ray.stages.dedup import embedding_dedup

    ds = ray.data.from_items(rows)
    kept = embedding_dedup(
        ds, "embedding", "vec_id", threshold=0.999, n_buckets=n_buckets
    )
    ids = sorted(kept.to_pandas()["vec_id"])
    expect = sorted(set(range(n)) - {2 * i + 1 for i in range(60)})
    assert ids == expect


def test_auto_escalation_from_driver_candidate_frame(ray_session):
    """Regression (r5): the small-input fast path hands
    ``_verify_candidates`` a driver-side candidate DataFrame; when
    ``verify="auto"`` escalates on candidate count the frame must be
    lifted into a Dataset before the distributed pair-join (previously
    crashed with 'DataFrame has no attribute map_batches')."""
    import ray.data

    from ocr_dataset_builder_ray.functions.hashing import (
        char_shingles,
        minhash_params,
        minhash_signature,
    )
    from ocr_dataset_builder_ray.stages.dedup import _verify_candidates

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "the quick brown fox jumps over the lazy dog again and again",
        3: "entirely different content with no overlap whatsoever here",
    }
    ds = ray.data.from_pandas(
        pd.DataFrame({"key": list(texts), "text": list(texts.values())})
    )
    cand = pd.DataFrame({"a": [1, 1], "b": [2, 3]})
    mh_a, mh_b = minhash_params(32)

    def _sig(text):
        return minhash_signature(char_shingles(text, 5), mh_a, mh_b)

    def _score(s0, s1):
        return float(np.mean(s0 == s1))

    results = {}
    for mode, limit in (("driver", 10**9), ("auto", 1)):
        got = _verify_candidates(
            cand, ds, "text", "key", _sig, _score, 0.8,
            verify=mode, driver_limit=limit,
        )
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        results[mode] = set(
            zip(got["a"].astype(int), got["b"].astype(int))
        )
    assert results["auto"] == results["driver"] == {(1, 2)}


def test_broadcast_verify_tier_equality(ray_session):
    """The r5 broadcast verify tier (pair count past the driver bound,
    key count under the broadcast bound -> signature matrix broadcast +
    streaming pair map) must produce the exact driver/distributed
    survivor set. Guards the e2e finding: 152.8M spurious candidates
    from a 60k-page low-diversity corpus made the pair-replicating
    attach exchange spill ~80 GB (OutOfDiskError) where the broadcast
    tier streams 16-byte pair rows against a 30 MB matrix."""
    import random

    import ray.data

    from ocr_dataset_builder_ray.stages.dedup import minhash_lsh_dedup

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(1500)]
    rows, k = [], 0
    for i in range(120):
        base = " ".join(rng.choices(vocab, k=60))
        rows.append({"key": k, "text": base})
        k += 1
        if i % 4 == 0:  # planted near-dup
            rows.append({"key": k, "text": base + " tail"})
            k += 1
    ds = ray.data.from_items(rows)
    outs = {}
    for v in ("driver", "broadcast", "distributed"):
        kept = minhash_lsh_dedup(ds, "text", "key", threshold=0.8, verify=v)
        outs[v] = sorted(kept.to_pandas()["key"].tolist())
    assert outs["driver"] == outs["broadcast"] == outs["distributed"]
    assert 0 < len(outs["driver"]) < k  # some dups actually dropped


def test_distributed_verify_coarse_plan_equality(ray_session, monkeypatch):
    """Force the distributed verify tier's coarse-bucket attach/score
    sub-plan (integer keys past _DISTINCT_PAIRS_NATIVE_LIMIT) and pin
    it to the native sub-plan's survivor set. Also pins string keys
    staying on the native sub-plan (coarse requires integer keys)."""
    import random

    import ray.data

    from ocr_dataset_builder_ray.stages import dedup as D

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(1200)]
    rows, k = [], 0
    for i in range(100):
        base = " ".join(rng.choices(vocab, k=50))
        rows.append({"key": k, "text": base})
        k += 1
        if i % 3 == 0:
            rows.append({"key": k, "text": base + " tail"})
            k += 1
    ds = ray.data.from_items(rows)
    native = sorted(
        D.minhash_lsh_dedup(ds, "text", "key", threshold=0.8, verify="distributed")
        .to_pandas()["key"]
        .tolist()
    )
    monkeypatch.setattr(D, "_DISTINCT_PAIRS_NATIVE_LIMIT", 0)
    coarse = sorted(
        D.minhash_lsh_dedup(ds, "text", "key", threshold=0.8, verify="distributed")
        .to_pandas()["key"]
        .tolist()
    )
    assert native == coarse
    assert 0 < len(native) < k

    # string keys: the coarse plan must not engage (int-key contract);
    # result still equals the int-key clustering relabeled
    srows = [{"key": f"d{r['key']:05d}", "text": r["text"]} for r in rows]
    skept = sorted(
        D.minhash_lsh_dedup(
            ray.data.from_items(srows), "text", "key", threshold=0.8,
            verify="distributed",
        )
        .to_pandas()["key"]
        .tolist()
    )
    assert skept == [f"d{i:05d}" for i in native]


def test_broadcast_verify_auto_selection_and_contract(ray_session):
    """auto picks the broadcast tier when pairs outgrow the driver
    bound but keys fit; explicit broadcast without fixed-width
    signatures (no score_pairs_fn) is a clear error; pairs with a
    missing signature are dropped (driver-path contract)."""
    import ray.data

    from ocr_dataset_builder_ray.stages.dedup import _verify_candidates

    ds = ray.data.from_pandas(
        pd.DataFrame({"key": [1, 2, 3], "text": ["a", "b", "c"]})
    )
    sig_pdf = pd.DataFrame(
        {
            "key": [1, 2],  # key 3 has NO signature
            "sig": [
                np.array([7, 7, 7, 7], dtype=np.uint64),
                np.array([7, 7, 7, 9], dtype=np.uint64),
            ],
        }
    )
    cand = pd.DataFrame({"a": [1, 1], "b": [2, 3]})

    def _pairs_score(x, y):
        return (x == y).mean(axis=1)

    # driver_limit=1 forces past driver; 2 keys fit any broadcast bound
    got = _verify_candidates(
        cand, ds, "text", "key",
        sig_fn=None, score_fn=None, threshold=0.7,
        verify="auto", driver_limit=1,
        score_pairs_fn=_pairs_score, sigs=sig_pdf,
    )
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert set(zip(got["a"].astype(int), got["b"].astype(int))) == {(1, 2)}

    with pytest.raises(ValueError, match="broadcast"):
        _verify_candidates(
            cand, ds, "text", "key",
            sig_fn=None, score_fn=None, threshold=0.7,
            verify="broadcast", sigs=sig_pdf,
        )


def test_max_bucket_rows_cap(ray_session):
    """The spurious-mega-bucket cap: buckets with more distinct keys
    than the cap contribute no pairs; cap=None is exact expansion;
    real near-dups colliding in small buckets still dedup."""
    from ocr_dataset_builder_ray.stages.dedup import (
        _driver_candidate_pairs,
    )

    # one 5-key bucket + one 2-key bucket
    bdf = pd.DataFrame(
        {
            "band_id": [0] * 5 + [1] * 2,
            "band_hash": [10] * 5 + [20] * 2,
            "key": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    exact = _driver_candidate_pairs(bdf, "band_id", "band_hash")
    assert len(exact) == 10 + 1  # C(5,2) + C(2,2)
    capped = _driver_candidate_pairs(
        bdf, "band_id", "band_hash", max_bucket_rows=4
    )
    assert set(zip(capped["a"], capped["b"])) == {(6, 7)}
    uncapped = _driver_candidate_pairs(
        bdf, "band_id", "band_hash", max_bucket_rows=5
    )
    assert len(uncapped) == 11


def test_distinct_pairs_bucketed_equals_native(ray_session, monkeypatch):
    """The coarse-bucket distinct (large integer-keyed pair streams)
    returns exactly the native aggregate's pair set — including
    negative keys — and actually deduplicates."""
    import pyarrow as pa
    import ray

    import ocr_dataset_builder_ray.stages.dedup as dd

    rng = np.random.default_rng(7)
    a = rng.integers(-1000, 1000, size=20_000)
    b = a + rng.integers(1, 50, size=20_000)  # a < b, heavy duplication
    tbl = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    native = dd._distinct_pairs(ray.data.from_arrow(tbl)).to_pandas()
    monkeypatch.setattr(dd, "_DISTINCT_PAIRS_NATIVE_LIMIT", 10)
    bucketed = dd._distinct_pairs(
        ray.data.from_arrow(tbl), target_rows_per_bucket=3_000
    ).to_pandas()

    def pairset(df):
        return sorted(zip(df["a"].astype(int), df["b"].astype(int)))

    assert pairset(native) == pairset(bucketed)
    assert len(bucketed) == len({(x, y) for x, y in zip(a, b)})
    # schema/type preserved through the bucketed path
    assert bucketed["a"].dtype == native["a"].dtype


def test_distinct_pairs_string_keys_fall_back(ray_session, monkeypatch):
    """Non-integer pair keys keep the native aggregate even past the
    size limit (the bucket mix is integer-only)."""
    import pyarrow as pa
    import ray

    import ocr_dataset_builder_ray.stages.dedup as dd

    monkeypatch.setattr(dd, "_DISTINCT_PAIRS_NATIVE_LIMIT", 1)
    tbl = pa.table(
        {
            "a": pa.array(["d1", "d1", "d2", "d2", "d1"]),
            "b": pa.array(["d2", "d2", "d9", "d9", "d2"]),
        }
    )
    out = dd._distinct_pairs(ray.data.from_arrow(tbl)).to_pandas()
    assert sorted(zip(out["a"], out["b"])) == [("d1", "d2"), ("d2", "d9")]


def test_bucket_mix_spreads_narrow_hash_values():
    """The coarse-bucket mix must carry entropy from BOTH operands into
    its high 32 bits: simhash band values are only 16 bits wide, and a
    raw XOR (the pre-fix form) left ``mix >> 32`` a function of band_id
    alone — the coarse exchange collapsed to ``bands`` groups at any
    corpus size."""
    import numpy as np

    from ocr_dataset_builder_ray.stages.dedup import _bucket_mix

    band_id = np.repeat(np.arange(4, dtype=np.uint64), 65536)
    band_val = np.tile(np.arange(65536, dtype=np.uint64), 4)
    mix = _bucket_mix(band_id, band_val)
    for nb in (64, 1024):
        b = (mix >> np.uint64(32)) % np.uint64(nb)
        cnt = np.bincount(b.astype(np.int64), minlength=nb)
        assert (cnt > 0).sum() == nb  # every coarse bucket hit
        assert cnt.max() < 3 * cnt.mean()  # no gross skew
    # determinism: same inputs, same buckets
    assert np.array_equal(mix, _bucket_mix(band_id, band_val))
