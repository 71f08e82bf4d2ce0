"""Deduplication operators over a Ray Dataset.

The reference's only dedup is key-level work-list dedup plus the F:i
repeated-content encoding (SURVEY.md §2.8); a 100 TB training-data
engine needs content dedup as a first-class operator family:

* ``exact_dedup``      — skinny (md5, key) shuffle → loser drop-set
* ``minhash_lsh_dedup``— shingle → MinHash → LSH band groupby → verified
                         Jaccard pairs → connected components
* ``simhash_dedup``    — 64-bit SimHash, banded candidate generation,
                         Hamming-distance verification
* ``ngram_jaccard_pairs`` — exact word-n-gram Jaccard over candidate
                         pairs (the verifier; also standalone on small inputs)
* ``embedding_dedup``  — cosine near-dup over an embedding column

Scale invariants (10^12-doc design):
- candidate generation is always a ``map_batches`` (partial, per-batch)
  followed by ONE groupby on the bucket key — no pairwise all-to-all;
- the only things that ever reach the driver / broadcast path are
  *duplicate-proportional*: verified pairs, candidate keys, and the
  final drop-set. Keys that collide with nothing cost nothing — there
  is no all-keys materialization anywhere in this module (singleton
  buckets cost one sort comparison inside a coarse bucket);
- survivors are produced by FILTERING the input dataset with a
  broadcast drop-set (``pc.is_in`` + invert), so the document payload
  never crosses an all-to-all;
- cluster resolution has two interchangeable engines
  (``resolve_drop_keys``): driver union-find over the pair list
  (bounded by verified-duplicate volume) and distributed min-label
  propagation (stages/components.py, iterated to convergence) for when
  even the pair list outgrows the driver. Identical representatives
  either way;
- in-bucket pair kernels are MEMORY-BOUNDED regardless of bucket skew:
  two-axis tiled scans up to ``_BUCKET_PAIR_CAP`` rows, then exact
  recursive bit-block splitting (simhash, pigeonhole) / spill-tree
  hyperplane splitting (cosine), with identical-content groups
  emitting a star instead of an O(m^2) clique — a 200k-row hot bucket
  verifies in <600 MB (bench.py --dedup "hot_bucket");
- small inputs skip the distributed candidate plan entirely
  (``SMALL_INPUT_BAND_ROWS``): the skinny band rows collapse to one
  driver numpy pass with the identical pair/survivor sets, avoiding
  ~15 s of fixed exchange overhead at gate scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import (
    char_shingles,
    lsh_band_keys,
    md5_hex,
    minhash_params,
    minhash_signature,
    simhash64,
    word_ngrams,
)
from ._bucketing import coarse_buckets, mix64


# --- shared: pairs -> drop-set -> filter ------------------------------------


def _concat(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# auto policy: pairs are duplicate-bounded, so up to this many resolve
# with driver union-find (a 1M-pair list is ~tens of MB); beyond it the
# distributed min-label path keeps the driver out of the loop entirely
AUTO_DRIVER_PAIR_LIMIT = 1_000_000

# verify="auto" middle tier: when the candidate PAIR count outgrows the
# driver but the distinct candidate KEY count stays under this bound,
# verification broadcasts the (key, signature) matrix once (num_perm*8
# bytes per key; 4M keys x 64 perms = 2 GB, shared zero-copy per node
# via the object store) and scores pairs in a pure streaming map — the
# pair-shaped data never carries a signature. The union+groupby attach
# path replicates one full signature PER PAIR, which on a spurious-
# collision-heavy corpus (low shingle diversity, template farms) turns
# O(pairs) 16-byte rows into O(pairs) ~half-KB rows: measured 152.8M
# candidates from a 60k-page corpus = ~80 GB of exchange+spill, an
# OutOfDiskError on this host, where the broadcast tier streams the
# same pairs through 2.4 GB. Identical verified pairs on every tier.
AUTO_BROADCAST_KEY_LIMIT = 4_000_000

# band-row count under which the LSH dedup family skips the distributed
# candidate plan (two materializations + 3 groupby exchanges of fixed
# overhead — ~19 s of pure exchange latency on a 500-doc gate input)
# and extracts candidates in one driver numpy pass over the SAME skinny
# rows. 200k band rows ≈ 13k docs at 16 bands — comfortably driver-tiny
# — and the pair/survivor sets are identical on both paths.
SMALL_INPUT_BAND_ROWS = 200_000


def resolve_drop_keys(
    pairs_ds: ray.data.Dataset | pd.DataFrame,
    *,
    components: str = "auto",
    max_rounds: int | None = None,
    driver_pair_limit: int = AUTO_DRIVER_PAIR_LIMIT,
) -> pa.Array:
    """Verified duplicate pairs ``(a, b)`` → Array of keys to DROP.

    A key to drop is any pair-touched key that is not its cluster's
    min-key representative. Keys appearing in no pair are trivially
    representatives and never enter this computation, so both the
    intermediate state and the returned array are bounded by duplicate
    volume, not corpus size (the round-1 all-keys ``take_all`` is gone).

    ``components="driver"``: union-find over the pair list
    (``take_all`` of PAIRS — fine while verified duplicates fit the
    driver). ``components="distributed"``: min-label propagation over
    pair-touched nodes only (stages/components.py); only the final
    drop-set is collected. ``"auto"`` (default) counts the
    (duplicate-bounded) pair list once and picks: union-find up to
    ``driver_pair_limit`` pairs — the iterative min-label rounds cost
    several groupby exchanges, pure overhead at small duplicate volume
    — and min-label beyond, where a pair list would stress the driver.
    Byte-identical output on every path.

    ``pairs_ds`` may also be a driver-side DataFrame ``(a, b)`` (the
    small-input fast path already holds the pairs); it resolves with
    union-find directly, or is lifted to a Dataset when the distributed
    engine is explicitly requested.
    """
    if isinstance(pairs_ds, pd.DataFrame):
        if components != "distributed":
            return _union_find_drop_keys(zip(pairs_ds["a"], pairs_ds["b"]))
        pairs_ds = ray.data.from_arrow(
            pa.Table.from_pandas(pairs_ds, preserve_index=False)
        )
    if components == "auto":
        pairs_ds = pairs_ds.materialize()
        components = (
            "driver" if pairs_ds.count() <= driver_pair_limit else "distributed"
        )
    if components == "distributed":
        from .components import min_label_components

        def _nodes(t: pa.Table) -> pa.Table:
            ks = pa.concat_arrays([_concat(t["a"]), _concat(t["b"])])
            return pa.table({"key": pc.unique(ks)})  # pre-shrink per block

        nodes = _distinct_keys(
            pairs_ds.map_batches(_nodes, batch_format="pyarrow")
        )
        labels = min_label_components(
            pairs_ds, nodes, node_col="key", max_rounds=max_rounds
        )
        drop = labels.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["node"], t["component"]))),
            batch_format="pyarrow",
        )
        # duplicate-proportional collect: only non-representative members
        df = drop.select_columns(["node"]).to_pandas()
        if "node" not in df.columns:  # empty dataset loses its schema
            return pa.array([])
        return pa.array(df["node"])

    # driver path: union-find over pairs only
    return _union_find_drop_keys(
        (r["a"], r["b"]) for r in pairs_ds.take_all()
    )


def _distinct_keys(
    keys_ds: ray.data.Dataset, target_rows_per_bucket: int = 4_000_000
) -> ray.data.Dataset:
    """One row per distinct ``key`` — the same coarse-bucket convention
    as ``_distinct_pairs``: a native ``groupby("key")`` distinct is one
    Ray group PER KEY (the pair-touched node set here), and the
    grouping machinery dominates past ~2M rows. Integer keys take one
    mix-hash exchange + ``np.unique`` per coarse bucket; small or
    non-integer inputs keep the native aggregate."""
    keys_ds = keys_ds.materialize()
    n = keys_ds.count()

    def _native(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.groupby("key").map_groups(
            lambda t: t.take([0]), batch_format="pyarrow"
        )

    if n <= _DISTINCT_PAIRS_NATIVE_LIMIT:
        return _native(keys_ds)
    schema = keys_ds.schema()
    key_type = schema.types[schema.names.index("key")]
    if not pa.types.is_integer(key_type):
        return _native(keys_ds)
    n_buckets = max(32, int(n // target_rows_per_bucket) + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        k = _concat(t["key"]).to_numpy(zero_copy_only=False)
        return t.append_column("__cb", pa.array(coarse_buckets(n_buckets, k)))

    def _distinct(group: pa.Table) -> pa.Table:
        k = np.unique(_concat(group["key"]).to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(k, type=key_type)})

    return (
        keys_ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_distinct, batch_format="pyarrow")
    )


def _union_find_drop_keys(pair_iter) -> pa.Array:
    """(a, b) pair stream → non-representative member keys, sorted.
    Union by min key → the component min is always the root, so the
    result is deterministic regardless of pair order or duplicates."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_iter:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # min key becomes the root → deterministic reps

    return pa.array(sorted(k for k in parent if find(k) != k))


def drop_keys_filter(
    ds: ray.data.Dataset, key_col: str, drop_keys: pa.Array
) -> ray.data.Dataset:
    """Survivors = input minus a broadcast drop-set (no payload shuffle)."""
    if len(drop_keys) == 0:
        return ds
    drop_ref = ray.put(drop_keys)

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t[key_col], value_set=ray.get(drop_ref)))
        )

    return ds.map_batches(_filter, batch_format="pyarrow")


# bucket-mix primes live in stages/_bucketing.py (one audited kernel)

# below this many raw pair rows the native aggregate is fine (and its
# per-row cost is irrelevant); above it the group-per-pair cardinality
# dominates and the coarse-bucket distinct takes over
_DISTINCT_PAIRS_NATIVE_LIMIT = 2_000_000

# rows per coarse verify bucket in simhash_dedup's distributed plan —
# small enough that ~2x the CPU count of groups exist at the crossover
# input size, large enough that per-group fixed cost stays noise
_SIMHASH_COARSE_TARGET = 500_000


def _distinct_pairs(
    pairs_ds: ray.data.Dataset,
    target_rows_per_bucket: int = 4_000_000,
) -> ray.data.Dataset:
    """One row per (a, b) — removes the multi-band repeats before any
    per-pair work, skinny shuffle over candidate pairs only.

    Large integer-keyed pair streams take ONE coarse-bucket exchange
    (``mix(a, b) % n_buckets``, ~``target_rows_per_bucket`` rows per
    group — equal pairs share a bucket by construction, and the mix
    key is skew-free even when one hot ``a`` dominates) + a vectorized
    per-group lexsort/mask distinct. A native ``groupby(["a", "b"])``
    aggregate here creates one Ray group PER DISTINCT PAIR, and at
    spurious-candidate cardinalities the grouping machinery — not the
    arithmetic — is the cost (measured on the e2e corpus at 20k pages:
    169.5 s for the native aggregate over 16.8M raw pairs vs 7.0 s for
    the entire bucketed expansion that produced them — the
    span-dedup/top-tokens group-count lesson once more). Small or
    non-integer-keyed inputs keep the native aggregate: correct at any
    key type, and cheap below ``_DISTINCT_PAIRS_NATIVE_LIMIT`` rows.
    """
    from ray.data.aggregate import Count

    def _native(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (
            ds.groupby(["a", "b"])
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
        )

    # materialize once: count sizes the bucket exchange, and schema()
    # on the lazy plan would execute a block that the groupby then
    # re-executes. Cost: the raw pair stream (16 B/row) is pinned in
    # the object store until the distinct output lands — one extra
    # skinny copy vs the native aggregate's internal exchange, spilled
    # by Ray if it outgrows memory.
    pairs_ds = pairs_ds.materialize()
    n = pairs_ds.count()
    if n <= _DISTINCT_PAIRS_NATIVE_LIMIT:
        return _native(pairs_ds)
    schema = pairs_ds.schema()
    a_type = schema.types[schema.names.index("a")]
    b_type = schema.types[schema.names.index("b")]
    if not (pa.types.is_integer(a_type) and pa.types.is_integer(b_type)):
        return _native(pairs_ds)
    n_buckets = max(32, int(n // target_rows_per_bucket) + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        a = _concat(t["a"]).to_numpy(zero_copy_only=False)
        b = _concat(t["b"]).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__cb", pa.array(coarse_buckets(n_buckets, a, b))
        )

    def _dedup(group: pa.Table) -> pa.Table:
        a = _concat(group["a"]).to_numpy(zero_copy_only=False)
        b = _concat(group["b"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table(
            {
                "a": pa.array(a[keep], type=a_type),
                "b": pa.array(b[keep], type=b_type),
            }
        )

    return (
        pairs_ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_dedup, batch_format="pyarrow")
    )



def _pool_max() -> int:
    """Kernel actor-pool cap: most of the cluster, leaving a slice for
    the read/shuffle stages (same sizing rule as the flagship pool)."""
    import os

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    except Exception:
        cpus = os.cpu_count() or 8
    return max(2, cpus - max(1, cpus // 8))


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

# pairwise kernels (hamming XOR, cosine matmul) tile BOTH axes so the
# working set is O(_TILE^2) regardless of bucket size — a hot LSH
# bucket (one shared band value across a same-language corpus) must
# not scale an actor's allocation with its row count (VERDICT r2)
_TILE = 2048
# buckets up to this many rows go through the direct tiled all-pairs
# kernel; larger ones are recursively split first
_BUCKET_PAIR_CAP = 4096


def _tiled_hamming_pairs(
    ks: np.ndarray, hs: np.ndarray, max_hamming: int, out_a: list, out_b: list
) -> None:
    """All (a < b) key pairs with popcount(hs[i]^hs[j]) <= max_hamming.
    ``ks`` sorted ascending, unique; memory O(_TILE^2)."""
    m = len(ks)
    for i0 in range(0, m, _TILE):
        hi = hs[i0 : i0 + _TILE]
        for j0 in range(i0, m, _TILE):
            hj = hs[j0 : j0 + _TILE]
            x = hi[:, None] ^ hj[None, :]
            ham = _POPCOUNT8[x.view(np.uint8).reshape(x.shape[0], x.shape[1], 8)].sum(
                axis=2
            )
            ii, jj = np.where(ham <= max_hamming)
            keep = (ii + i0) < (jj + j0)  # strict upper triangle, global idx
            out_a.append(ks[ii[keep] + i0])
            out_b.append(ks[jj[keep] + j0])


def _bits_value(hs: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Gather the given bit positions of each uint64 into a compact int."""
    v = np.zeros(len(hs), dtype=np.uint64)
    for i, b in enumerate(bits):
        v |= ((hs >> np.uint64(int(b))) & np.uint64(1)) << np.uint64(i)
    return v


def _simhash_pairs_recursive(
    ks: np.ndarray,
    hs: np.ndarray,
    free_bits: np.ndarray,
    max_hamming: int,
    out_a: list,
    out_b: list,
) -> None:
    """Exact hamming-pair extraction for an over-cap bucket.

    Manku-style recursive block split: two hashes within hamming
    ``h`` differ in <= h of the ``free_bits``, so splitting the free
    bits into h+1 blocks guarantees at least one block agrees
    (pigeonhole) — group by each block's value and recurse into the
    equal-value runs with that block removed from the free set. Every
    qualifying pair survives some path (exact, no recall loss); free
    bits strictly shrink each level, and a group that stays over-cap
    with no free bits left is hash-identical, where a star to the min
    key yields the same connected components as the full clique.
    Pairs may be emitted by several paths; callers dedupe.
    """
    m = len(ks)
    if m < 2:
        return
    if (hs == hs[0]).all():  # identical hashes: star, not O(m^2) clique
        others = ks[1:]  # ks sorted → ks[0] is the min key
        out_a.append(np.full(len(others), ks[0], dtype=ks.dtype))
        out_b.append(others)
        return
    if m <= _BUCKET_PAIR_CAP or len(free_bits) < max_hamming + 1:
        _tiled_hamming_pairs(ks, hs, max_hamming, out_a, out_b)
        return
    blocks = np.array_split(free_bits, max_hamming + 1)
    for block in blocks:
        remaining = np.setdiff1d(free_bits, block, assume_unique=True)
        vals = _bits_value(hs, block)
        order = np.argsort(vals, kind="stable")
        vs = vals[order]
        bounds = np.flatnonzero(np.r_[True, vs[1:] != vs[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            idx = np.sort(order[s:e])  # keep ks sorted in the subcall
            _simhash_pairs_recursive(
                ks[idx], hs[idx], remaining, max_hamming, out_a, out_b
            )


def _simhash_bucket_pairs(
    ks: np.ndarray, hs: np.ndarray, free_bits: np.ndarray, max_hamming: int
) -> tuple[np.ndarray, np.ndarray]:
    """One LSH bucket (keys sorted unique, aligned hashes) → deduped
    (a, b) hamming-verified pair arrays."""
    out_a: list = []
    out_b: list = []
    if len(ks) <= _BUCKET_PAIR_CAP:
        _tiled_hamming_pairs(ks, hs, max_hamming, out_a, out_b)
    else:
        _simhash_pairs_recursive(ks, hs, free_bits, max_hamming, out_a, out_b)
    if not out_a:
        return ks[:0], ks[:0]
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    if len(a) > 1:  # recursive paths can emit a pair more than once
        # (pandas dedupe — np.unique(axis=0) rejects object/string keys)
        pdf = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        a, b = pdf["a"].to_numpy(), pdf["b"].to_numpy()
    return a, b


def _bucket_mix(id_arr, hash_arr) -> np.ndarray:
    """Composite bucket key (band_id, band_hash) → one uint64. See
    ``stages/_bucketing.py`` for the entropy contract (every operand
    multiplied — a raw XOR of simhash's 16-bit band values once
    collapsed the coarse exchange to ``bands`` groups)."""
    return mix64(id_arr, hash_arr)


def _bucket_pair_count(
    bdf: pd.DataFrame, id_col: str, hash_col: str
) -> int:
    """Upper bound on the pair rows ``_driver_candidate_pairs`` would
    materialize: sum of C(m, 2) over buckets, m = distinct keys per
    bucket. One vectorized pass over the skinny frame — callers use it
    to refuse/escalate a degenerate batch BEFORE the quadratic
    expansion allocates anything."""
    if not len(bdf):
        return 0
    ids = bdf[id_col].to_numpy()
    hs = bdf[hash_col].to_numpy()
    keys = bdf["key"].to_numpy()
    order = np.lexsort((keys, hs, ids))
    ids_s, hs_s, keys_s = ids[order], hs[order], keys[order]
    new_bucket = np.r_[
        True, (ids_s[1:] != ids_s[:-1]) | (hs_s[1:] != hs_s[:-1])
    ]
    distinct_key = new_bucket | np.r_[True, keys_s[1:] != keys_s[:-1]]
    starts = np.flatnonzero(new_bucket)
    m = np.add.reduceat(distinct_key.astype(np.int64), starts)
    return int((m * (m - 1) // 2).sum())


def _driver_candidate_pairs(
    bdf: pd.DataFrame,
    id_col: str,
    hash_col: str,
    max_bucket_rows: int | None = None,
) -> pd.DataFrame:
    """Small-input fast path: the SAME distinct candidate-pair set as
    ``lsh_candidate_pairs_bucketed``, computed in
    one vectorized pass over a driver-collected band-row frame (skinny
    rows only — the payload still never leaves the cluster). Sorting
    groups the buckets; only non-singleton buckets (duplicate-bounded)
    enter the Python loop.

    ``max_bucket_rows``: optional spurious-mega-bucket cap — an LSH
    bucket with more distinct keys than this is SKIPPED (no pairs).
    Pair volume per bucket is C(m, 2): on low-shingle-diversity content
    (template farms, SEO spam) a single band value can collide across
    10^4+ genuinely-dissimilar documents, and expanding it is quadratic
    work that verification then rejects wholesale (measured: 7,819-row
    max bucket, 152.8M candidates, 0 surviving a 0.8 threshold at 60k
    pages). A true near-dup clique that large is reachable from its
    members' OTHER band collisions, so the recall loss is confined to
    buckets that are overwhelmingly false-positive. Default ``None``
    preserves exact expansion."""
    ids = bdf[id_col].to_numpy()
    hs = bdf[hash_col].to_numpy()
    keys = bdf["key"].to_numpy()
    order = np.lexsort((keys, hs, ids))
    ids_s, hs_s, keys_s = ids[order], hs[order], keys[order]
    new_group = np.r_[
        True, (ids_s[1:] != ids_s[:-1]) | (hs_s[1:] != hs_s[:-1])
    ]
    bounds = np.flatnonzero(np.r_[new_group, True])
    out_a: list = []
    out_b: list = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        ks = pd.unique(keys_s[s:e])  # sorted: keys_s ascends within a bucket
        m = len(ks)
        if m < 2:
            continue
        if max_bucket_rows is not None and m > max_bucket_rows:
            continue  # spurious mega-bucket: see docstring
        ii, jj = np.triu_indices(m, k=1)
        out_a.append(ks[ii])
        out_b.append(ks[jj])
    if not out_a:
        return pd.DataFrame({"a": keys[:0], "b": keys[:0]})
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    # vectorized distinct (cross-bucket repeats of the same pair):
    # pandas drop_duplicates hashes single-threaded and costs multiples
    # of the expansion itself on mega-bucket outputs
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pd.DataFrame({"a": a[keep], "b": b[keep]})


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

    Skinny-shuffle form: the groupby exchange carries ONLY
    ``(content_hash, key)`` — never the document payload. Each hash
    group emits its LOSERS (all but the min key; singleton hashes emit
    nothing), so the collected/broadcast set is bounded by duplicate
    volume; survivors are a broadcast filter over the original stream.
    Deterministic at any parallelism. DuckDB oracle: GROUP BY
    md5(text) + min(key) join.

    Key-uniqueness note (ADVICE r2): survivors are selected by
    filtering on key VALUES, so the whole dedup family assumes
    ``key_col`` is unique per row (url / doc_id — true for every
    source in this engine). If several rows share the min key of a
    hash group, losers are emitted per distinct KEY (``pc.unique``
    below), never for the winning key itself — duplicate key values
    tied for winner all survive rather than the winner being dropped
    by its own twin's loser row.
    """

    # ONE coarse-bucket exchange + a vectorized per-bucket reduce (the
    # bucket-reduce pattern, see lsh_candidate_pairs_bucketed): a
    # per-content-hash map_groups makes one group per DISTINCT TEXT —
    # corpus-scaled — and the grouping machinery dominates at that
    # cardinality. Buckets key on the hash itself, so equal texts share
    # a bucket and the per-bucket loser computation is globally exact.
    def _skinny(t: pa.Table) -> pa.Table:
        import hashlib

        hashes, heads = [], []
        for v in t[text_col].to_pylist():
            d = hashlib.md5(
                (v if v is not None else "").encode("utf-8", "surrogatepass")
            ).digest()
            hashes.append(d.hex())  # == md5_hex: the oracle's md5()
            heads.append(int.from_bytes(d[:8], "big") >> 1)  # int64-safe
        return pa.table(
            {
                "content_hash": pa.array(hashes, type=pa.string()),
                "h64": pa.array(heads, type=pa.int64()),
                "key": t[key_col],
            }
        )

    skinny = ds.map_batches(_skinny, batch_format="pyarrow").materialize()
    n_rows = skinny.count()
    n_buckets = max(32, int(n_rows // 2_000_000) + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        b = (
            _concat(t["h64"]).to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_buckets)
        )
        return t.append_column("__cb", pa.array(b.astype(np.int32)))

    def _bucket_losers(group: pa.Table) -> pa.Table:
        ch = _concat(group["content_hash"]).to_numpy(zero_copy_only=False)
        keys = _concat(group["key"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, ch))
        ch_s, k_s = ch[order], keys[order]
        # distinct (hash, key) rows, then all but the first key per hash
        # == the old per-group pc.unique().sort().slice(1) semantics
        first_hk = np.r_[True, (ch_s[1:] != ch_s[:-1]) | (k_s[1:] != k_s[:-1])]
        hk_h, hk_k = ch_s[first_hk], k_s[first_hk]
        first_h = np.r_[True, hk_h[1:] != hk_h[:-1]]
        return pa.table(
            {"key": pa.array(hk_k[~first_h], type=group.schema.field("key").type)}
        )

    losers = (
        skinny.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_bucket_losers, batch_format="pyarrow")
    )
    ldf = losers.to_pandas()
    drop = pa.array(ldf["key"]) if "key" in ldf.columns else pa.array([])
    return drop_keys_filter(ds, key_col, drop)


# --- minhash + LSH ---------------------------------------------------------


def lsh_candidate_pairs_bucketed(
    band_rows: ray.data.Dataset,
    id_col: str,
    hash_col: str,
    target_rows_per_bucket: int = 2_000_000,
    max_bucket_rows: int | None = None,
) -> ray.data.Dataset:
    """Band rows → distinct candidate pairs via ONE coarse-bucket
    exchange + a vectorized per-bucket kernel. ``max_bucket_rows``
    skips spurious mega-buckets (see ``_driver_candidate_pairs``).

    Replaces the retired singleton-prefilter + native-aggregate
    composition for hash-banded LSH (64-bit band hashes): both of those
    ran a native aggregate whose group count is O(corpus x bands), and
    Ray's grouping machinery — not the arithmetic — dominates at that
    cardinality (the span-dedup/top-tokens lesson, measured three times
    now). Here the only exchange groups by ``mix(id, hash) %
    n_buckets`` (~``target_rows_per_bucket`` rows per group, skew-free:
    equal buckets share a coarse bucket and are counted once in the row
    total), and each coarse bucket runs the same lexsort kernel as the
    driver fast path (``_driver_candidate_pairs``) — singleton LSH
    buckets cost one sort comparison, nothing reaches the driver, and
    the pair set is identical (cross-band pair duplicates are removed
    by the same ``_distinct_pairs``).

    Simhash runs the same coarse-bucket exchange inline (its verify
    needs the full bucket co-located, not just pairs — see
    ``simhash_dedup``); its 16-bit band values additionally bound the
    real-bucket count at 4 x 65536 regardless of corpus size.
    """
    n_rows = band_rows.count()
    n_buckets = max(32, int(n_rows // target_rows_per_bucket) + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        mix = _bucket_mix(
            _concat(t[id_col]).to_numpy(zero_copy_only=False),
            _concat(t[hash_col]).to_numpy(zero_copy_only=False),
        )
        b = (mix >> np.uint64(32)) % np.uint64(n_buckets)
        return t.append_column("__cb", pa.array(b.astype(np.int32)))

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                id_col: _concat(group[id_col]).to_numpy(zero_copy_only=False),
                hash_col: _concat(group[hash_col]).to_numpy(zero_copy_only=False),
                "key": _concat(group["key"]).to_numpy(zero_copy_only=False),
            }
        )
        pairs = _driver_candidate_pairs(
            pdf, id_col, hash_col, max_bucket_rows=max_bucket_rows
        )
        key_type = group.schema.field("key").type
        return pa.table(
            {
                "a": pa.array(pairs["a"].to_numpy(), type=key_type),
                "b": pa.array(pairs["b"].to_numpy(), type=key_type),
            }
        )

    return _distinct_pairs(
        band_rows.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )


def _verify_pairs_broadcast(
    pairs_ds: ray.data.Dataset,
    sigs_source,
    score_pairs_fn,
    threshold: float,
    cand_keys: pa.Array,
) -> ray.data.Dataset:
    """Streaming pair verification against a broadcast signature
    matrix: driver/object-store state is KEY-bounded (num_perm*8 bytes
    per distinct candidate key — the caller enforces
    ``broadcast_key_limit``), and the pair stream itself stays 16-byte
    rows end to end: no per-pair signature replication, no exchange.
    Pairs with a missing signature are dropped — the exact contract of
    the driver path's ``a in sigmap and b in sigmap``."""
    if isinstance(sigs_source, pd.DataFrame):
        keep = pc.is_in(pa.array(sigs_source["key"]), value_set=cand_keys)
        kept = sigs_source[keep.to_numpy(zero_copy_only=False)]
        keys = kept["key"].to_numpy()
        mat = (
            np.stack([np.asarray(s, dtype=np.uint64) for s in kept["sig"]])
            if len(kept)
            else np.empty((0, 1), dtype=np.uint64)
        )
    else:  # Dataset of (key, sig list<uint64>), already candidate-pruned
        tbl = pa.concat_tables(ray.get(sigs_source.to_arrow_refs()))
        keys = tbl["key"].to_numpy(zero_copy_only=False)
        if tbl.num_rows:
            col = tbl["sig"].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            mat = np.ascontiguousarray(
                flat.astype(np.uint64, copy=False)
            ).reshape(tbl.num_rows, -1)
        else:
            mat = np.empty((0, 1), dtype=np.uint64)

    if len(keys) == 0:  # nothing verifiable
        return pairs_ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        )

    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]
    mat_sorted = np.ascontiguousarray(mat[order])
    state_ref = ray.put((keys_sorted, mat_sorted))

    def _score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ks, sm = ray.get(state_ref)  # zero-copy from the object store
        a = _concat(t["a"]).to_numpy(zero_copy_only=False)
        b = _concat(t["b"]).to_numpy(zero_copy_only=False)
        n = len(ks)
        ia = np.minimum(np.searchsorted(ks, a), n - 1)
        ib = np.minimum(np.searchsorted(ks, b), n - 1)
        valid = (ks[ia] == a) & (ks[ib] == b)
        keep = np.zeros(t.num_rows, dtype=bool)
        if valid.any():
            scores = np.asarray(
                score_pairs_fn(sm[ia[valid]], sm[ib[valid]])
            )
            keep[valid] = scores >= threshold
        return t.filter(pa.array(keep))

    # bound the per-task gather buffers: rows x num_perm x 8 x 2 bytes
    return pairs_ds.map_batches(
        _score, batch_format="pyarrow", batch_size=131072
    )


def _verify_candidates(
    candidates: ray.data.Dataset,
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    sig_fn,
    score_fn,
    threshold: float,
    verify: str = "auto",
    driver_limit: int = AUTO_DRIVER_PAIR_LIMIT,
    score_pairs_fn=None,
    sigs=None,
    broadcast_key_limit: int = AUTO_BROADCAST_KEY_LIMIT,
):
    """Distinct candidate pairs → verified pairs Dataset.

    Signatures (``sig_fn(text) -> uint64[]``) are computed only for
    candidate keys (broadcast semi-join on the duplicate-bounded
    candidate set). ``verify="driver"`` collects the candidate pairs
    and their signatures (both duplicate-bounded) and scores in numpy;
    ``"broadcast"`` ships the candidate keys' signature matrix once
    (key-bounded, ``broadcast_key_limit``) and scores pairs in a pure
    streaming map — the pair stream never carries a signature (needs
    ``score_pairs_fn``, i.e. fixed-width signatures);
    ``"distributed"`` co-locates each pair with its two signatures via
    the union+groupby pair-join (``_verify_pairs_with_sigs``) so
    nothing pair-shaped touches the driver; ``"auto"`` picks driver →
    broadcast → distributed as candidate pairs, then distinct keys,
    outgrow their bounds. Identical verified pairs on every path.

    ``candidates`` may be a driver-side DataFrame (small-input fast
    path) — verified driver-side unless ``verify="distributed"`` is
    explicitly requested, returning a DataFrame that
    ``resolve_drop_keys`` accepts directly.

    ``sigs`` (optional) short-circuits signature computation with
    signatures the candidate-generation stage already produced — a
    ``pd.DataFrame(key, sig: np.ndarray)`` or a Dataset with ``key`` +
    ``sig list<uint64>`` columns. Without it, verification re-reads
    every candidate document's text and recomputes ``sig_fn`` — a
    second full pass over the payload that the caller usually already
    paid for once.
    """
    cand_pdf: pd.DataFrame | None = None
    if isinstance(candidates, pd.DataFrame):
        cand_pdf = candidates
        n_cand = len(cand_pdf)
        if n_cand == 0:
            return cand_pdf
        if verify == "distributed":
            candidates = ray.data.from_arrow(
                pa.Table.from_pandas(cand_pdf, preserve_index=False)
            )
    else:
        candidates = candidates.materialize()
        n_cand = candidates.count()
        if n_cand == 0:
            return candidates

    # cand_keys / keys_ref are only needed by the branches that prune
    # sigs to candidate keys — computed lazily: the all-driver path
    # (cand_pdf + sig frame) would otherwise pay an object-store put of
    # the full key list (and, on this host, seconds of first-touch
    # page faults on the transient concat) for nothing. Cached: the
    # auto tier choice and the broadcast matrix both need it.
    _ck_cache: list = []

    def _cand_keys() -> pa.Array:
        if _ck_cache:
            return _ck_cache[0]
        _ck_cache.append(_cand_keys_uncached())
        return _ck_cache[0]

    def _cand_keys_uncached() -> pa.Array:
        if cand_pdf is not None:
            return pa.array(
                pd.unique(
                    np.concatenate(
                        [cand_pdf["a"].to_numpy(), cand_pdf["b"].to_numpy()]
                    )
                )
            )

        def _keys(t: pa.Table) -> pa.Table:
            ks = pa.concat_arrays([_concat(t["a"]), _concat(t["b"])])
            return pa.table({"key": pc.unique(ks)})  # pre-shrink per block

        return pa.array(
            pd.unique(
                candidates.map_batches(_keys, batch_format="pyarrow").to_pandas()["key"]
            )
        )

    sig_pdf: pd.DataFrame | None = None
    if isinstance(sigs, pd.DataFrame):
        sig_pdf = sigs
        sigs_ds = None  # built on demand below if the distributed path runs
    elif sigs is not None:  # Dataset of (key, sig list<uint64>)
        keys_ref = ray.put(_cand_keys())

        def _prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["key"], value_set=ray.get(keys_ref)))

        sigs_ds = sigs.map_batches(_prune, batch_format="pyarrow")
    else:
        keys_ref = ray.put(_cand_keys())

        def _sigs(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t[key_col], value_set=ray.get(keys_ref)))
            sig_vals = [sig_fn(v or "") for v in t[text_col].to_pylist()]
            return pa.table(
                {
                    "key": t[key_col],
                    "sig": pa.array(
                        [s.tolist() for s in sig_vals], pa.list_(pa.uint64())
                    ),
                }
            )

        sigs_ds = ds.map_batches(_sigs, batch_format="pyarrow")

    if verify == "auto":
        if n_cand <= driver_limit:
            verify = "driver"
        elif (
            score_pairs_fn is not None
            and len(_cand_keys()) <= broadcast_key_limit
        ):
            verify = "broadcast"
        else:
            verify = "distributed"
    if verify == "broadcast":
        if score_pairs_fn is None:
            raise ValueError(
                "verify='broadcast' needs fixed-width signatures "
                "(a score_pairs_fn); use 'driver' or 'distributed'"
            )
        if cand_pdf is not None and isinstance(candidates, pd.DataFrame):
            candidates = ray.data.from_arrow(
                pa.Table.from_pandas(cand_pdf, preserve_index=False)
            )
        return _verify_pairs_broadcast(
            candidates,
            sig_pdf if sig_pdf is not None else sigs_ds,
            score_pairs_fn,
            threshold,
            _cand_keys(),
        )
    if verify == "distributed":
        if cand_pdf is not None and isinstance(candidates, pd.DataFrame):
            # small-input fast path handed us a driver frame but auto
            # escalated on candidate count — lift it into a Dataset the
            # same way the explicit-"distributed" entry branch does
            candidates = ray.data.from_arrow(
                pa.Table.from_pandas(cand_pdf, preserve_index=False)
            )
        if sigs_ds is None:  # driver-side sig frame but distributed verify forced
            keep = pc.is_in(pa.array(sig_pdf["key"]), value_set=_cand_keys())
            kept = sig_pdf[keep.to_numpy(zero_copy_only=False)]
            sigs_ds = ray.data.from_arrow(
                pa.table(
                    {
                        "key": pa.array(kept["key"]),
                        "sig": pa.array(
                            [np.asarray(s, dtype=np.uint64).tolist() for s in kept["sig"]],
                            pa.list_(pa.uint64()),
                        ),
                    }
                )
            )
        return _verify_pairs_with_sigs(
            candidates, sigs_ds, score_fn, threshold, score_pairs_fn=score_pairs_fn
        )

    # driver verify: duplicate-bounded pair list + signature map
    pdf = cand_pdf if cand_pdf is not None else candidates.to_pandas()
    sdf = sig_pdf if sig_pdf is not None else sigs_ds.to_pandas()
    if score_pairs_fn is not None and len(pdf) and len(sdf):
        # fixed-width signatures: score pairs vectorized in chunks — a
        # per-pair Python loop over a big LSH clique's quadratic
        # candidate list (443k pairs on a 5k-doc gate input) costs
        # seconds for microseconds of arithmetic. Chunked through
        # REUSED gather buffers: one flat (n_pairs, num_perm) gather
        # allocates hundreds of fresh MB whose first-touch page faults
        # dominate the whole verify on this host
        key_idx = {k: i for i, k in enumerate(sdf["key"])}
        sig_mat = np.stack([np.asarray(v, dtype=np.uint64) for v in sdf["sig"]])
        ai = pdf["a"].map(key_idx)
        bi = pdf["b"].map(key_idx)
        valid = (ai.notna() & bi.notna()).to_numpy()
        scores = np.zeros(len(pdf))
        n_valid = int(valid.sum())
        if n_valid:
            idx_a = ai.to_numpy()[valid].astype(np.int64)
            idx_b = bi.to_numpy()[valid].astype(np.int64)
            chunk = 16384
            perm = sig_mat.shape[1]
            buf_a = np.empty((min(chunk, n_valid), perm), dtype=sig_mat.dtype)
            buf_b = np.empty_like(buf_a)
            out = np.empty(n_valid)
            for s in range(0, n_valid, chunk):
                m = min(chunk, n_valid - s)
                np.take(sig_mat, idx_a[s : s + m], axis=0, out=buf_a[:m])
                np.take(sig_mat, idx_b[s : s + m], axis=0, out=buf_b[:m])
                out[s : s + m] = score_pairs_fn(buf_a[:m], buf_b[:m])
            scores[valid] = out
        mask = valid & (scores >= threshold)
    else:
        sigmap = {
            k: np.asarray(v, dtype=np.uint64) for k, v in zip(sdf["key"], sdf["sig"])
        }
        mask = [
            a in sigmap and b in sigmap and score_fn(sigmap[a], sigmap[b]) >= threshold
            for a, b in zip(pdf["a"], pdf["b"])
        ]
    verified_pdf = pdf[mask] if any(mask) else pdf.iloc[:0]
    if cand_pdf is not None:  # fast path stays on the driver end-to-end
        return verified_pdf
    return ray.data.from_arrow(
        pa.Table.from_pandas(verified_pdf, preserve_index=False)
    )


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    components: str = "auto",
    verify: str = "auto",
    max_bucket_rows: int | None = None,
) -> ray.data.Dataset:
    """Near-dup removal: keep one representative (min key) per MinHash
    cluster at estimated Jaccard ≥ ``threshold``.

    shingle→minhash→band→bucket per the standard LSH recipe, all
    skinny: band rows carry (key, band_id, band_hash) plus ONE packed
    copy of the signature per document (num_perm*8 bytes, no band
    fan-out, dropped before every wide op). Candidate pairs come from
    ``lsh_candidate_pairs_bucketed`` (one coarse-bucket exchange, no
    per-group Python); verification REUSES the carried signatures for
    candidate keys and scores estimated Jaccard (``_verify_candidates``,
    driver/distributed/auto) — the text is read exactly once per run;
    resolution + survivor filter follow the drop-set pattern. No all-keys materialization on any path; every
    driver-touching artifact (candidates, drop-set) is
    duplicate-bounded. ``verify``/``components`` escalate to fully
    distributed forms when duplicate volume outgrows the driver
    (byte-identical results on every path; "bucket"/"pairs" accepted
    as legacy aliases).
    """
    verified = _minhash_verified_pairs(
        ds,
        text_col,
        key_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        verify=verify,
        max_bucket_rows=max_bucket_rows,
    )
    drop = resolve_drop_keys(verified, components=components)
    return drop_keys_filter(ds, key_col, drop)


def minhash_band_rows(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    mh_a: np.ndarray,
    mh_b: np.ndarray,
    bands: int = 16,
    shingle_k: int = 5,
) -> ray.data.Dataset:
    """Shingle → MinHash → skinny band rows ``(key, band_id,
    band_hash, sig)``. The signature rides along ONCE per doc (packed
    binary on the doc's first band row, null on the other bands-1
    rows): num_perm*8 bytes per DOCUMENT, no band fan-out, dropped
    before every wide op; verification reuses it instead of re-reading
    every candidate text — at corpus scale that second full payload
    pass dominated the whole operator. Shared by the one-shot dedup
    ops and the persistent incremental index
    (``state/minhash_index.py``)."""

    def _band_batch(batch: pa.Table) -> pa.Table:
        keys, band_ids, band_hashes, sig_bins = [], [], [], []
        for key, text in zip(
            batch[key_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sig = minhash_signature(char_shingles(text or "", shingle_k), mh_a, mh_b)
            first = True
            for band_id, band_hash in lsh_band_keys(sig, bands):
                keys.append(key)
                band_ids.append(band_id)
                band_hashes.append(band_hash)
                sig_bins.append(np.ascontiguousarray(sig).tobytes() if first else None)
                first = False
        return pa.table(
            {
                "key": pa.array(keys, type=batch[key_col].type),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(
                    np.array(band_hashes, dtype=np.uint64).view(np.int64)
                ),
                "sig": pa.array(sig_bins, type=pa.binary()),
            }
        )

    return ds.map_batches(_band_batch, batch_format="pyarrow")


def _minhash_verified_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    verify: str = "auto",
    max_bucket_rows: int | None = None,
):
    """The shared shingle→minhash→band→candidates→verify front half of
    ``minhash_lsh_dedup`` / ``minhash_clusters`` — returns the verified
    duplicate pairs (driver DataFrame or Dataset per the verify path),
    duplicate-bounded either way."""
    if verify in ("bucket", "pairs"):  # round-2 legacy aliases
        verify = "auto" if verify == "bucket" else "distributed"

    # stateless task stage, not an actor pool: the only "state" is the
    # (a, b) permutation params — tiny, deterministic, shipped in the
    # closure — and a fresh actor pool costs seconds of spawn per call
    # that warm task workers don't
    mh_a, mh_b = minhash_params(num_perm)

    band_rows = minhash_band_rows(
        ds,
        text_col,
        key_col,
        mh_a=mh_a,
        mh_b=mh_b,
        bands=bands,
        shingle_k=shingle_k,
    ).materialize()
    if band_rows.count() <= SMALL_INPUT_BAND_ROWS:
        bdf = band_rows.to_pandas()
        candidates = _driver_candidate_pairs(
            bdf, "band_id", "band_hash", max_bucket_rows=max_bucket_rows
        )
        sig_rows = bdf[bdf["sig"].notna()]
        sigs = pd.DataFrame(
            {
                "key": sig_rows["key"].to_numpy(),
                "sig": [np.frombuffer(b, dtype=np.uint64) for b in sig_rows["sig"]],
            }
        )
    else:
        skinny = band_rows.select_columns(["key", "band_id", "band_hash"])
        candidates = lsh_candidate_pairs_bucketed(
            skinny, "band_id", "band_hash", max_bucket_rows=max_bucket_rows
        )

        def _unpack_sigs(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["sig"]))
            return pa.table(
                {
                    "key": t["key"],
                    "sig": pa.array(
                        [
                            np.frombuffer(b, dtype=np.uint64).tolist()
                            for b in t["sig"].to_pylist()
                        ],
                        pa.list_(pa.uint64()),
                    ),
                }
            )

        sigs = band_rows.map_batches(_unpack_sigs, batch_format="pyarrow")

    def _sig(text: str) -> np.ndarray:
        return minhash_signature(char_shingles(text, shingle_k), mh_a, mh_b)

    def _est_jaccard(s0: np.ndarray, s1: np.ndarray) -> float:
        return float(np.mean(s0 == s1))

    def _est_jaccard_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return (a == b).mean(axis=1)

    return _verify_candidates(
        candidates,
        ds,
        text_col,
        key_col,
        _sig,
        _est_jaccard,
        threshold,
        verify,
        score_pairs_fn=_est_jaccard_pairs,
        sigs=sigs,
    )


def _union_find_labels(pair_iter) -> dict:
    """(a, b) pair stream → {touched key: component min-key}. The same
    min-key-root union-find as ``_union_find_drop_keys`` but returning
    the full (duplicate-bounded) label map."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_iter:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {k: find(k) for k in parent}


def clusters_from_pairs(
    pairs_ds: ray.data.Dataset | pd.DataFrame,
    ds: ray.data.Dataset,
    key_col: str,
    *,
    components: str = "auto",
    driver_pair_limit: int = AUTO_DRIVER_PAIR_LIMIT,
) -> ray.data.Dataset:
    """Verified duplicate pairs → ``(key, cluster)`` for EVERY input
    row: cluster = the component's min key; keys touching no pair are
    their own cluster. The analysis-side sibling of
    ``resolve_drop_keys`` (stratify / inspect / weight near-dup groups
    instead of dropping them) with the invariant
    ``survivors == {key | cluster == key}``.

    Same engine selection and bounds: union-find on the driver up to
    ``driver_pair_limit`` pairs, min-label propagation beyond; the
    broadcast label map is duplicate-bounded; the assignment itself is
    a pure broadcast map over the corpus.
    """
    if isinstance(pairs_ds, pd.DataFrame):
        if components != "distributed":
            labels = _union_find_labels(zip(pairs_ds["a"], pairs_ds["b"]))
            keys_arr = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
            roots_arr = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
        else:
            pairs_ds = ray.data.from_arrow(
                pa.Table.from_pandas(pairs_ds, preserve_index=False)
            )
    if not isinstance(pairs_ds, pd.DataFrame):
        if components == "auto":
            pairs_ds = pairs_ds.materialize()
            components = (
                "driver"
                if pairs_ds.count() <= driver_pair_limit
                else "distributed"
            )
        if components == "distributed":
            from .components import min_label_components

            def _nodes(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"key": pa.concat_arrays([_concat(t["a"]), _concat(t["b"])])}
                )

            nodes = (
                pairs_ds.map_batches(_nodes, batch_format="pyarrow")
                .groupby("key")
                .map_groups(lambda t: t.take([0]), batch_format="pyarrow")
            )
            lab_df = min_label_components(
                pairs_ds, nodes, node_col="key"
            ).to_pandas()
            if "node" not in lab_df.columns:  # empty loses its schema
                keys_arr = np.empty(0, np.int64)
                roots_arr = np.empty(0, np.int64)
            else:
                keys_arr = lab_df["node"].to_numpy(dtype=np.int64)
                roots_arr = lab_df["component"].to_numpy(dtype=np.int64)
        else:
            labels = _union_find_labels(
                (r["a"], r["b"]) for r in pairs_ds.take_all()
            )
            keys_arr = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
            roots_arr = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))

    order = np.argsort(keys_arr)
    lab_ref = ray.put((keys_arr[order], roots_arr[order]))

    def _assign(t: pa.Table) -> pa.Table:
        lk, lr = ray.get(lab_ref)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = keys.copy()
        if lk.size:
            pos = np.searchsorted(lk, keys)
            pos_c = np.minimum(pos, lk.size - 1)
            hit = lk[pos_c] == keys
            cluster[hit] = lr[pos_c[hit]]
        kcol = t[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        return pa.table(
            {key_col: kcol, "cluster": pa.array(cluster, pa.int64())}
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def minhash_clusters(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    components: str = "auto",
    verify: str = "auto",
) -> ray.data.Dataset:
    """Near-dup CLUSTER ASSIGNMENT: ``(key, cluster)`` for every row,
    cluster = min key of the MinHash component at estimated Jaccard >=
    ``threshold`` (singletons map to themselves). The same verified
    pairs as ``minhash_lsh_dedup`` — a row survives that op iff
    ``cluster == key`` here."""
    verified = _minhash_verified_pairs(
        ds,
        text_col,
        key_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        verify=verify,
    )
    return clusters_from_pairs(verified, ds, key_col, components=components)


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
    components: str = "auto",
) -> ray.data.Dataset:
    """Near-dup removal by 64-bit SimHash with banded candidates.

    By pigeonhole, two hashes within Hamming distance < ``bands`` share
    at least one of ``bands`` 16-bit bands — co-locate rows by band
    value (8-byte hash per band row; no payload fan-out) through ONE
    coarse-bucket exchange, verify true Hamming distance per real
    bucket inside the coarse group, then drop-set resolution +
    broadcast filter. Verification differs from the minhash family in
    needing the whole bucket together (tiled XOR+popcount / recursive
    bit-block split), so the coarse groups carry band rows, not pairs.
    """
    hashed = add_simhash(ds, text_col)
    width = 64 // bands
    mask = (1 << width) - 1

    def _bands(t: pa.Table) -> pa.Table:
        h = _concat(t["simhash"]).to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        bids = np.tile(np.arange(bands, dtype=np.int64), n)
        bvals = (h[idx] >> (bids.astype(np.uint64) * np.uint64(width))) & np.uint64(
            mask
        )
        return pa.table(
            {
                "key": _concat(t[key_col]).take(pa.array(idx)),
                "band_id": pa.array(bids.astype(np.int32)),
                "band_val": pa.array(bvals, type=pa.uint64()),
                "simhash": pa.array(h[idx], type=pa.uint64()),
            }
        )

    def _free_bits(band_id: int) -> np.ndarray:
        """Bit positions NOT covered by the bucket's shared band — rows
        in one bucket already agree on those 16 bits, so only the rest
        can distinguish them in the recursive split."""
        lo = band_id * width
        return np.array(
            [b for b in range(64) if not (lo <= b < lo + width)], dtype=np.int64
        )

    def _walk_buckets(bdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Band frame sorted+deduped on (band_id, band_val, key) → the
        concatenated hamming-verified pair arrays, one numpy boundary
        walk over the real buckets (no per-bucket DataFrame). Each
        bucket's verification is vectorized AND memory-bounded:
        two-axis tiled XOR+popcount up to _BUCKET_PAIR_CAP rows, exact
        recursive bit-block splitting beyond (never an O(m) x O(m)
        allocation) — 16-bit band values are low-entropy, so
        same-language corpora pile thousands of docs into one bucket."""
        bid = bdf["band_id"].to_numpy()
        bval = bdf["band_val"].to_numpy()
        ks = bdf["key"].to_numpy()
        hs = bdf["simhash"].to_numpy().astype(np.uint64)
        bounds = np.flatnonzero(
            np.r_[True, (bid[1:] != bid[:-1]) | (bval[1:] != bval[:-1]), True]
        )
        out_a: list = []
        out_b: list = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b = _simhash_bucket_pairs(
                ks[s:e], hs[s:e], _free_bits(int(bid[s])), max_hamming
            )
            out_a.append(a)
            out_b.append(b)
        if not out_a:
            return ks[:0], ks[:0]
        return np.concatenate(out_a), np.concatenate(out_b)

    def _sorted_bands(bdf: pd.DataFrame) -> pd.DataFrame:
        return bdf.sort_values(["band_id", "band_val", "key"]).drop_duplicates(
            ["band_id", "band_val", "key"]
        )

    band_rows = hashed.map_batches(_bands, batch_format="pyarrow").materialize()
    n_rows = band_rows.count()

    if n_rows <= SMALL_INPUT_BAND_ROWS:
        # small-input fast path: the distributed plan costs groupby
        # exchanges of fixed overhead (~19 s on a 500-doc gate input);
        # the same buckets fit one driver numpy pass
        a, b = _walk_buckets(_sorted_bands(band_rows.to_pandas()))
        drop = resolve_drop_keys(
            pd.DataFrame({"a": a, "b": b}), components=components
        )
        return drop_keys_filter(ds, key_col, drop)

    # distributed: ONE coarse-bucket exchange — mix(band_id, band_val)
    # keeps every real bucket intact inside one coarse group, where the
    # same sorted boundary walk as the driver path runs per group. The
    # previous native groupby([band_id, band_val]).map_groups plan paid
    # Ray's per-group machinery + a per-bucket pandas frame over up to
    # bands x 2^16 groups (group count bounded by the band space, but
    # 12.9 s of the 18 s total at 100k docs was that exchange); the
    # coarse plan keeps the boundedness and drops the per-group cost —
    # singleton buckets cost one sort comparison each.
    n_buckets = max(64, int(n_rows // _SIMHASH_COARSE_TARGET) + 1)

    def _cb(t: pa.Table) -> pa.Table:
        mix = _bucket_mix(
            _concat(t["band_id"]).to_numpy(zero_copy_only=False),
            _concat(t["band_val"]).to_numpy(zero_copy_only=False),
        )
        b = (mix >> np.uint64(32)) % np.uint64(n_buckets)
        return t.append_column("__cb", pa.array(b.astype(np.int32)))

    def _coarse_verify(group: pa.Table) -> pa.Table:
        key_type = group.schema.field("key").type
        bdf = _sorted_bands(
            pd.DataFrame(
                {
                    "band_id": _concat(group["band_id"]).to_numpy(),
                    "band_val": _concat(group["band_val"]).to_numpy(),
                    "key": _concat(group["key"]).to_numpy(zero_copy_only=False),
                    "simhash": _concat(group["simhash"]).to_numpy(),
                }
            )
        )
        a, b = _walk_buckets(bdf)
        return pa.table(
            {
                "a": pa.array(a, type=key_type),
                "b": pa.array(b, type=key_type),
            }
        )

    pairs_ds = (
        band_rows.map_batches(_cb, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_coarse_verify, batch_format="pyarrow")
    )
    drop = resolve_drop_keys(pairs_ds, components=components)
    return drop_keys_filter(ds, key_col, drop)


# --- exact n-gram Jaccard (verifier / small-input standalone) --------------


def ngram_jaccard(a, b, n: int = 3) -> float:
    """Exact Jaccard over hashed word n-gram sets. Accepts raw text or
    precomputed uint64 gram arrays (``word_ngrams`` output)."""
    sa = a if isinstance(a, np.ndarray) else word_ngrams(a or "", n)
    sb = b if isinstance(b, np.ndarray) else word_ngrams(b or "", n)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    if sa.size == 0 or sb.size == 0:
        return 0.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def _verify_pairs_with_sigs(
    pairs_ds: ray.data.Dataset,
    sigs_ds: ray.data.Dataset,
    score_fn,
    threshold: float,
    target_rows_per_bucket: int = 2_000_000,
    score_pairs_fn=None,
) -> ray.data.Dataset:
    """Distributed per-pair verification without shipping documents.

    ``pairs_ds``: distinct candidate ``(a, b)``; ``sigs_ds``:
    ``(key, sig: list<uint64>)`` for candidate keys only. Co-locates
    each pair with its two signatures using the join-free union+group
    pattern (same trick as stages/components.py — robust at any
    partition occupancy):

    1. request rows ``(key=a|b, a, b, sig=null)`` union signature rows
       ``(key, a=null, b=null, sig)``; grouping on ``key`` attaches the
       key's signature to every pair it participates in — each sig is
       replicated once per pair, bounded by candidate volume;
    2. grouping on ``(a, b)`` sees exactly two rows and scores them.

    Both groupings run as coarse-bucket exchanges when the pair stream
    is large and integer-keyed (same convention as
    ``_distinct_pairs``): this tier only activates when candidates
    outgrow the BROADCAST tier's key bound, i.e. at exactly the
    cardinalities where a native group per key / per pair puts Ray's
    grouping machinery — not the signature arithmetic — in charge of
    the wall clock. Inside a coarse group the attach is one
    argsort+searchsorted gather and the score walks sorted (a, b) runs
    slicing signatures out of the flattened Arrow list values (no
    per-row ``as_py``). Small or non-integer-keyed inputs keep the
    native aggregate. Identical verified pairs on both plans.

    Returns verified pairs ``(a, b)``.
    """

    def _requests(t: pa.Table) -> pa.Table:
        a, b = _concat(t["a"]), _concat(t["b"])
        null_sig = pa.nulls(2 * t.num_rows, pa.list_(pa.uint64()))
        return pa.table(
            {
                "key": pa.concat_arrays([a, b]),
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "sig": null_sig,
            }
        )

    def _sig_rows(t: pa.Table) -> pa.Table:
        k = _concat(t["key"])
        return pa.table(
            {
                "key": k,
                "a": pa.nulls(t.num_rows, k.type),
                "b": pa.nulls(t.num_rows, k.type),
                "sig": t["sig"],
            }
        )

    def _score_runs(group: pa.Table) -> pa.Table:
        """Attached rows (a, b, sig) — 2 per complete pair — sorted and
        scored by run. Works for ONE native (a, b) group (num_rows 2)
        and for a coarse bucket of many pairs alike."""
        a = _concat(group["a"]).to_numpy(zero_copy_only=False)
        b = _concat(group["b"]).to_numpy(zero_copy_only=False)
        a_type = group.schema.field("a").type
        b_type = group.schema.field("b").type
        if group.num_rows < 2:
            return pa.table(
                {"a": pa.array(a[:0], type=a_type), "b": pa.array(b[:0], type=b_type)}
            )
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        starts = np.flatnonzero(np.r_[new, True])
        counts = np.diff(starts)
        sig_arr = _concat(group["sig"])
        offs = np.asarray(sig_arr.offsets).astype(np.int64, copy=False)
        flat = np.asarray(sig_arr.values).astype(np.uint64, copy=False)
        sel = np.flatnonzero(counts == 2)  # runs missing a sig can't verify
        if sel.size == 0:
            return pa.table(
                {"a": pa.array(a[:0], type=a_type), "b": pa.array(b[:0], type=b_type)}
            )
        s_idx = starts[sel]
        i0 = order[s_idx]
        i1 = order[s_idx + 1]
        w0 = offs[i0 + 1] - offs[i0]
        w1 = offs[i1 + 1] - offs[i1]
        if (
            score_pairs_fn is not None
            and w0[0] > 0
            and np.all(w0 == w0[0])
            and np.all(w1 == w0[0])
        ):
            # fixed-width signatures (minhash perms): score the whole
            # bucket's pairs vectorized — the per-pair Python loop
            # below costs ~1000x the arithmetic at the pair volumes
            # this tier exists for. Chunked through reused gather
            # buffers (the driver path's first-touch lesson).
            L = int(w0[0])
            keep = np.zeros(sel.size, dtype=bool)
            chunk = 65536
            col = np.arange(L, dtype=np.int64)
            m0 = min(chunk, sel.size)
            buf0 = np.empty((m0, L), dtype=flat.dtype)
            buf1 = np.empty_like(buf0)
            for s in range(0, sel.size, chunk):
                m = min(chunk, sel.size - s)
                np.take(flat, offs[i0[s : s + m]][:, None] + col, out=buf0[:m])
                np.take(flat, offs[i1[s : s + m]][:, None] + col, out=buf1[:m])
                keep[s : s + m] = (
                    np.asarray(score_pairs_fn(buf0[:m], buf1[:m])) >= threshold
                )
            return pa.table(
                {
                    "a": pa.array(a_s[s_idx[keep]], type=a_type),
                    "b": pa.array(b_s[s_idx[keep]], type=b_type),
                }
            )
        out_a: list = []
        out_b: list = []
        for ri in sel:  # variable-width sigs (e.g. n-gram sets)
            s = starts[ri]
            j0, j1 = order[s], order[s + 1]
            s0 = flat[offs[j0] : offs[j0 + 1]]
            s1 = flat[offs[j1] : offs[j1 + 1]]
            if score_fn(s0, s1) >= threshold:
                out_a.append(a_s[s])
                out_b.append(b_s[s])
        return pa.table(
            {
                "a": pa.array(np.array(out_a, dtype=a.dtype), type=a_type),
                "b": pa.array(np.array(out_b, dtype=b.dtype), type=b_type),
            }
        )

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    schema = pairs_ds.schema()
    a_type = schema.types[schema.names.index("a")]
    b_type = schema.types[schema.names.index("b")]
    int_keys = pa.types.is_integer(a_type) and pa.types.is_integer(b_type)

    unioned = pairs_ds.map_batches(_requests, batch_format="pyarrow").union(
        sigs_ds.map_batches(_sig_rows, batch_format="pyarrow")
    )

    if 2 * n_pairs <= _DISTINCT_PAIRS_NATIVE_LIMIT or not int_keys:

        def _attach(group: pa.Table) -> pa.Table:
            is_sig = pc.is_valid(group["sig"])
            sig_rows = group.filter(is_sig)
            reqs = group.filter(pc.invert(is_sig))
            if sig_rows.num_rows == 0 or reqs.num_rows == 0:
                return group.select(["a", "b", "sig"]).slice(0, 0)
            sig = sig_rows["sig"][0]
            return pa.table(
                {
                    "a": reqs["a"],
                    "b": reqs["b"],
                    "sig": pa.array(
                        [sig.as_py()] * reqs.num_rows, pa.list_(pa.uint64())
                    ),
                }
            )

        attached = unioned.groupby("key").map_groups(
            _attach, batch_format="pyarrow"
        )
        return attached.groupby(["a", "b"]).map_groups(
            _score_runs, batch_format="pyarrow"
        )

    # coarse plan — exchange 1 carries 2 request rows per pair plus the
    # (key-bounded) sig rows, exchange 2 the 2 attached rows per pair
    nb1 = max(32, int(3 * n_pairs // target_rows_per_bucket) + 1)
    nb2 = max(32, int(2 * n_pairs // target_rows_per_bucket) + 1)

    def _cb_key(t: pa.Table) -> pa.Table:
        k = _concat(t["key"]).to_numpy(zero_copy_only=False)
        return t.append_column("__cb", pa.array(coarse_buckets(nb1, k)))

    def _attach_coarse(group: pa.Table) -> pa.Table:
        is_sig = pc.is_valid(group["sig"])
        sig_t = group.filter(is_sig)
        req_t = group.filter(pc.invert(is_sig))
        empty = pa.table(
            {
                "a": pa.array([], type=a_type),
                "b": pa.array([], type=b_type),
                "sig": pa.array([], type=pa.list_(pa.uint64())),
            }
        )
        if sig_t.num_rows == 0 or req_t.num_rows == 0:
            return empty
        sk = _concat(sig_t["key"]).to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sk_sorted = sk[order]
        rk = _concat(req_t["key"]).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_sorted, rk)
        pos = np.minimum(pos, len(sk_sorted) - 1)
        found = sk_sorted[pos] == rk
        if not found.any():
            return empty
        take_idx = order[pos[found]]
        req_f = req_t.filter(pa.array(found))
        sig_col = _concat(sig_t["sig"])
        return pa.table(
            {
                "a": req_f["a"],
                "b": req_f["b"],
                "sig": sig_col.take(pa.array(take_idx, type=pa.int64())),
            }
        )

    def _cb_pair(t: pa.Table) -> pa.Table:
        a = _concat(t["a"]).to_numpy(zero_copy_only=False)
        b = _concat(t["b"]).to_numpy(zero_copy_only=False)
        return t.append_column("__cb", pa.array(coarse_buckets(nb2, a, b)))

    attached = (
        unioned.map_batches(_cb_key, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_attach_coarse, batch_format="pyarrow")
    )
    return (
        attached.map_batches(_cb_pair, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(_score_runs, batch_format="pyarrow")
    )


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    components: str = "auto",
    verify: str = "auto",
) -> ray.data.Dataset:
    """Near-dup removal with *exact* word-n-gram Jaccard verification.

    Two-phase, payload-free (round-2 redesign — round 1 shipped the
    full text into every band row, band-fanout × document bytes):

    1. candidate generation: MinHash over word n-grams → SKINNY band
       rows ``(key, band_id, band_hash)`` only →
       ``lsh_candidate_pairs_bucketed`` (one coarse-bucket exchange,
       vectorized in-bucket expansion) → distinct candidate pairs
       (wide bands → high recall);
    2. verification: hashed n-gram signature arrays (``word_ngrams``,
       uint64 — exact Jaccard modulo 64-bit collisions) are computed
       only for candidate keys and scored per pair
       (``_verify_candidates``: driver numpy at duplicate-bounded
       volume, union+groupby pair-join beyond).

    Exact pairwise only within LSH buckets — never all-pairs across
    the dataset; survivors via drop-set broadcast filter.
    """
    # stateless task stage (see minhash_lsh_dedup): params in closure,
    # no actor-pool spawn cost
    mh_a, mh_b = minhash_params(num_perm)

    def _ngram_band_batch(batch: pa.Table) -> pa.Table:
        keys, band_ids, band_hashes = [], [], []
        for key, text in zip(
            batch[key_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sig = minhash_signature(word_ngrams(text or "", n), mh_a, mh_b)
            for band_id, band_hash in lsh_band_keys(sig, bands):
                keys.append(key)
                band_ids.append(band_id)
                band_hashes.append(band_hash)
        return pa.table(
            {
                "key": pa.array(keys, type=batch[key_col].type),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(
                    np.array(band_hashes, dtype=np.uint64).view(np.int64)
                ),
            }
        )

    band_rows = ds.map_batches(_ngram_band_batch, batch_format="pyarrow").materialize()
    if band_rows.count() <= SMALL_INPUT_BAND_ROWS:
        candidates = _driver_candidate_pairs(
            band_rows.to_pandas(), "band_id", "band_hash"
        )
    else:
        candidates = lsh_candidate_pairs_bucketed(
            band_rows, "band_id", "band_hash"
        )

    def _sig(text: str) -> np.ndarray:
        return word_ngrams(text, n)

    def _jaccard(s0: np.ndarray, s1: np.ndarray) -> float:
        return ngram_jaccard(s0, s1, n)

    verified = _verify_candidates(
        candidates, ds, text_col, key_col, _sig, _jaccard, threshold, verify
    )
    drop = resolve_drop_keys(verified, components=components)
    return drop_keys_filter(ds, key_col, drop)


# --- embedding cosine near-dup ---------------------------------------------


def _tiled_cosine_pairs(
    ks: np.ndarray, nm: np.ndarray, threshold: float, out_a: list, out_b: list
) -> None:
    """All (a < b) key pairs with cosine >= threshold over pre-normalized
    rows ``nm``. ``ks`` sorted ascending, unique; memory O(_TILE^2) —
    never an m x m similarity matrix."""
    m = len(ks)
    for i0 in range(0, m, _TILE):
        bi = nm[i0 : i0 + _TILE]
        for j0 in range(i0, m, _TILE):
            sims = bi @ nm[j0 : j0 + _TILE].T
            ii, jj = np.where(sims >= threshold)
            keep = (ii + i0) < (jj + j0)  # strict upper triangle, global idx
            out_a.append(ks[ii[keep] + i0])
            out_b.append(ks[jj[keep] + j0])


# recursion depth bound for the over-cap hyperplane split; hitting it
# (or a non-shrinking split) falls back to the tiled exact scan, which
# is memory-bounded at any size
_SPLIT_MAX_DEPTH = 40


def _cosine_pairs_recursive(
    ks: np.ndarray,
    nm: np.ndarray,
    threshold: float,
    seed: int,
    depth: int,
    out_a: list,
    out_b: list,
) -> None:
    """Cosine-pair extraction for an over-cap bucket: recursive
    seeded-hyperplane split with an overlap band (spill tree).

    Unit vectors with cosine >= t are at most delta = sqrt(2 - 2t)
    apart, so their projections on a unit normal differ by <= delta —
    an overlap band of half-width delta on BOTH sides would make the
    split exact. But delta exceeds the typical projection spread
    (~1/sqrt(dim)) for dim >~ 1/(2(1-t)), where an exact band swallows
    everything; so the band half-width is min(delta, the spill
    quantile of |projection|) — exact whenever the data allows, else a
    bounded 20%-spill multi-probe whose recall is measured on planted
    duplicates in ``bench.py --dedup`` (VERDICT r2: bucket-size cap
    with recursive splitting + multi-probe). Guaranteed shrink
    <= (1 + spill)/2 per side; an all-identical bucket emits a star
    (same components as the clique); a degenerate non-shrinking split
    falls back to the two-axis tiled scan — quadratic compute but
    memory stays O(_TILE^2). Pairs can surface on both sides; callers
    dedupe.
    """
    m = len(ks)
    if m < 2:
        return
    if m <= _BUCKET_PAIR_CAP or depth >= _SPLIT_MAX_DEPTH:
        _tiled_cosine_pairs(ks, nm, threshold, out_a, out_b)
        return
    if (nm == nm[0]).all():  # identical vectors: star, not O(m^2) clique
        out_a.append(np.full(m - 1, ks[0], dtype=ks.dtype))
        out_b.append(ks[1:])
        return
    delta = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    plane = np.random.RandomState(seed + depth).standard_normal(nm.shape[1])
    plane /= np.linalg.norm(plane) or 1.0
    d = nm @ plane
    margin = min(delta, float(np.quantile(np.abs(d), 0.2)))
    left = d <= margin
    right = d > -margin
    n_left, n_right = int(left.sum()), int(right.sum())
    if max(n_left, n_right) >= m:  # degenerate: band swallowed a side
        _tiled_cosine_pairs(ks, nm, threshold, out_a, out_b)
        return
    _cosine_pairs_recursive(
        ks[left], nm[left], threshold, seed, depth + 1, out_a, out_b
    )
    _cosine_pairs_recursive(
        ks[right], nm[right], threshold, seed, depth + 1, out_a, out_b
    )


def _cosine_bucket_pairs(
    group: pd.DataFrame, key_col: str, threshold: float, seed: int
) -> pd.DataFrame:
    """Within-bucket cosine pair extraction shared by
    ``embedding_dedup`` and ``semantic_dedup``: sort/dedup by key,
    normalize, memory-bounded kernels (two-axis tiled matmul up to
    ``_BUCKET_PAIR_CAP`` rows, exact-margin recursive hyperplane split
    beyond). Expects packed float64 bytes in a ``vec`` column."""
    empty = group[key_col].iloc[:0]
    if len(group) < 2:
        return pd.DataFrame({"a": empty, "b": empty.copy()})
    rows = group.sort_values(key_col).drop_duplicates(key_col)
    if len(rows) < 2:
        return pd.DataFrame({"a": empty, "b": empty.copy()})
    mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in rows["vec"]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nm = mat / norms
    ks = rows[key_col].to_numpy()
    out_a: list = []
    out_b: list = []
    if len(ks) <= _BUCKET_PAIR_CAP:
        _tiled_cosine_pairs(ks, nm, threshold, out_a, out_b)
    else:
        _cosine_pairs_recursive(ks, nm, threshold, seed, 0, out_a, out_b)
    if not out_a:
        return pd.DataFrame({"a": empty, "b": empty.copy()})
    pairs = pd.DataFrame(
        {
            "a": pd.Series(np.concatenate(out_a), dtype=empty.dtype),
            "b": pd.Series(np.concatenate(out_b), dtype=empty.dtype),
        }
    )
    # buckets built from overlapping probes can emit a pair twice
    return pairs.drop_duplicates(ignore_index=True)


def embedding_dedup(
    ds: ray.data.Dataset,
    vec_col: str,
    key_col: str,
    *,
    threshold: float = 0.95,
    n_buckets: int | str = "auto",
    target_bucket_rows: int = 4096,
    seed: int = 42,
    components: str = "auto",
) -> ray.data.Dataset:
    """Cosine near-dup over an embedding column via random-hyperplane LSH.

    Per batch: sign-bucket each vector with ``log2(n_buckets)`` random
    hyperplanes (broadcast, seeded); groupby bucket; within a bucket,
    memory-bounded cosine pair extraction (two-axis tiled matmul up to
    ``_BUCKET_PAIR_CAP`` rows, exact-margin recursive hyperplane split
    beyond — see ``_cosine_pairs_recursive``); drop-set resolution +
    broadcast filter keeps min key per cluster. Each vector crosses the
    bucket shuffle exactly once (no band fan-out).

    ``n_buckets="auto"`` (default) sizes the bucket count from the
    dataset so the EXPECTED bucket holds ~``target_bucket_rows`` rows —
    a fixed bucket count grows buckets linearly with the corpus
    (VERDICT r2 scale-killer); skewed buckets beyond the cap are
    handled by the in-bucket recursive split. Neighbors split across
    top-level buckets are missed with probability (1 - theta/pi)^planes
    — the standard SimHash-LSH recall tradeoff (the IN-bucket pair
    extraction itself is exact); ``n_buckets=1`` is the fully exact
    form, still memory-bounded via the recursive split.
    """
    def _project(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key_col]].copy()
        out["vec"] = pd.Series(
            [np.asarray(v, dtype=np.float64).tobytes() for v in df[vec_col]],
            dtype=object,
            index=out.index,
        )
        return out

    skinny = ds.map_batches(_project, batch_format="pandas")
    if n_buckets == "auto":
        # size the bucket count from the SKINNY projection, materialized
        # once: a separate ds.count() ahead of the lazy bucket map would
        # re-execute the full upstream twice (VERDICT r3 #7). The
        # materialized state is (key, packed-vec) — the same bytes the
        # exchange moves anyway, spillable in the object store.
        skinny = skinny.materialize()
        n_total = skinny.count()
        planes_n = max(0, int(np.ceil(np.log2(max(1.0, n_total / target_bucket_rows)))))
    else:
        planes_n = max(1, int(np.log2(n_buckets))) if n_buckets > 1 else 0

    def _bucketize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out["bucket"] = np.zeros(0, dtype=np.int64)
            return out
        mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in df["vec"]])
        if planes_n:
            planes = np.random.RandomState(seed).standard_normal(
                (mat.shape[1], planes_n)
            )
            bucket = ((mat @ planes) >= 0) @ (1 << np.arange(planes_n))
        else:
            bucket = np.zeros(len(df), dtype=np.int64)
        out = df.copy()
        out["bucket"] = bucket.astype(np.int64)
        return out

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        return _cosine_bucket_pairs(group, key_col, threshold, seed)

    pairs_ds = (
        skinny.map_batches(_bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
    drop = resolve_drop_keys(pairs_ds, components=components)
    return drop_keys_filter(ds, key_col, drop)


def semantic_dedup(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.8,
    components: str = "auto",
    seed: int = 42,
    decimals: int | None = 9,
    chunk_elems: int = 4_000_000,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public paper): assign each embedding to its nearest centroid
    (Euclidean, same rounding/tie contract as
    ``stages.similarity.kmeans_assign``), extract cosine-similar pairs
    WITHIN each cluster, and keep the min-key representative of every
    connected component.

    Differs from ``embedding_dedup`` only in the bucketing function:
    clusters are semantic (k-means centroids, typically trained with
    ``stages.similarity.kmeans_fit``) rather than random hyperplanes,
    so near-duplicates that straddle a hyperplane cut are instead
    co-located by meaning — the published SemDeDup recall argument.
    Pairs split across clusters are missed by design (the paper's
    within-cluster contract).

    Scale shape: centroids broadcast once; each vector crosses the
    cluster shuffle exactly once; in-cluster pair extraction uses the
    same memory-bounded kernels as ``embedding_dedup``
    (``_tiled_cosine_pairs`` up to ``_BUCKET_PAIR_CAP`` rows,
    ``_cosine_pairs_recursive`` beyond); drop-set resolution and the
    broadcast filter are duplicate-bounded. Cluster count should track
    corpus size (the paper uses ~sqrt(n) clusters) so the expected
    cluster stays small; oversized clusters are handled by the
    recursive split, not by driver memory.
    """
    from .similarity import assign_nearest

    cents = np.asarray(centroids, dtype=np.float64)
    cents_ref = ray.put(cents)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    key_col: df[key_col],
                    "bucket": pd.Series([], dtype=np.int64),
                    "vec": pd.Series([], dtype=object),
                }
            )
        c = ray.get(cents_ref)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        bucket = assign_nearest(
            mat, c, decimals=decimals, chunk_elems=chunk_elems
        )
        out = df[[key_col]].copy()
        out["bucket"] = bucket
        out["vec"] = [v.tobytes() for v in mat]
        return out

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        return _cosine_bucket_pairs(group, key_col, threshold, seed)

    pairs_ds = (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
    drop = resolve_drop_keys(pairs_ds, components=components)
    return drop_keys_filter(ds, key_col, drop)
