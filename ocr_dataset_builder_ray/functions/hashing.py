"""Stable hashing / fingerprinting kernels.

Everything here must be deterministic across processes and machines
(``PYTHONHASHSEED`` varies, so builtin ``hash`` is banned in the
engine). These functions back url-hash partitioning, seeded RNG for the
augmentation registry, exact/near dedup and document fingerprinting.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_U64 = np.uint64
_MERSENNE_61 = (1 << 61) - 1


def stable_hash64(s: str | bytes) -> int:
    """Deterministic 64-bit hash (blake2b-8) of a string/bytes key."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return struct.unpack("<Q", hashlib.blake2b(s, digest_size=8).digest())[0]


def md5_hex(s: str | bytes) -> str:
    """MD5 hex digest — the exact-dedup content hash.

    MD5 (not blake2) so the DuckDB oracle can reproduce it with its
    builtin ``md5()`` for the correctness gate.
    """
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return hashlib.md5(s).hexdigest()


def stable_hash64_array(values) -> np.ndarray:
    """Vector-ish stable_hash64 over an iterable of strings → uint64[]."""
    return np.fromiter(
        (stable_hash64(v) for v in values), dtype=np.uint64, count=len(values)
    )


def rolling_fingerprint(text: str, base: int = 257, mod: int = _MERSENNE_61) -> int:
    """Polynomial rolling-hash fingerprint of a whole document.

    O(n) over UTF-8 bytes; stable across runs. Used as the cheap
    document fingerprint column (`doc_fingerprint` operator).
    """
    h = 0
    for b in text.encode("utf-8", "surrogatepass"):
        h = (h * base + b + 1) % mod
    return h


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV-1a prime (odd)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Unique hashed k-byte shingles (uint64[]) for Jaccard / MinHash.

    Vectorized: one polynomial rolling hash per UTF-8 byte window,
    computed with numpy uint64 wraparound arithmetic — no per-shingle
    Python hashing. Deterministic across runs and platforms.
    """
    if not text:
        return np.empty(0, dtype=np.uint64)
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    k = min(k, len(data))
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    base = int(_SHINGLE_BASE)
    powers = np.array(
        [pow(base, k - 1 - j, 2**64) for j in range(k)], dtype=np.uint64
    )
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Unique hashed word n-grams (uint64[]) for n-gram Jaccard dedup.

    One vectorized SipHash pass (pandas ``hash_array``, fixed default
    key) over the gram strings instead of per-gram Python hashing."""
    import pandas as pd

    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < n:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))


# ---------------------------------------------------------------------------
# MinHash — mergeable sketch over shingle sets.
# Universal-hash family h_i(x) = (a_i * x + b_i) mod p, p Mersenne-61;
# parameters derived deterministically from a fixed seed.
# ---------------------------------------------------------------------------


def minhash_params(num_perm: int = 64, seed: int = 42):
    rng = np.random.RandomState(seed)
    # multiply-shift family h_i(x) = a_i*x + b_i (mod 2^64), a_i odd —
    # native uint64 wraparound, fully vectorized (no big-int modulus)
    a = rng.randint(1, 2**63 - 1, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**63 - 1, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(shingles, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set/array."""
    x = (
        shingles
        if isinstance(shingles, np.ndarray)
        else np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    )
    if x.size == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n) wraparound multiply-shift, row-wise min
    return (a[:, None] * x[None, :] + b[:, None]).min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """Split a signature into ``bands`` bands; return (band_id, band_hash)."""
    rows = len(sig) // bands
    out = []
    for band in range(bands):
        chunk = sig[band * rows : (band + 1) * rows]
        out.append((band, stable_hash64(chunk.tobytes())))
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token list (near-dup by Hamming distance).

    Vectorized: one deterministic SipHash pass over the token array
    (pandas ``hash_array`` with its fixed default key — stable across
    processes), then a (n, 64) bit-vote without per-token Python."""
    if not tokens:
        return 0
    import pandas as pd

    hs = pd.util.hash_array(np.asarray(tokens, dtype=object))  # uint64[n]
    ones = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> ones[None, :]) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(hs)
    return int(((votes > 0).astype(np.uint64) << ones).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
