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


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of hashed k-character shingles (for Jaccard / MinHash)."""
    if len(text) < k:
        return {stable_hash64(text)} if text else set()
    return {stable_hash64(text[i : i + k]) for i in range(len(text) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[int]:
    """Set of hashed word n-grams (n-gram Jaccard dedup)."""
    words = text.split()
    if len(words) < n:
        return {stable_hash64(" ".join(words))} if words else set()
    return {
        stable_hash64(" ".join(words[i : i + n])) for i in range(len(words) - n + 1)
    }


# ---------------------------------------------------------------------------
# MinHash — mergeable sketch over shingle sets.
# Universal-hash family h_i(x) = (a_i * x + b_i) mod p, p Mersenne-61;
# parameters derived deterministically from a fixed seed.
# ---------------------------------------------------------------------------


def minhash_params(num_perm: int = 64, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, computed in python-int space is slow; use object
    # ops only at the final mod. uint64 overflow-safe via uint128 emulation:
    # split a*x into high/low — numpy has no uint128, so do it in float-free
    # python for correctness on small sets, vectorized over permutations.
    xs = x.astype(object)
    sig = np.empty(len(a), dtype=np.uint64)
    for i in range(len(a)):
        vals = (int(a[i]) * xs + int(b[i])) % _MERSENNE_61
        sig[i] = _U64(min(vals))
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """Split a signature into ``bands`` bands; return (band_id, band_hash)."""
    rows = len(sig) // bands
    out = []
    for band in range(bands):
        chunk = sig[band * rows : (band + 1) * rows]
        out.append((band, stable_hash64(chunk.tobytes())))
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token list (near-dup by Hamming distance)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    ones = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h = _U64(stable_hash64(t))
        bits = ((h >> ones) & _U64(1)).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
