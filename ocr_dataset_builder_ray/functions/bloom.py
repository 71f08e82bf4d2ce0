"""Vectorized Bloom filter for broadcast semi/anti joins.

When the key set of a semi/anti join is too large to broadcast exactly
(billions of urls), broadcast a Bloom filter of it instead: a few bits
per key, no false negatives, tunable false-positive rate. A semi join
keeps a small superset (exact-verify downstream if needed); an anti
join against the filter is conservative (may keep rows that should
drop) — pair with an exact pass over the survivors when exactness is
required.

Hashing is pandas ``hash_array`` (SipHash, fixed default key —
deterministic across processes) double-hashed into k probe positions;
all build/query paths are numpy-vectorized.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class BloomFilter:
    def __init__(self, n_bits: int, n_hashes: int) -> None:
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self._words = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, values, fpr: float = 0.01) -> "BloomFilter":
        """Size for ``len(values)`` keys at target false-positive rate."""
        vals = np.asarray(list(values) if not isinstance(values, np.ndarray) else values, dtype=object)
        n = max(1, len(vals))
        n_bits = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
        n_hashes = max(1, round((n_bits / n) * math.log(2)))
        bf = cls(n_bits, n_hashes)
        if len(vals):
            bf.add_array(vals)
        return bf

    def _positions(self, values: np.ndarray) -> np.ndarray:
        """(n, k) probe bit positions via double hashing."""
        h1 = pd.util.hash_array(values)
        # independent second hash: splitmix64 finalizer of h1
        z = (h1 + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = z ^ (z >> np.uint64(31))
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_array(self, values) -> None:
        vals = np.asarray(values, dtype=object)
        pos = self._positions(vals).ravel()
        np.bitwise_or.at(
            self._words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    # -- query -------------------------------------------------------------
    def contains_array(self, values) -> np.ndarray:
        """bool[n]: no false negatives; false positives at ~fpr."""
        vals = np.asarray(values, dtype=object)
        if not len(vals):
            return np.zeros(0, dtype=bool)
        pos = self._positions(vals)
        bits = (
            self._words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=1)

    def __contains__(self, value) -> bool:
        return bool(self.contains_array(np.asarray([value], dtype=object))[0])


def bloom_semi_join(ds, keys, col: str, fpr: float = 0.01):
    """Broadcast-Bloom semi join: keep rows whose ``col`` is (probably)
    in ``keys``. Exact up to the false-positive rate — follow with an
    exact verify on the (small) survivor set when required."""
    import pyarrow as pa

    import ray

    bf_ref = ray.put(BloomFilter.build(keys, fpr=fpr))

    def _filter(t: pa.Table) -> pa.Table:
        bf = ray.get(bf_ref)
        mask = bf.contains_array(np.asarray(t[col].to_pylist(), dtype=object))
        return t.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")
