"""Shared coarse-bucket mixing kernels.

Every ``% n_buckets`` coarse-bucket key in the repo routes through
here so the entropy contract is audited in ONE place: each operand
goes through a wrapping multiply by its own prime BEFORE the
``>> 32`` that feeds the modulo, because the high 32 bits are the
only part the bucket id consumes. A hand-rolled variant once XORed a
raw 16-bit value into the mix — the high bits stayed a function of
the other operand alone and the exchange silently collapsed to 4
groups at any corpus size (see ``stages/dedup.py`` history and
``tests/test_dedup_scale.py::test_bucket_mix_spreads_narrow_hash_values``).

A mix collision merely merges two real buckets into one coarse group
(the per-group kernels re-separate them); it can never split or drop
a real bucket, so callers' outputs are invariant to the exact mix.
"""

from __future__ import annotations

import numpy as np

MIX_PRIME = np.uint64(0x9E3779B97F4A7C15)
MIX_PRIME2 = np.uint64(0xC2B2AE3D27D4EB4F)
_PRIMES = (MIX_PRIME, MIX_PRIME2)


def mix64(*cols) -> np.ndarray:
    """uint64 mix of 1–2 integer arrays: XOR of ``(col_i + 1) *
    prime_i``. Signed inputs wrap modularly (same bits as a
    reinterpret-cast), so negative keys are fine."""
    assert 1 <= len(cols) <= len(_PRIMES), "extend _PRIMES for more operands"
    out = None
    for i, c in enumerate(cols):
        v = (np.asarray(c).astype(np.uint64) + np.uint64(1)) * _PRIMES[i]
        out = v if out is None else out ^ v
    return out


def coarse_buckets(n_buckets: int, *cols) -> np.ndarray:
    """int32 coarse-bucket ids in ``[0, n_buckets)`` — the high 32
    bits of the mix, modulo the bucket count."""
    return (
        (mix64(*cols) >> np.uint64(32)) % np.uint64(n_buckets)
    ).astype(np.int32)
