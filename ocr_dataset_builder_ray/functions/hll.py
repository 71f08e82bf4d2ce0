"""HyperLogLog — mergeable approximate count-distinct sketch.

The shuffle-free alternative to the exact count-distinct
(q07: groupby(key, value) then count): each batch builds/updates a
fixed-size register array, sketches merge with an elementwise max, and
the estimate is read once at the end — O(2^p) bytes per group moved
instead of O(distinct values). Standard HLL per Flajolet et al. 2007
with linear-counting small-range correction; hashing is pandas
``hash_array`` (deterministic SipHash), everything numpy-vectorized.

σ ≈ 1.04/√(2^p): p=14 (16 KiB/sketch) → ~0.8% standard error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class HyperLogLog:
    def __init__(self, p: int = 14, registers: np.ndarray | None = None) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_array(self, values) -> "HyperLogLog":
        vals = np.asarray(values, dtype=object)
        if not len(vals):
            return self
        h = pd.util.hash_array(vals)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # low p bits forced to 1 so `rest` > 0 and rank is naturally
        # capped at 64 - p + 1
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros + 1; clz via floor(log2). float64
        # rounding can misplace the floor for ~1-in-2^53 values — a
        # deterministic, negligible perturbation for a sketch.
        lz = np.clip(63 - np.floor(np.log2(rest.astype(np.float64))), 0, 63)
        ranks = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)

    # -- serialization for shuffle transport -------------------------------
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        p = blob[0]
        regs = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return cls(p, regs)


def approx_distinct(ds, value_col: str, group_col: str, p: int = 14):
    """Distributed approximate count-distinct per group.

    map_batches emits ONE serialized sketch per group per batch; the
    groupby moves 2^p-byte blobs (not values); per-group merge + read.
    Returns a pandas DataFrame (group_col, approx_distinct).
    """
    import pandas as pd_  # local alias, clarity with module-level pd

    def _partial(df: pd_.DataFrame) -> pd_.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            out.append(
                {
                    group_col: g,
                    "sketch": HyperLogLog(p).add_array(sub[value_col].to_numpy()).to_bytes(),
                }
            )
        return pd_.DataFrame(out, columns=[group_col, "sketch"])

    def _merge(g: pd_.DataFrame) -> pd_.DataFrame:
        acc = HyperLogLog.from_bytes(g["sketch"].iloc[0])
        for blob in g["sketch"].iloc[1:]:
            acc.merge(HyperLogLog.from_bytes(blob))
        return pd_.DataFrame(
            {group_col: [g[group_col].iloc[0]], "approx_distinct": [acc.estimate()]}
        )

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
        .sort_values(group_col)
        .reset_index(drop=True)
    )
