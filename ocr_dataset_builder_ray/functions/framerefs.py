"""``F:i`` frame-reference delta codec (M11 graft).

The reference's batch JSONs may store a frame's cell as ``F:3`` ("same
as row 3 of this ordered group") or ``F:3 <appended>`` ("row 3's value
plus a suffix"), decoded recursively with memoization and a
forward-reference guard at read time
(docs/FRAME_REFERENCING_NOTATION.md:9-26; decoder
data/pytorch_dataset.py:189-268). Matching decode semantics, iterative:

* ``F:<digits><rest>`` → ``decode(ref) + rest`` when ``ref < i``;
* a self/forward reference, or ``F:`` with no digits, keeps the raw
  cell verbatim (the reference's warning-and-fallback path);
* anything not starting with ``F:`` is literal.

In the engine this is a per-group ordered scan: groups are one url's
capture history ordered by ``warc_ts`` (≙ one video's frames ordered
by frame index), so ``decode_ref_column`` wraps the codec in
``groupby(group_col).map_groups`` with an in-group sort — the same
shape as the reference's per-video decode loop, but distributed.

``encode_refs`` is the inverse (the reference never encodes — its LLM
emits the notation — but an encoder makes the codec round-trippable
and testable): a cell equal to the previous decoded value becomes
``F:{i-1}``; a cell extending it becomes ``F:{i-1}<suffix>``.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def decode_refs(cells: list[str]) -> list[str]:
    """Decode a group's ordered cells; total, deterministic, O(n)."""
    out: list[str] = []
    for i, cell in enumerate(cells):
        cell = cell if cell is not None else ""
        if not cell.startswith("F:"):
            out.append(cell)
            continue
        rest = cell[2:]
        j = 0
        while j < len(rest) and rest[j].isdigit():
            j += 1
        if j == 0:  # "F:" with no index -> raw
            out.append(cell)
            continue
        ref = int(rest[:j])
        if ref >= i:  # self/forward reference -> raw (guard)
            out.append(cell)
            continue
        out.append(out[ref] + rest[j:])
    return out


def encode_refs(cells: list[str]) -> list[str]:
    """Inverse transform against the previous row (run-length flavor)."""
    out: list[str] = []
    prev: str | None = None
    for i, cell in enumerate(cells):
        cell = cell if cell is not None else ""
        if prev is not None and cell == prev and not cell.startswith("F:"):
            out.append(f"F:{i - 1}")
        elif (
            prev is not None
            and prev != ""
            and cell.startswith(prev)
            and not cell.startswith("F:")
        ):
            out.append(f"F:{i - 1}{cell[len(prev):]}")
        else:
            out.append(cell)
        prev = cell
    return out


def decode_ref_column(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Distributed read-time decode: per-group ordered scan.

    Partitioning assumption (SURVEY.md §7.3): one group = one url's
    capture history — small enough to collect per ``map_groups`` call;
    never key this on host-level groups.
    """
    target = out_col or value_col

    def _decode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).reset_index(drop=True)
        g[target] = decode_refs(list(g[value_col]))
        return g

    return ds.groupby(group_col).map_groups(_decode, batch_format="pandas")
