"""Generic distributed hash join — the big-×-big seam.

The engine's own join family deliberately AVOIDS generic joins
(SURVEY.md §2.5: J1 keeps one wide table, J2-J4 are broadcast lookups /
manifest anti-joins, bloom_semi_join is a broadcast prefilter + exact
verify), because at 100 TB a shuffle join is the single most expensive
plan node. When both sides really are corpus-scaled, though, a hash
join IS the right operator — this module is that explicit, documented
escape hatch, built on Ray Data's native hash-shuffle join
(``Dataset.join``, hash-partitions both sides into ``num_partitions``
aggregators) with the two join types it lacks (semi / anti) derived
from it.

Use this only after asking whether a broadcast (`ray.put` + map) or a
skinny-projection exchange could do the job — that question is the
difference between shipping 8 bytes/row and shipping the payload.
"""

from __future__ import annotations

import ray.data

__all__ = ["hash_join"]

_NATIVE = {
    "inner": "inner",
    "left": "left_outer",
    "left_outer": "left_outer",
    "right": "right_outer",
    "right_outer": "right_outer",
    "outer": "full_outer",
    "full": "full_outer",
    "full_outer": "full_outer",
}

_MARKER = "__semi_marker"


def auto_partitions(requested: int | None = None) -> int:
    """Size a hash exchange for the running session: the native join
    holds one aggregator actor per partition, each pinning a CPU —
    asking for more partitions than the cluster has CPUs deadlocks a
    small session. At cluster scale callers pass 2-4x total cores
    explicitly. Shared by every hash_join caller that auto-sizes
    (crawl_delta, DistributedPageRankResult.attach) so the deadlock
    rule lives in one place."""
    if requested is not None:
        return requested
    import ray

    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8)) - 1))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    *,
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
) -> ray.data.Dataset:
    """Distributed hash join of two datasets.

    ``how``: ``inner`` / ``left`` / ``right`` / ``outer`` (native
    hash-shuffle join), plus ``semi`` and ``anti`` — left rows with /
    without a key match, never duplicated by multiple matches:

    * ``semi``  = inner join against the DISTINCT right-key projection
      (the right side collapses to unique keys first, so the exchange
      ships 8-byte keys, not payload — same spirit as bloom_semi_join,
      exact by construction).
    * ``anti``  = left_outer join against the distinct right keys plus
      a constant marker column; survivors are the marker-null rows.

    ``num_partitions`` sizes the hash exchange (one aggregator per
    partition) — at cluster scale set it to ~2-4× total cores; skewed
    keys fall back on Ray's block splitting within a partition.

    Column collisions between the sides get ``right_suffix`` (native
    join contract). For semi/anti the output schema is exactly the
    left schema.
    """
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_on_t = (
        on_t
        if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    if how in ("semi", "anti"):
        keys = right.select_columns(list(r_on_t))
        # distinct keys: skinny groupby-count, drop the count
        distinct = keys.groupby(list(r_on_t)).count().drop_columns(["count()"])
        if how == "semi":
            return left.join(
                distinct,
                join_type="inner",
                num_partitions=num_partitions,
                on=on_t,
                right_on=r_on_t if right_on is not None else None,
                right_suffix=right_suffix,
            )
        marked = distinct.add_column(
            _MARKER, lambda df: [1] * len(df), batch_format="pandas"
        )
        joined = left.join(
            marked,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=on_t,
            right_on=r_on_t if right_on is not None else None,
            right_suffix=right_suffix,
        )
        import pyarrow.compute as pc

        kept = joined.map_batches(
            lambda t: t.filter(pc.is_null(t[_MARKER])),
            batch_format="pyarrow",
        )
        drop = [_MARKER]
        if right_on is not None:
            # unmatched left rows carry null right-key columns; drop them
            drop += [c for c in r_on_t if c not in on_t]
        return kept.drop_columns([c for c in drop if c in joined.schema().names])
    try:
        join_type = _NATIVE[how]
    except KeyError:
        raise ValueError(
            f"how={how!r}; expected one of {sorted(_NATIVE)} + ['semi', 'anti']"
        ) from None
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_on_t if right_on is not None else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
