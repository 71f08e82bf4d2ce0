"""Crawl-snapshot delta: classify urls between two crawl passes.

A recurring web-pipeline step the incremental machinery
(``pipelines/extraction.incremental_pass`` — at-least-once ingest of
NEW files) does not cover: given two *extracted* snapshots of the same
crawl (yesterday's and today's), decide per url whether the page was
``added`` / ``removed`` / ``modified`` / ``unchanged``, and hand the
changed subset to downstream stages (re-embedding, index refresh,
re-curation) without touching the unchanged bulk.

Scale shape: the classification joins only the skinny
``(key, content-hash)`` projections — at 10^12 documents that is a
16-byte-per-row full-outer hash exchange, while the payload columns
never move; fetching the changed payload is a semi-join against the
(typically tiny) changed-key set. Reference anchor: the reference's
checkpoint diffing is list-based (`video/frame_pipeline.py:455-509`
re-scans directories); content-level diffing has no reference
counterpart.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .join import hash_join

CHANGES = ("added", "removed", "modified", "unchanged")


from .join import auto_partitions as _auto_partitions  # shared sizing rule


def crawl_delta(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_col: str = "url",
    hash_col: str = "content_hash",
    change_col: str = "change",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Classify every key across two snapshots.

    Returns a Dataset with columns ``(key_col, old_<hash_col>,
    new_<hash_col>, change_col)`` — one row per distinct key on either
    side. Duplicate keys within a snapshot are an input error the
    caller should have resolved (this engine's extraction output is
    per-url deduped); they would multiply join rows, so each side is
    reduced to its first hash per key by a skinny groupby first —
    deterministic because equal keys carry equal hashes in a deduped
    snapshot.
    """
    o_hash, n_hash = f"old_{hash_col}", f"new_{hash_col}"
    num_partitions = _auto_partitions(num_partitions)

    def _skinny(ds: ray.data.Dataset, out: str) -> ray.data.Dataset:
        # "min hash per key" reducer: one value per key in the deduped
        # case, deterministic tie-break otherwise. A native
        # groupby(key).min() makes one Ray group PER URL — the
        # group-per-row cardinality wall (measured on the candidate-pair
        # distinct: the grouping machinery, not the arithmetic, is the
        # cost past ~10M groups) — so this is the same coarse-bucket
        # exchange + vectorized per-bucket reduce as exact_dedup /
        # _distinct_pairs: equal keys share a bucket by construction,
        # ~2M rows per group, nothing key-shaped on the driver.
        import numpy as np

        from ..functions.hashing import stable_hash64_array

        skinny = ds.select_columns([key_col, hash_col]).materialize()
        n = skinny.count()
        if n == 0:
            return skinny.map_batches(
                lambda t, _out=out: t.rename_columns([key_col, _out]),
                batch_format="pyarrow",
            )
        n_buckets = max(8, int(n // 2_000_000) + 1)

        def _bucket(t: pa.Table) -> pa.Table:
            # type resolved per batch: schema().types is not pyarrow
            # for pandas-block datasets
            if pa.types.is_integer(t.schema.field(key_col).type):
                from ._bucketing import coarse_buckets

                k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
                cb = coarse_buckets(n_buckets, k)
            else:
                kh = stable_hash64_array(
                    np.asarray(t[key_col].to_pylist(), dtype=object)
                )
                cb = ((kh >> np.uint64(32)) % np.uint64(n_buckets)).astype(
                    np.int32
                )
            return t.append_column("__cb", pa.array(cb))

        def _first(group: pa.Table) -> pa.Table:
            k = group[key_col].combine_chunks().to_numpy(zero_copy_only=False)
            h = group[hash_col].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((h, k))  # key primary, hash secondary
            k, h = k[order], h[order]
            keep = np.ones(len(k), dtype=bool)
            if len(k) > 1:
                keep[1:] = k[1:] != k[:-1]
            return pa.table(
                {
                    key_col: pa.array(
                        k[keep], type=group.schema.field(key_col).type
                    ),
                    out: pa.array(
                        h[keep],
                        type=group.schema.field(hash_col).type,
                    ),
                }
            )

        return (
            skinny.map_batches(_bucket, batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(_first, batch_format="pyarrow")
        )

    joined = hash_join(
        _skinny(old, o_hash),
        _skinny(new, n_hash),
        key_col,
        how="outer",
        num_partitions=num_partitions,
    )

    def _classify(t: pa.Table) -> pa.Table:
        old_h, new_h = t[o_hash], t[n_hash]
        has_old = pc.is_valid(old_h)
        has_new = pc.is_valid(new_h)
        change = pc.if_else(
            pc.and_not(has_new, has_old),
            pa.scalar("added"),
            pc.if_else(
                pc.and_not(has_old, has_new),
                pa.scalar("removed"),
                pc.if_else(
                    pc.equal(old_h, new_h),
                    pa.scalar("unchanged"),
                    pa.scalar("modified"),
                ),
            ),
        )
        return t.append_column(change_col, change)

    return joined.map_batches(_classify, batch_format="pyarrow")


def select_changed(
    new: ray.data.Dataset,
    delta: ray.data.Dataset,
    *,
    keep: tuple[str, ...] = ("added", "modified"),
    key_col: str = "url",
    change_col: str = "change",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Fetch the full new-snapshot rows for the changed keys.

    A semi-join of the payload-bearing snapshot against the changed-key
    projection: only 8-byte-hashable keys cross the exchange, the
    payload moves once, straight to its consumer.
    """
    bad = set(keep) - set(CHANGES)
    if bad:
        raise ValueError(f"select_changed: unknown change kinds {sorted(bad)}")
    keep_arr = pa.array(list(keep), pa.string())

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[change_col], value_set=keep_arr))

    keys = delta.map_batches(_keep, batch_format="pyarrow").select_columns(
        [key_col]
    ).materialize()
    # empty blocks lose their schema through the join's distinct
    # groupby, which then fails on the missing key field; the no-change
    # case is legitimate (identical snapshots), so short-circuit it.
    # The materialize is skinny (keys only) and feeds the join anyway.
    if keys.count() == 0:
        return new.limit(0)
    return hash_join(
        new, keys, key_col, how="semi",
        num_partitions=_auto_partitions(num_partitions),
    )
