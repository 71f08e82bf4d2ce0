"""Export projections (K6): JSONL/Parquet sinks with named output modes.

Graft of the reference's ``extract_text_dataset.py`` exporter
(data/extract_text_dataset.py:92-132) with its two projection modes:

* ``standard``       — one record per document with the extracted text
                       and metadata (≙ per-frame record export);
* ``cleaning_pairs`` — (noisy, clean) training pairs: the raw
                       pre-extracted ``text`` column against the
                       pipeline's ``extracted_text``
                       (≙ task1_raw vs task3_cleaned pairs).

Projections are a registry (SURVEY.md §2.11 extension surface); users
add modes by registering a ``Dataset -> Dataset`` function.
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data


def _standard(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.select_columns(
        ["url", "warc_ts", "lang", "extracted_text", "status", "n_chars", "n_spans"]
    )


def _cleaning_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    # requires the joined view that still carries the raw `text` column
    cols = ds.schema().names
    noisy_col = "text" if "text" in cols else "extracted_text"

    def _project(batch):
        out = batch.select([c for c in ("url", noisy_col, "extracted_text") if c in cols])
        return out.rename_columns(["url", "noisy_text", "clean_text"])

    return ds.map_batches(_project, batch_format="pyarrow")


EXPORT_MODES: dict[str, Callable[[ray.data.Dataset], ray.data.Dataset]] = {
    "standard": _standard,
    "cleaning_pairs": _cleaning_pairs,
}


def register_export_mode(
    name: str, fn: Callable[[ray.data.Dataset], ray.data.Dataset]
) -> None:
    EXPORT_MODES[name] = fn


def export_dataset(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    mode: str = "standard",
    fmt: str = "jsonl",
) -> None:
    """Project and write. ``fmt``: jsonl (one object per line) | parquet."""
    projected = EXPORT_MODES[mode](ds)
    if fmt == "jsonl":
        projected.write_json(out_dir)
    elif fmt == "parquet":
        projected.write_parquet(out_dir)
    else:
        raise ValueError(f"unknown export format {fmt!r}")


def export_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int,
    *,
    key_col: str = "url",
    mode: str | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    """Deterministic sharded training export: every row lands in shard
    ``stable_hash64(key) % n_shards``, written as
    ``shard=NNNNN/*.parquet`` plus an atomic ``_shards_manifest.json``
    with per-shard row counts.

    Shard membership is a pure function of the KEY — independent of
    partitioning, parallelism, and row order — so a re-run (or a
    different cluster size) reproduces byte-identical shard membership,
    and a training job can consume/checkpoint per shard (the same
    resumability contract as run_partitioned_extraction's
    ``part={pid}`` layout, state/manifest.py). Row counts come from the
    written parquet footers (a driver-side metadata scan, no second
    data pass).

    ``shuffle_seed`` additionally fixes the TRAINING ORDER: rows are
    globally sorted by ``shuffle_ticket(key, seed)``
    (stages/curation.py) before the partitioned write, and the ticket
    is persisted as ``_shuffle_ord`` — so within every shard the row
    order is a seeded uniform shuffle that is byte-identical at any
    parallelism / cluster size, and a consumer reading multi-file
    shards re-establishes it with ``ORDER BY _shuffle_ord`` instead of
    trusting file enumeration. One extra range-partition sort of the
    export (the payload moves once either way).
    """
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.hashing import stable_hash64_array

    if mode is not None:
        ds = EXPORT_MODES[mode](ds)

    def _add_shard(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in ("i", "u"):
            h = (keys.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
                1 << 32
            )
        else:
            h = stable_hash64_array([str(k) for k in keys])
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard))

    sharded = ds.map_batches(_add_shard, batch_format="pyarrow")
    if shuffle_seed is not None:
        from ..stages.curation import add_shuffle_ticket

        # sort by ticket only (shard is a pure key function, so the
        # within-shard relative order after the partitioned write
        # follows the global ticket order); key_col breaks 64-bit
        # ticket collisions deterministically
        sharded = add_shuffle_ticket(
            sharded, key_col, shuffle_seed, out_col="_shuffle_ord"
        ).sort(["_shuffle_ord", key_col])
    sharded.write_parquet(out_dir, partition_cols=["shard"])

    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        base = os.path.basename(root)
        if not base.startswith("shard="):
            continue
        sid = base.split("=", 1)[1]
        counts[sid] = counts.get(sid, 0) + sum(
            pq.read_metadata(os.path.join(root, f)).num_rows
            for f in files
            if f.endswith(".parquet")
        )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "shuffle_seed": shuffle_seed,
        "total_rows": int(sum(counts.values())),
        "shards": dict(sorted(counts.items())),
    }
    tmp = os.path.join(out_dir, "_shards_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_shards_manifest.json"))
    return manifest
