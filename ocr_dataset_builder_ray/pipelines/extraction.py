"""Flagship pipeline: pages → main-content extraction → dedup → sink.

Ray-Data-first rebuild of the reference's Tesseract extraction run
(`run_tesseract_pipeline`, tesseract/pipeline.py:301-408): the
ProcessPoolExecutor-per-directory plan becomes a streaming
``Dataset`` DAG; the checkpoint log becomes per-partition manifests
(state/manifest.py); the per-frame OCR map becomes the DOM extractor
actor pool (stages/extract.py).

Dataflow (SURVEY.md §7.0)::

    read_parquet(pages files)                 # columns pruned to the 3 used
      └─ map_batches(ExtractPages, pyarrow, actor pool)   # per-doc kernel
           └─ groupby(url) → latest-capture dedup + span sort   # D2/O2 shuffle
                └─ write parquet partitioned by url-hash bucket + manifest

Skew handling: blocks are byte-bounded (``target_max_block_size``), so
a handful of multi-hundred-KB html blobs yields small-row-count blocks
automatically; additionally ``split_by_size`` routes oversized blobs
(>`size_split_threshold`) through a ``batch_size=1`` actor path so one
giant document never stalls a wide batch (north_rule "skew-aware split
of oversized HTML blobs"). The extraction stage drops ``html`` before
the dedup shuffle, so the all-to-all exchange moves extracted text
only — at 10^12-document scale that is the difference between
shuffling ~raw-corpus bytes and ~clean-text bytes (5-20x smaller).
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.extract import ExtractPages
from ..state.manifest import RunManifest, shard_files

# Html payloads above this are routed through the fine-grained path.
SIZE_SPLIT_THRESHOLD = 256 * 1024
PAGES_COLUMNS = ["url", "warc_ts", "html", "lang"]  # `text` not needed -> pruned


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    except Exception:
        return os.cpu_count() or 8


def read_pages(paths: str | list[str], columns: list[str] | None = None):
    """Pruned read of a pages table (S1-S3: discovery is the read plan)."""
    return ray.data.read_parquet(paths, columns=columns or PAGES_COLUMNS)


def extract_pages(
    ds: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 128,
    size_split: bool = False,
    size_split_threshold: int = SIZE_SPLIT_THRESHOLD,
) -> ray.data.Dataset:
    """pages Dataset → extracted Dataset (per-document kernel stage).

    Default path is ONE actor pool: Ray Data blocks are byte-bounded
    (``target_max_block_size``), so oversized html blobs already land in
    small-row-count blocks and cannot blow up a batch's memory; the
    per-document kernel cost is ~linear in bytes, so byte-bounded blocks
    also bound task wall time (skew). The pool's max is capped below the
    CPU count so the read/shuffle/write stages never starve (a pool that
    reserves every CPU serializes the pipeline).

    ``size_split=True`` additionally routes blobs over
    ``size_split_threshold`` through a separate ``batch_size=1`` pool
    (north_rule's explicit skew split). That costs a second pass over
    the input's html column, so it pays off only when the size
    distribution is truly heavy-tailed; both pools are sized to sum
    below the CPU count to avoid cross-pool deadlock.
    """
    cpus = _cpus()
    if not size_split:
        if concurrency is None:
            concurrency = (1, max(1, cpus - 1))
        return ds.map_batches(
            ExtractPages,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def _small(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(pc.binary_length(t["html"]), size_split_threshold))

    def _big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.binary_length(t["html"]), size_split_threshold))

    small = ds.map_batches(_small, batch_format="pyarrow").map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, cpus // 2)),
    )
    big = ds.map_batches(_big, batch_format="pyarrow").map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, max(1, cpus // 4)),
    )
    return small.union(big)


def _dedup_group(group: pa.Table) -> pa.Table:
    """Keep the latest capture per url; deterministic tie-break.

    The groupby(url) dedup-then-sort of the north rule (graft of the
    reference's F:i repeated-frame dedup semantics, SURVEY.md §2.8 D2):
    within a url group, order by (warc_ts, content_hash) descending and
    keep the first row — byte-identical winner at any parallelism.
    Spans are already offset-ordered by construction (stages/extract.py
    emits them in document order); the invariant is asserted by tests.
    """
    if group.num_rows <= 1:
        return group
    idx = pa.compute.sort_indices(
        group,
        sort_keys=[("warc_ts", "descending"), ("content_hash", "descending")],
    )
    return group.take(idx[:1])


def dedup_latest(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact per-url dedup (hash-partition on url → per-group first)."""
    return ds.groupby("url").map_groups(_dedup_group, batch_format="pyarrow")


def extraction_pipeline(
    paths: str | list[str],
    *,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 128,
    size_split: bool = False,
) -> ray.data.Dataset:
    """Lazy end-to-end flagship Dataset (consume with write/iter/agg)."""
    ds = read_pages(paths)
    ds = extract_pages(
        ds, concurrency=concurrency, batch_size=batch_size, size_split=size_split
    )
    if dedup:
        ds = dedup_latest(ds)
    return ds


# ---------------------------------------------------------------------------
# Resumable partitioned run (the `ray job submit` entry form)
# ---------------------------------------------------------------------------


def run_partitioned_extraction(
    input_paths: str | list[str],
    out_dir: str,
    *,
    num_partitions: int = 16,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 128,
    on_partition_done=None,
) -> dict:
    """Extraction with per-partition manifests; resumable after a kill.

    Input files are deterministically sharded into ``num_partitions``
    groups (state/manifest.shard_files); each pending partition runs the
    streaming pipeline and atomically publishes ``part={pid}/`` plus a
    manifest row. A restart re-plans via the manifest anti-join and
    reprocesses only missing/stale partitions — the reference's
    checkpoint/anti-join loop (frame_pipeline.py:241-247) at partition
    granularity.

    NOTE on dedup scope: per-url dedup runs *within* a partition. For
    global dedup at 10^12 scale, run partition extraction with
    ``dedup=False`` and follow with ``dedup_latest`` over the (much
    smaller, html-free) extracted table — see pipelines/metrics.py for
    the aggregate pass. The synthetic corpus keeps recaptures of a url
    in one input file, so either scope yields identical output there.

    ``on_partition_done(pid)`` is a test hook (kill/resume injection).
    """
    if isinstance(input_paths, str):
        files = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError(f"no parquet inputs under {input_paths!r}")

    parts = shard_files(files, num_partitions)
    manifest = RunManifest(out_dir)
    todo = manifest.pending(parts)

    for pid in todo:
        t0 = time.monotonic()
        ds = extraction_pipeline(
            parts[pid],
            dedup=dedup,
            concurrency=concurrency,
            batch_size=batch_size,
        )
        tmp = os.path.join(out_dir, f"_tmp-part-{pid:05d}")
        if os.path.isdir(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        rows = 0
        data_bytes = 0
        for f in os.listdir(tmp):
            fp = os.path.join(tmp, f)
            data_bytes += os.path.getsize(fp)
            rows += pa.parquet.ParquetFile(fp).metadata.num_rows
        manifest.publish_partition(
            pid,
            tmp,
            parts[pid],
            rows=rows,
            data_bytes=data_bytes,
            wall_s=time.monotonic() - t0,
        )
        if on_partition_done is not None:
            on_partition_done(pid)

    summary = manifest.metrics()
    summary["planned_partitions"] = len(parts)
    summary["ran_partitions"] = len(todo)
    summary["skipped_partitions"] = len(parts) - len(todo)
    return summary


def read_extracted(out_dir: str) -> ray.data.Dataset:
    """Read a completed partitioned run back as one Dataset."""
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return ray.data.read_parquet(files)
