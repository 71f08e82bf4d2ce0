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

from ..stages.extract import ExtractPages, assemble_spans, dedup_table
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
    dedup_buckets: int | None = None,
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
    kwargs = dict(fn_constructor_kwargs={"dedup_buckets": dedup_buckets})
    if not size_split:
        if concurrency is None:
            # floor high enough that the pool is warm from the first
            # blocks (min=1 ramps one actor at a time and wastes the
            # first seconds of every run)
            concurrency = (max(1, (cpus - 1) // 2), max(1, cpus - 1))
        return ds.map_batches(
            ExtractPages,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            **kwargs,
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
        **kwargs,
    )
    big = ds.map_batches(_big, batch_format="pyarrow").map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, max(1, cpus // 4)),
        **kwargs,
    )
    return small.union(big)


# Dedup shuffle fan-out. Each bucket is collected as ONE in-memory
# table by map_groups, so size this to the data: buckets ≈
# total_extracted_bytes / target_bucket_bytes (~64 MB). At 10^12-doc
# scale the caller passes n_buckets explicitly (hash-partition width);
# the default suits the test/bench corpora.
DEFAULT_DEDUP_BUCKETS = 64


def _dedup_bucket(t: pa.Table) -> pa.Table:
    return dedup_table(t).drop_columns(["url_bucket"])


def dedup_latest(
    ds: ray.data.Dataset,
    n_buckets: int = DEFAULT_DEDUP_BUCKETS,
    *,
    pre_bucketed: bool = False,
) -> ray.data.Dataset:
    """Exact per-url dedup: hash-bucket shuffle → vectorized first-per-url.

    Two-phase (SURVEY.md §2.8 D2): (1) per-batch combiner dedup — fused
    into the extract stage when ``pre_bucketed`` (cuts shuffle volume
    when recaptures co-locate in a block); (2) groupby on the
    low-cardinality ``url_bucket = url_hash % n_buckets`` key — the
    all-to-all moves the same bytes as a url-key shuffle but
    sorts/samples only a small int column — then one vectorized
    keep-latest pass per bucket. Winners are per-url, so bucket
    boundaries cannot change results at any parallelism.
    """
    if not pre_bucketed:
        mask = n_buckets - 1 if (n_buckets & (n_buckets - 1)) == 0 else None

        def _combine_and_bucket(t: pa.Table) -> pa.Table:
            t = dedup_table(t)
            h = t["url_hash"]
            b = (
                pc.bit_wise_and(h, pa.scalar(mask, pa.uint64()))
                if mask is not None
                else pc.mod(h, pa.scalar(n_buckets, pa.uint64()))
            )
            return t.append_column("url_bucket", pc.cast(b, pa.int64()))

        ds = ds.map_batches(_combine_and_bucket, batch_format="pyarrow")
    return ds.groupby("url_bucket").map_groups(_dedup_bucket, batch_format="pyarrow")


def extraction_pipeline(
    paths: str | list[str],
    *,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 128,
    size_split: bool = False,
) -> ray.data.Dataset:
    """Lazy end-to-end flagship Dataset (consume with write/iter/agg).

    Spans travel as flat list<primitive> columns through the stages and
    the dedup exchange, and are assembled into the public
    ``spans: list<struct>`` view in one final vectorized map.
    """
    ds = read_pages(paths)
    ds = extract_pages(
        ds,
        concurrency=concurrency,
        batch_size=batch_size,
        size_split=size_split,
        dedup_buckets=DEFAULT_DEDUP_BUCKETS if dedup else None,
    )
    if dedup:
        ds = dedup_latest(ds, pre_bucketed=True)
    return ds.map_batches(assemble_spans, batch_format="pyarrow")


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
