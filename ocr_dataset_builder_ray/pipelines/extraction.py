"""Flagship pipeline: pages → main-content extraction → dedup → sink.

Ray-Data-first rebuild of the reference's Tesseract extraction run
(`run_tesseract_pipeline`, tesseract/pipeline.py:301-408): the
ProcessPoolExecutor-per-directory plan becomes a streaming
``Dataset`` DAG; the checkpoint log becomes per-partition manifests
(state/manifest.py); the per-frame OCR map becomes the DOM extractor
actor pool (stages/extract.py).

Dataflow (SURVEY.md §7.0 as evolved; §8 records the deltas)::

    plan_dedup_winners(files)                 # skinny (url, warc_ts) scan:
                                              # per-url winners, no payload read
    read_parquet(pages files, columns pruned)
      └─ filter_to_winners                    # broadcast keys sized by the
                                              # DUPLICATED-url count only
      └─ map_batches(ExtractPages, pyarrow, fixed actor pool)
                                              # per-doc kernel; spans assembled
                                              # in-actor when no exchange follows
      └─ [groupby(url_bucket) dedup]          # ONLY for ambiguous same-url-
                                              # same-ts ties (content tie-break);
                                              # spans travel as flat lists here
      └─ write part={pid}/ parquet + manifest row (resumable)

The losing recaptures are dropped before extraction, so the payload
never crosses an all-to-all — at 10^12-document scale that is the
difference between shuffling ~corpus bytes and shuffling nothing.

Skew handling: blocks are byte-bounded (``target_max_block_size``), so
a handful of multi-hundred-KB html blobs yields small-row-count blocks
automatically; additionally ``size_split=True`` routes oversized blobs
(>`size_split_threshold`) through a ``batch_size=1`` actor path so one
giant document never stalls a wide batch (north_rule "skew-aware split
of oversized HTML blobs").
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
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


def probe_oversized(
    paths: str | list[str],
    threshold: int = SIZE_SPLIT_THRESHOLD,
    column: str = "html",
) -> bool:
    """Footer-only heavy-tail probe: does any input row group PROVE it
    holds a payload blob larger than ``threshold``?

    Reads only parquet footers (metadata, no data I/O). For each row
    group, ``total_uncompressed_size / num_rows`` of the payload column
    chunk is a lower bound on that group's LARGEST value (lengths are
    non-negative, so max >= mean), so a hit is proof positive — no
    false enables. Diluted tails (one giant blob averaged down by
    thousands of small rows in the same row group) can go undetected;
    those still land in byte-bounded blocks, so the miss costs tail
    latency, not memory. Cost is O(files) driver-side footer reads —
    per-partition callers probe only their own shard.
    """
    if isinstance(paths, str):
        files = sorted(glob.glob(os.path.join(paths, "*.parquet")))
        if not files and os.path.isfile(paths):
            files = [paths]
    else:
        files = list(paths)
    for f in files:
        try:
            md = pa.parquet.ParquetFile(f).metadata
        except Exception:
            continue
        idx = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == column
            ),
            None,
        )
        if idx is None:
            continue
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            if g.num_rows and (
                g.column(idx).total_uncompressed_size / g.num_rows > threshold
            ):
                return True
    return False


def extract_pages(
    ds: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 512,
    size_split: bool = False,
    size_split_threshold: int = SIZE_SPLIT_THRESHOLD,
    dedup_buckets: int | None = None,
    emit: str = "flat",
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
    kwargs = dict(fn_constructor_kwargs={"dedup_buckets": dedup_buckets, "emit": emit})
    if not size_split:
        if concurrency is None:
            # fixed-size pool (all actors start at submission — the
            # autoscaling ramp is pure dead time on a dedicated slice),
            # leaving ~1/8 of the CPUs for the read/assemble/sink
            # stages: a pool that reserves every CPU starves the feed
            # (measured 2.4x slower at 32 CPUs)
            concurrency = max(1, cpus - max(1, cpus // 8))
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


def plan_dedup_winners(files: list[str], url_range: tuple[int, int] | None = None) -> tuple:
    """Skinny pre-pass: find the urls with MULTIPLE captures and decide
    each one's winner, without touching the payload column.

    Reads only ``(url, warc_ts)`` (Parquet column pruning — the multi-KB
    ``html`` blobs never leave storage). Per-batch combiners emit one
    ``(url, max_ts, n_at_max, n_rows)`` row per url; the driver combine
    touches only key columns and returns::

        (dup_urls, winner_keys, ambiguous_urls)

    ``dup_urls`` — urls captured more than once (typically a few % of a
    crawl); ``winner_keys`` — their winning ``url|ts_us`` capture;
    ``ambiguous_urls`` — duplicated urls whose max ts is itself
    duplicated (winner needs the content tie-break). Everything
    broadcast downstream is proportional to the number of *duplicated*
    urls, not the corpus — singleton urls cost nothing.

    ``url_range=(r, n)`` scopes planning to urls with
    ``stable_hash64(url) % n == r`` — the scale path: at 10^12 docs one
    global combine would materialize ~1 row per url on the driver, but
    each of ``n`` ranges materializes only 1/n of that while the
    accumulated OUTPUT (duplicated urls only) stays duplicate-bounded.
    ``plan_dedup_winners_ranged`` runs the ranges sequentially and
    concatenates. Providing a range always uses the distributed
    combiner path.
    """
    if isinstance(files, str):
        files = sorted(glob.glob(os.path.join(files, "*.parquet")))
    if len(files) <= 256 and url_range is None:
        # partition-scoped inputs: one multi-threaded Arrow read of the
        # two key columns (planning-time metadata scan, like the
        # manifest anti-join) beats a distributed round trip
        import pyarrow.dataset as pads

        keys = pads.dataset(files).to_table(columns=["url", "warc_ts"]).to_pandas()
        return _winner_combine(keys)
    # huge inputs: distributed per-batch combiners
    return plan_dedup_winners_from_skinny(
        ray.data.read_parquet(files, columns=["url", "warc_ts"]), url_range
    )


def plan_dedup_winners_from_skinny(
    skinny: ray.data.Dataset, url_range: tuple[int, int] | None = None
) -> tuple:
    """Distributed winner planning over ANY ``(url, warc_ts)`` dataset —
    the parquet path passes a column-pruned read; the WARC path passes
    the metadata-only reader pass (``sources.warc``, ``max_payload=0``:
    payloads are drained inside the read task, never shipped). Per-batch
    combiners emit one ``(url, max_ts, n_at_max, n_rows)`` row per url
    per batch — scoped to the url-hash range when given — so the driver
    combine touches key columns only."""

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if url_range is not None:
            from ..functions.hashing import stable_hash64_array

            r, n = url_range
            h = stable_hash64_array(df["url"].tolist())
            df = df[(h % np.uint64(n)).astype(np.int64) == r]
        agg = (
            df.groupby("url", sort=False)["warc_ts"]
            .agg(max_ts="max", n_rows="size")
            .reset_index()
        )
        at_max = df.merge(
            agg.rename(columns={"max_ts": "warc_ts"})[["url", "warc_ts"]],
            on=["url", "warc_ts"],
        )
        cnt = at_max.groupby("url", sort=False).size().rename("n_at_max").reset_index()
        out = agg.merge(cnt, on="url")
        if out.empty:  # schema-stable empty for range-filtered batches
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "max_ts": pa.array([], t["warc_ts"].type),
                    "n_rows": pa.array([], pa.int64()),
                    "n_at_max": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = skinny.map_batches(_partial, batch_format="pyarrow").to_pandas()
    # expand partials back to one weighted row set with identical
    # combine semantics: max_ts rows carry n_at_max weight
    return _winner_combine(parts.rename(columns={"max_ts": "warc_ts"}))


def _winner_combine(keys) -> tuple:
    """Driver combine shared by every winner-planning path; ``keys`` is
    either raw ``(url, warc_ts)`` rows or the weighted partial form."""
    import pandas as pd

    if "n_rows" in keys.columns:  # partial form
        totals = keys.groupby("url", sort=False)["n_rows"].sum()
        weights = keys["n_at_max"]
    else:  # raw form: every capture is one row of weight 1
        totals = keys["url"].value_counts(sort=False)
        weights = None

    dup_urls = totals[totals > 1].index
    if dup_urls.empty:
        return pa.array([], type=pa.string()), pa.array([], type=pa.string()), frozenset()

    dup = keys[keys["url"].isin(dup_urls)]
    best = dup.groupby("url", sort=False)["warc_ts"].max().rename("warc_ts").reset_index()
    at_best = dup.merge(best, on=["url", "warc_ts"])
    if weights is None:
        n_at_max = at_best.groupby("url", sort=False).size()
    else:
        n_at_max = at_best.groupby("url", sort=False)["n_at_max"].sum()
    ambiguous = frozenset(n_at_max[n_at_max > 1].index)
    clear = best[~best["url"].isin(ambiguous)]
    ts_us = (clear["warc_ts"].astype("datetime64[us]") - pd.Timestamp(0)) // pd.Timedelta(
        microseconds=1
    )
    winner_keys = pa.array(clear["url"] + "|" + ts_us.astype(str))
    return pa.array(sorted(dup_urls)), winner_keys, ambiguous


def plan_dedup_winners_ranged(files, n_ranges: int) -> tuple:
    """Range-scoped winner planning: run ``plan_dedup_winners`` once per
    url-hash range and concatenate. Driver materialization per range is
    ~|urls|/n_ranges; the concatenated result is duplicate-bounded (the
    ranges partition the url space, so the union is exact)."""
    dup_parts, win_parts, ambiguous = [], [], set()
    for r in range(n_ranges):
        d, w, a = plan_dedup_winners(files, url_range=(r, n_ranges))
        if len(d):
            dup_parts.append(d)
            win_parts.append(w)
            ambiguous |= set(a)
    if not dup_parts:
        return pa.array([], type=pa.string()), pa.array([], type=pa.string()), frozenset()
    return (
        pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in dup_parts]),
        pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in win_parts]),
        frozenset(ambiguous),
    )


def filter_to_winners(ds: ray.data.Dataset, dup_urls, winner_keys, ambiguous_urls) -> ray.data.Dataset:
    """Drop losing captures BEFORE extraction (broadcast filter).

    A row is dropped iff its url is a known-duplicated url AND it is
    neither that url's winning capture nor ambiguous. The broadcast
    sets are sized by the duplicated-url count only; singleton urls
    (the vast majority) short-circuit through ``is_in`` against a tiny
    set. This replaces the post-extract payload all-to-all with a
    key-only broadcast — losers are never extracted at all.
    """
    if len(dup_urls) == 0:
        return ds
    dup_ref = ray.put(dup_urls)
    keys_ref = ray.put(winner_keys)
    amb_ref = ray.put(pa.array(sorted(ambiguous_urls)) if ambiguous_urls else None)

    def _filter(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        is_dup = pc.is_in(t["url"], value_set=dup)
        if not pc.any(is_dup).as_py():
            return t
        keys = ray.get(keys_ref)
        amb = ray.get(amb_ref)
        # normalize to microseconds BEFORE the int cast so the key matches
        # plan_dedup_winners (datetime64[us]) for any input timestamp unit
        # (ms/ns parquet inputs would otherwise silently drop every
        # unambiguous duplicated url)
        ts_us = pc.cast(
            pc.cast(pc.cast(t["warc_ts"], pa.timestamp("us")), pa.int64()), pa.string()
        )
        key = pc.binary_join_element_wise(t["url"], ts_us, "|")
        keep = pc.or_(pc.invert(is_dup), pc.is_in(key, value_set=keys))
        if amb is not None:
            keep = pc.or_(keep, pc.is_in(t["url"], value_set=amb))
        return t.filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow")


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
                else pc.subtract(h, pc.multiply(pc.divide(h, pa.scalar(n_buckets, pa.uint64())), pa.scalar(n_buckets, pa.uint64())))
            )
            return t.append_column("url_bucket", pc.cast(b, pa.int64()))

        ds = ds.map_batches(_combine_and_bucket, batch_format="pyarrow")
    return ds.groupby("url_bucket").map_groups(_dedup_bucket, batch_format="pyarrow")


def extraction_pipeline(
    paths: str | list[str] | ray.data.Dataset,
    *,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 512,
    size_split: bool | str = "auto",
    dedup_mode: str = "prefilter",
    prefilter=None,
    plan_ranges: int | None = None,
) -> ray.data.Dataset:
    """End-to-end flagship Dataset (consume with write/iter/agg).

    ``paths`` may also be a pages-shaped ``Dataset`` (url, warc_ts,
    html, lang) — e.g. the WARC bridge ``sources.warc.warc_pages`` — in
    which case the parquet-only planning scans are skipped and dedup
    runs in grouped-shuffle mode (same output contract).

    ``size_split="auto"`` (default): the footer-only ``probe_oversized``
    scan decides — the oversized-blob route turns on exactly when some
    row group proves it holds a blob over the threshold (real crawl html
    is heavy-tailed; the skew bench measured -30% wall with the split on
    such a corpus) and stays off on uniform corpora where the second
    input pass would be pure cost. Explicit ``True``/``False`` override.

    ``prefilter``: optional ``pa.Table -> pa.Table`` gate applied right
    after the read (e.g. the seen-url index filter for cross-pass
    incremental dedup) — rows it drops are never extracted.

    ``dedup_mode="prefilter"`` (default): a skinny ``(url, warc_ts)``
    planning pass picks per-url winners, which are broadcast as a filter
    BEFORE extraction — losing captures are dropped at the read, never
    extracted, and the payload never crosses an all-to-all. Only when
    some url has several captures sharing the winning timestamp does the
    (content-hash tie-break) grouped dedup shuffle run, on the already
    prefiltered stream. Output is byte-identical to ``dedup_mode=
    "shuffle"`` (the always-shuffle form) at any parallelism.

    Spans travel as flat list<primitive> columns through the stages and
    any dedup exchange, and are assembled into the public
    ``spans: list<struct>`` view in one final vectorized map.
    """
    if isinstance(paths, ray.data.Dataset):
        # Dataset input (e.g. the WARC bridge, sources/warc.warc_pages):
        # the parquet-footer probe and the skinny winner-planning scan
        # both need re-readable parquet files, so the oversized split
        # stays off (blocks are still byte-bounded) and dedup takes the
        # grouped-shuffle path on the already-extracted stream.
        ds = paths
        if size_split == "auto":
            size_split = False
        if prefilter is not None:
            ds = ds.map_batches(prefilter, batch_format="pyarrow")
        dedup_mode = "shuffle"
        paths = None
    else:
        if size_split == "auto":
            size_split = probe_oversized(paths)
        ds = read_pages(paths)
        if prefilter is not None:
            ds = ds.map_batches(prefilter, batch_format="pyarrow")
    if dedup and dedup_mode == "prefilter":
        if plan_ranges and plan_ranges > 1:
            dup_urls, winner_keys, ambiguous = plan_dedup_winners_ranged(paths, plan_ranges)
        else:
            dup_urls, winner_keys, ambiguous = plan_dedup_winners(paths)
        ds = filter_to_winners(ds, dup_urls, winner_keys, ambiguous)
        need_shuffle = bool(ambiguous)
    else:
        need_shuffle = dedup
    ds = extract_pages(
        ds,
        concurrency=concurrency,
        batch_size=batch_size,
        size_split=size_split,
        dedup_buckets=DEFAULT_DEDUP_BUCKETS if need_shuffle else None,
        emit="flat" if need_shuffle else "struct",
    )
    if not need_shuffle:
        return ds  # spans already assembled inside the actor pool
    ds = dedup_latest(ds, pre_bucketed=True)
    return ds.map_batches(assemble_spans, batch_format="pyarrow")


def extract_from_warc(
    paths,
    *,
    dedup: bool = True,
    plan: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 512,
    max_payload: int | None = None,
) -> ray.data.Dataset:
    """Flagship over WARC archives with the parquet path's
    no-payload-all-to-all plan.

    A metadata-only WARC pass (``max_payload=0``: payloads are drained
    inside the read task and never enter the object store; HTTP
    status/mime survive via the bounded head peek) feeds
    ``plan_dedup_winners_from_skinny``; the payload read is then
    prefiltered to winners, so losing recaptures are dropped before
    extraction and only ambiguous same-url-same-ts ties shuffle —
    measured 15.3 s -> ~5 s at 100k pages / 32 CPUs vs the grouped
    shuffle. Costs a second gunzip pass over the archives (~0.7 s at
    that scale); ``plan=False`` falls back to the one-pass
    grouped-shuffle form. Output is checksum-identical either way.

    The planning mask and the bridge share ``html_mime_mask`` plus the
    same oversize predicate (declared length > ``max_payload``), so the
    plan and the payload stream agree on which records exist; response
    header blocks beyond the 64 KiB head peek are out of profile for
    the plan (their mime reads null — use ``plan=False`` for such
    archives)."""
    from ..sources.warc import (
        MAX_PAYLOAD_BYTES,
        html_mime_mask,
        read_warc,
        warc_pages,
    )

    mp = MAX_PAYLOAD_BYTES if max_payload is None else max_payload
    pages = warc_pages(read_warc(paths, max_payload=mp))
    if not (dedup and plan):
        return extraction_pipeline(
            pages, dedup=dedup, concurrency=concurrency, batch_size=batch_size
        )

    def _keys(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            html_mime_mask(t), pc.less_equal(t["payload_len"], pa.scalar(mp))
        )
        return t.filter(mask).select(["url", "warc_ts"])

    skinny = read_warc(paths, max_payload=0).map_batches(
        _keys, batch_format="pyarrow"
    )
    dup_urls, winner_keys, ambiguous = plan_dedup_winners_from_skinny(skinny)
    ds = filter_to_winners(pages, dup_urls, winner_keys, ambiguous)
    need_shuffle = bool(ambiguous)
    ds = extract_pages(
        ds,
        concurrency=concurrency,
        batch_size=batch_size,
        dedup_buckets=DEFAULT_DEDUP_BUCKETS if need_shuffle else None,
        emit="flat" if need_shuffle else "struct",
    )
    if not need_shuffle:
        return ds
    ds = dedup_latest(ds, pre_bucketed=True)
    return ds.map_batches(assemble_spans, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Resumable partitioned run (the `ray job submit` entry form)
# ---------------------------------------------------------------------------


def _stabilize_lazy_imports() -> None:
    """Settle Ray Data's lazy fsspec-http probe before driving Dataset
    executions from multiple driver threads.

    ``ray.data``'s path resolution runs ``from
    fsspec.implementations.http import HTTPFileSystem`` on every
    read/write plan and catches only ``ModuleNotFoundError``
    (``ray/data/datasource/path_util.py::_is_http_filesystem``). With
    aiohttp absent that import fails every call (failed imports are
    not cached in ``sys.modules``), and two threads racing the import
    can observe a partially initialized module — a plain
    ``ImportError`` that escapes Ray's except clause and kills one
    pipeline (reproduced at 4 CPUs, 2 concurrent partitions). Pin a
    minimal stub whose class never matches an ``isinstance`` check so
    the import succeeds once and caches; no-op when the real module
    imports.
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        try:
            import fsspec.implementations
        except ModuleNotFoundError:
            return  # no fsspec at all — nothing to stabilize

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:
            """Sentinel: matches no isinstance check (Ray's probe only
            compares classes). Anyone actually CONSTRUCTING an http
            filesystem gets the same clear error the real import would
            have raised, not a silent bare object."""

            def __init__(self, *a, **k):
                raise ImportError(
                    "fsspec http filesystem unavailable: aiohttp is not "
                    "installed (stub pinned by _stabilize_lazy_imports)"
                )

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        fsspec.implementations.http = mod


def run_partitioned_extraction(
    input_paths: str | list[str],
    out_dir: str,
    *,
    num_partitions: int = 16,
    dedup: bool = True,
    global_dedup: bool = False,
    plan_ranges: int | None = None,
    partition_range: tuple[int, int] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 512,
    size_split: bool | str = "auto",
    max_concurrent_partitions: int = 1,
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

    Dedup scope: per-url dedup runs *within* a partition (files shard
    round-robin). ``global_dedup=True`` appends the two-phase global
    pass (``global_dedup_pass``): a skinny duplicate-bounded planning
    scan over the html-free extracted table, then a rewrite of only the
    partitions holding cross-partition losers — per-url dedup becomes
    exact across the whole run. ``plan_ranges`` scopes both the
    per-partition winner planning and the global planning by url-hash
    range so no code path materializes all urls driver-side.

    ``partition_range=(start, end)`` restricts this driver to partition
    ids in ``[start, end)`` — the reference's ``start_index/end_index``
    work-slicing CLI (video/frame_pipeline.py:554-559) at partition
    granularity, for manual multi-driver sharding: several drivers run
    disjoint ranges against the same out dir; the shared manifest keeps
    the union resumable.

    ``max_concurrent_partitions``: partitions run sequentially by
    default (one streaming pipeline at a time, the whole cluster per
    partition). When partitions are small relative to the cluster —
    many shards, each seconds of work — per-pipeline startup dominates
    and a bounded thread pool running N partition pipelines at once
    amortizes it (each pipeline gets ~1/N of the default actor budget;
    an explicit ``concurrency`` is passed through unchanged). Safe by
    construction: partitions touch disjoint ``part={pid}/`` dirs and
    per-pid manifest rows (atomic rename each), so the completed set
    stays resumable whichever thread finishes first. Output is
    byte-identical to the sequential run.

    ``on_partition_done(pid)`` is a test hook (kill/resume injection);
    in concurrent mode it fires in completion order.
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
    if partition_range is not None:
        lo, hi = partition_range
        todo = [p for p in todo if lo <= p < hi]

    workers = min(max(1, int(max_concurrent_partitions)), max(1, len(todo)))
    if workers <= 1:
        for pid in todo:
            _run_one_partition(
                manifest,
                pid,
                parts[pid],
                out_dir,
                dedup=dedup,
                concurrency=concurrency,
                batch_size=batch_size,
                size_split=size_split,
                plan_ranges=plan_ranges,
            )
            if on_partition_done is not None:
                on_partition_done(pid)
    else:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        _stabilize_lazy_imports()
        part_concurrency = concurrency
        if part_concurrency is None:
            # split the default actor budget across the concurrent
            # pipelines so W partitions don't each reserve the node
            cpus = _cpus()
            pool = max(1, cpus - max(1, cpus // 8))
            part_concurrency = max(1, pool // workers)
        # first failure (of a partition or the done-hook) stops new
        # partitions from starting; in-flight ones finish and stay
        # committed (at-least-once — a resume skips them). A stop
        # flag instead of future cancellation: every submitted task
        # resolves by running or returning immediately, so there is
        # no cancel-vs-dequeue race to reason about.
        stop = threading.Event()
        hook_lock = threading.Lock()
        errors: list[Exception] = []

        def _task(pid: int) -> None:
            if stop.is_set():
                return
            try:
                _run_one_partition(
                    manifest,
                    pid,
                    parts[pid],
                    out_dir,
                    dedup=dedup,
                    concurrency=part_concurrency,
                    batch_size=batch_size,
                    size_split=size_split,
                    plan_ranges=plan_ranges,
                )
            except Exception as e:
                errors.append(e)
                stop.set()
                return
            if on_partition_done is not None:
                with hook_lock:  # hooks observe one completion at a time
                    if stop.is_set():
                        return
                    try:
                        on_partition_done(pid)
                    except Exception as e:
                        errors.append(e)
                        stop.set()

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_task, todo))
        if errors:
            raise errors[0]

    if global_dedup:
        gsum = global_dedup_pass(out_dir, plan_ranges=plan_ranges or 1)

    summary = manifest.metrics()
    summary["planned_partitions"] = len(parts)
    summary["ran_partitions"] = len(todo)
    summary["skipped_partitions"] = len(parts) - len(todo)
    if global_dedup:
        summary["global_dedup"] = gsum
    return summary


def _run_one_partition(
    manifest: RunManifest,
    pid: int,
    files: list[str],
    out_dir: str,
    *,
    dedup: bool,
    concurrency,
    batch_size,
    size_split: bool | str = "auto",
    prefilter=None,
    plan_ranges=None,
) -> None:
    """Run the streaming pipeline over one partition's files and
    atomically publish data + manifest row. ``size_split="auto"``
    probes only THIS partition's footers, so the oversized route turns
    on per partition — exactly where the heavy blobs are."""
    t0 = time.monotonic()
    ds = extraction_pipeline(
        files,
        dedup=dedup,
        concurrency=concurrency,
        batch_size=batch_size,
        size_split=size_split,
        prefilter=prefilter,
        plan_ranges=plan_ranges,
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
        pid, tmp, files, rows=rows, data_bytes=data_bytes, wall_s=time.monotonic() - t0
    )


# ---------------------------------------------------------------------------
# Global (cross-partition) dedup — the documented two-phase path
# ---------------------------------------------------------------------------


def plan_global_winners(part_files: list[str], url_range: tuple[int, int] | None = None):
    """Skinny cross-partition dedup planning over committed partitions.

    Reads only ``(url, warc_ts, content_hash)`` + the file path (for
    the partition id) from the html-free extracted table; per-batch
    combiners emit one row per (url, pid); the driver merge keeps rows
    only for urls captured MORE THAN ONCE across all partitions, so
    the returned plan is duplicate-bounded. ``url_range`` scopes the
    per-range driver materialization exactly like
    ``plan_dedup_winners``.

    Winner semantics mirror ``stages/extract.dedup_table``: max
    (warc_ts, content_hash) lexicographic per url; among identical
    winning triples in several partitions, the lowest partition id
    keeps its row (deterministic).

    Returns a pandas frame with one row per (url, pid):
    ``url, pid, warc_ts, content_hash, n, n_at_best, win_ts, win_ch,
    win_pid, drops``.
    """
    import pandas as pd

    ds = ray.data.read_parquet(
        part_files, columns=["url", "warc_ts", "content_hash"], include_paths=True
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["pid"] = df["path"].str.extract(r"part=(\d+)").astype("int64")
        if url_range is not None:
            from ..functions.hashing import stable_hash64_array

            r, n = url_range
            h = stable_hash64_array(df["url"].tolist())
            df = df[(h % np.uint64(n)).astype(np.int64) == r]
        df = df.sort_values(
            ["url", "pid", "warc_ts", "content_hash"],
            ascending=[True, True, False, False],
        )
        best = df.drop_duplicates(["url", "pid"])[
            ["url", "pid", "warc_ts", "content_hash"]
        ]
        n_rows = (
            df.groupby(["url", "pid"], sort=False).size().rename("n").reset_index()
        )
        at_best = df.merge(best, on=["url", "pid", "warc_ts", "content_hash"])
        n_best = (
            at_best.groupby(["url", "pid"], sort=False)
            .size()
            .rename("n_at_best")
            .reset_index()
        )
        out = best.merge(n_rows, on=["url", "pid"]).merge(n_best, on=["url", "pid"])
        if out.empty:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pid": pa.array([], pa.int64()),
                    "warc_ts": pa.array([], t["warc_ts"].type),
                    "content_hash": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "n_at_best": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            columns=["url", "pid", "warc_ts", "content_hash", "n", "n_at_best",
                     "win_ts", "win_ch", "win_pid", "drops"]
        )
    # merge batch partials per (url, pid): best triple, summed counts
    parts = parts.sort_values(
        ["url", "pid", "warc_ts", "content_hash"], ascending=[True, True, False, False]
    )
    best_up = parts.drop_duplicates(["url", "pid"])[
        ["url", "pid", "warc_ts", "content_hash"]
    ]
    n_up = parts.groupby(["url", "pid"], sort=False)["n"].sum().reset_index()
    nb_up = (
        parts.merge(best_up, on=["url", "pid", "warc_ts", "content_hash"])
        .groupby(["url", "pid"], sort=False)["n_at_best"]
        .sum()
        .reset_index()
    )
    up = best_up.merge(n_up, on=["url", "pid"]).merge(nb_up, on=["url", "pid"])

    totals = up.groupby("url", sort=False)["n"].sum()
    dup = up[up["url"].isin(totals[totals > 1].index)].copy()
    if dup.empty:
        return pd.DataFrame(
            columns=["url", "pid", "warc_ts", "content_hash", "n", "n_at_best",
                     "win_ts", "win_ch", "win_pid", "drops"]
        )
    dup = dup.sort_values(
        ["url", "warc_ts", "content_hash", "pid"],
        ascending=[True, False, False, True],
    )
    win = dup.drop_duplicates("url")[["url", "warc_ts", "content_hash", "pid"]].rename(
        columns={"warc_ts": "win_ts", "content_hash": "win_ch", "pid": "win_pid"}
    )
    plan = dup.merge(win, on="url")
    keeps = (
        (plan["pid"] == plan["win_pid"])
        & (plan["warc_ts"] == plan["win_ts"])
        & (plan["content_hash"] == plan["win_ch"])
    )
    plan["drops"] = plan["n"] - keeps.astype(int)
    return plan


def _rewrite_partition(
    manifest: RunManifest, pid: int, row: dict, win_df, local_collapse: bool
) -> dict:
    """Filter one committed partition to its global winners and
    atomically republish (data-before-manifest, same lineage)."""
    import pandas as pd

    part_files = sorted(glob.glob(os.path.join(manifest.partition_dir(pid), "*.parquet")))
    win_ref = ray.put(win_df)
    t0 = time.monotonic()

    def _filter(t: pa.Table) -> pa.Table:
        win = ray.get(win_ref)
        df = pd.DataFrame(
            {
                "url": t["url"].to_pandas(),
                "ts": t["warc_ts"].to_pandas().astype("datetime64[us]"),
                "ch": t["content_hash"].to_pandas(),
            }
        )
        m = df.merge(win, on="url", how="left")
        is_dup = m["win_pid"].notna()
        keep = ~is_dup | (
            (m["ts"] == m["win_ts"].astype("datetime64[us]"))
            & (m["ch"] == m["win_ch"])
            & (m["win_pid"] == pid)
        )
        return t.filter(pa.array(keep.to_numpy()))

    ds = ray.data.read_parquet(part_files).map_batches(_filter, batch_format="pyarrow")
    if local_collapse:
        # identical winning triples WITHIN this partition (possible only
        # for dedup=False partition runs): collapse with the bucketed
        # exact dedup — rare, so the shuffle runs on demand only
        ds = dedup_latest(ds)
    tmp = os.path.join(manifest.out_dir, f"_tmp-part-{pid:05d}")
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
        row["input_files"],
        rows=rows,
        data_bytes=data_bytes,
        wall_s=time.monotonic() - t0,
        extra={"global_dedup": True},
    )
    return {"pid": pid, "rows": rows}


def global_dedup_pass(out_dir: str, *, plan_ranges: int = 1) -> dict:
    """Phase 2 of the two-phase global dedup (VERDICT r1 #3): make
    per-url dedup exact ACROSS partitions.

    ``run_partitioned_extraction`` dedups within each partition; a url
    recaptured in files that landed in different partitions survives
    once per partition. This pass plans winners over the (html-free)
    extracted table with a skinny duplicate-bounded scan
    (``plan_global_winners``, optionally url-hash-range-scoped) and
    rewrites ONLY the partitions that contain losing rows — untouched
    partitions keep their bytes and manifest rows. Idempotent: a second
    run plans zero drops.
    """
    manifest = RunManifest(out_dir)
    done = manifest.completed()
    part_files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    summary = {"planned_duplicate_urls": 0, "rewritten_partitions": 0, "dropped_rows": 0}
    if not part_files:
        return summary

    import pandas as pd

    if plan_ranges > 1:
        plan = pd.concat(
            [plan_global_winners(part_files, url_range=(r, plan_ranges)) for r in range(plan_ranges)],
            ignore_index=True,
        )
    else:
        plan = plan_global_winners(part_files)
    if plan.empty:
        return summary

    summary["planned_duplicate_urls"] = int(plan["url"].nunique())
    affected = sorted(plan.loc[plan["drops"] > 0, "pid"].unique())
    win = plan.drop_duplicates("url")[["url", "win_ts", "win_ch", "win_pid"]]
    for pid in affected:
        pid = int(pid)
        sub = plan[plan["pid"] == pid]
        local_collapse = bool(
            ((sub["pid"] == sub["win_pid"]) & (sub["n_at_best"] > 1)).any()
        )
        _rewrite_partition(manifest, pid, done[pid], win, local_collapse)
    summary["rewritten_partitions"] = len(affected)
    summary["dropped_rows"] = int(plan["drops"].sum())
    return summary


def incremental_pass(
    input_dir: str,
    out_dir: str,
    *,
    files_per_partition: int = 4,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 512,
    url_index=None,
    plan_ranges: int | None = None,
) -> dict:
    """One incremental scan: process input files not yet covered by any
    committed partition (the reference's daemon-pass semantics,
    frame_pipeline.py:455-509, at file granularity).

    New files are grouped into fresh partition ids appended after the
    existing ones, so earlier partitions are never invalidated as the
    input directory grows — late-arriving data is at-least-once
    ingested on the next scan, failed partitions retry (they were never
    committed), and the output dir remains one coherent partitioned
    dataset.

    ``url_index`` (a ``state.url_index.UrlIndex``) enables CROSS-PASS
    url dedup: captures of urls already committed by earlier
    partitions/passes are dropped at the read (first-seen-wins ingest).
    The index mutates only AFTER each partition's manifest commit, so a
    crash re-processes the in-flight partition without losing urls;
    snapshots live in ``<out>/_url_index`` and can always be rebuilt
    exactly from committed partitions.
    """
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    manifest = RunManifest(out_dir)
    done = manifest.completed()
    seen = {f for row in done.values() for f in row.get("input_files", [])}
    new_files = [f for f in files if f not in seen]
    next_pid = max(done, default=-1) + 1
    ran = 0

    prefilter = None
    if url_index is not None:
        from ..functions.hashing import stable_hash64_array

        def prefilter(t: pa.Table) -> pa.Table:  # noqa: F811
            hashes = stable_hash64_array(t["url"].to_pylist())
            return t.filter(pa.array(url_index.check_new(hashes)))

    for i in range(0, len(new_files), files_per_partition):
        chunk = new_files[i : i + files_per_partition]
        pid = next_pid + ran
        _run_one_partition(
            manifest,
            pid,
            chunk,
            out_dir,
            dedup=dedup,
            concurrency=concurrency,
            batch_size=batch_size,
            prefilter=prefilter,
            plan_ranges=plan_ranges,
        )
        if url_index is not None:
            # commit-then-mark: read back the committed partition's
            # url hashes, add to the index, snapshot
            part_files = sorted(
                glob.glob(os.path.join(out_dir, f"part={pid:05d}", "*.parquet"))
            )
            for f in part_files:
                col = pa.parquet.read_table(f, columns=["url_hash"])["url_hash"]
                url_index.add(col.to_numpy(zero_copy_only=False))
            url_index.mark_covered(pid)
            url_index.save(os.path.join(out_dir, "_url_index"))
        ran += 1
    summary = manifest.metrics()
    summary["new_files"] = len(new_files)
    summary["ran_partitions"] = ran
    return summary


def run_daemon(
    input_dir: str,
    out_dir: str,
    *,
    interval_s: float = 300.0,
    max_passes: int | None = None,
    **kwargs,
) -> list[dict]:
    """Daemon mode: rescan ``input_dir`` every ``interval_s`` seconds and
    ingest whatever appeared (frame_pipeline.py:437-509 graft). With
    ``max_passes=None`` runs until interrupted."""
    results: list[dict] = []
    passes = 0
    while max_passes is None or passes < max_passes:
        results.append(incremental_pass(input_dir, out_dir, **kwargs))
        passes += 1
        if max_passes is not None and passes >= max_passes:
            break
        time.sleep(interval_s)
    return results


def read_extracted(out_dir: str) -> ray.data.Dataset:
    """Read a completed partitioned run back as one Dataset."""
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return ray.data.read_parquet(files)


def repartition_by_url_hash(
    ds: ray.data.Dataset,
    n_buckets: int = DEFAULT_DEDUP_BUCKETS,
    url_col: str = "url",
) -> ray.data.Dataset:
    """Explicit url-hash co-location: every row of a url lands in the
    block of its bucket ``stable_hash64(url) % n_buckets``.

    Use before any per-url stage that assumes co-located keys (merging
    with another url-keyed table, per-url incremental state). Pick ONE
    bucket count and reuse it across stages so consecutive keyed
    operations share the partitioning (SURVEY.md §4). Implemented as
    the bucket groupby — the only key-partitioning primitive Ray Data
    exposes — with a pass-through group fn.
    """
    from ..functions.hashing import stable_hash64_array

    def _bucket(t: pa.Table) -> pa.Table:
        if "url_hash" in t.column_names:
            h = t["url_hash"]
        else:
            h = pa.array(stable_hash64_array(t[url_col].to_pylist()))
        b = (
            pc.bit_wise_and(h, pa.scalar(n_buckets - 1, pa.uint64()))
            if (n_buckets & (n_buckets - 1)) == 0
            else pc.subtract(h, pc.multiply(pc.divide(h, pa.scalar(n_buckets, pa.uint64())), pa.scalar(n_buckets, pa.uint64())))
        )
        return t.append_column("url_bucket", pc.cast(b, pa.int64()))

    def _identity(t: pa.Table) -> pa.Table:
        return t

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("url_bucket")
        .map_groups(_identity, batch_format="pyarrow")
    )
