"""Incremental/daemon ingestion tests (SURVEY.md §2.10: late data is
picked up on the next scan; committed partitions never reprocessed)."""

import os
import shutil

import pyarrow.parquet as pq

from ocr_dataset_builder_ray.pipelines.extraction import (
    incremental_pass,
    read_extracted,
    run_daemon,
)
from ocr_dataset_builder_ray.sources.pages import gen_table


def _write_shard(dir_, name, start, n):
    os.makedirs(dir_, exist_ok=True)
    pq.write_table(gen_table(n, start=start), os.path.join(dir_, name))


def test_incremental_picks_up_new_files(ray_session, tmp_path):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 50)
    _write_shard(inp, "b.parquet", 50, 50)

    s1 = incremental_pass(inp, out, files_per_partition=1)
    assert s1["new_files"] == 2 and s1["ran_partitions"] == 2

    # nothing new -> no work
    s2 = incremental_pass(inp, out, files_per_partition=1)
    assert s2["new_files"] == 0 and s2["ran_partitions"] == 0

    # late-arriving shard -> exactly one new partition, old ones untouched
    _write_shard(inp, "c.parquet", 100, 50)
    s3 = incremental_pass(inp, out, files_per_partition=1)
    assert s3["new_files"] == 1 and s3["ran_partitions"] == 1
    assert s3["partitions"] == 3

    ds = read_extracted(out)
    assert ds.count() == 148  # 150 minus rows 6/7/8 sharing one url


def test_daemon_mode_bounded_passes(ray_session, tmp_path):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 30)
    results = run_daemon(inp, out, interval_s=0.01, max_passes=2, files_per_partition=1)
    assert len(results) == 2
    assert results[0]["ran_partitions"] == 1
    assert results[1]["ran_partitions"] == 0  # second scan found nothing new


def test_failed_partition_retried_next_pass(ray_session, tmp_path):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 30)
    incremental_pass(inp, out, files_per_partition=1)
    # simulate a torn partition: data dir gone but manifest row present
    part_dirs = [d for d in os.listdir(out) if d.startswith("part=")]
    assert part_dirs
    shutil.rmtree(os.path.join(out, part_dirs[0]))
    manifest_rows = os.listdir(os.path.join(out, "_manifest"))
    os.remove(os.path.join(out, "_manifest", sorted(manifest_rows)[0]))
    s = incremental_pass(inp, out, files_per_partition=1)
    assert s["ran_partitions"] == 1  # the file was re-ingested
    assert read_extracted(out).count() == 28
