"""Seen-url index tests: sharded membership actors, commit-then-mark
ordering, cross-pass incremental dedup, rebuild-from-run recovery."""

import os

import numpy as np
import pyarrow.parquet as pq

from ocr_dataset_builder_ray.functions.hashing import stable_hash64_array
from ocr_dataset_builder_ray.pipelines.extraction import (
    incremental_pass,
    read_extracted,
)
from ocr_dataset_builder_ray.sources.pages import gen_table
from ocr_dataset_builder_ray.state.url_index import UrlIndex


def test_check_add_roundtrip(ray_session):
    idx = UrlIndex(n_shards=4)
    h = stable_hash64_array([f"u{i}" for i in range(100)])
    assert idx.check_new(h).all()  # read-only: nothing marked
    assert idx.check_new(h).all()
    idx.add(h[:50])
    mask = idx.check_new(h)
    assert not mask[:50].any() and mask[50:].all()


def test_save_load_snapshot(ray_session, tmp_path):
    idx = UrlIndex(n_shards=2)
    h = stable_hash64_array([f"s{i}" for i in range(64)])
    idx.add(h)
    idx.save(str(tmp_path / "ix"))
    fresh = UrlIndex(n_shards=2)
    assert fresh.load(str(tmp_path / "ix"))
    assert not fresh.check_new(h).any()


def _write_shard(dir_, name, start, n):
    os.makedirs(dir_, exist_ok=True)
    pq.write_table(gen_table(n, start=start), os.path.join(dir_, name))


def test_cross_pass_url_dedup(ray_session, tmp_path):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 40)
    idx = UrlIndex(n_shards=4)
    incremental_pass(inp, out, files_per_partition=1, url_index=idx)

    # a later file recaptures rows 20-39 (same urls, later would-be
    # captures) plus genuinely new rows 40-59
    t_old = gen_table(20, start=20)
    t_new = gen_table(20, start=40)
    import pyarrow as pa

    pq.write_table(pa.concat_tables([t_old, t_new]), os.path.join(inp, "b.parquet"))
    s = incremental_pass(inp, out, files_per_partition=1, url_index=idx)
    assert s["ran_partitions"] == 1

    df = read_extracted(out).select_columns(["url"]).to_pandas()
    # without the index rows 20-39 would appear twice (different parts)
    assert df["url"].is_unique
    # 40 first-pass urls (rows 6/7/8 collapse to one) + 20 new = 58
    assert len(df) == 58


def test_load_shard_count_mismatch(ray_session, tmp_path):
    """A snapshot written with a different n_shards must replay through
    add() (correct routing) instead of filename-index loading, which
    would drop or misroute hashes."""
    idx = UrlIndex(n_shards=8)
    h = stable_hash64_array([f"m{i}" for i in range(200)])
    idx.add(h)
    idx.save(str(tmp_path / "ix"))

    for n in (3, 4, 12):
        fresh = UrlIndex(n_shards=n)
        assert fresh.load(str(tmp_path / "ix"))
        assert not fresh.check_new(h).any(), f"n_shards={n} lost members"


def test_resume_reconciles_stale_snapshot(ray_session, tmp_path):
    """Crash between a partition's manifest commit and the index
    add/save: the snapshot is BEHIND the manifests. resume_from_run
    must top up the committed-but-uncovered partition so recaptures of
    its urls are still rejected (first-seen-wins)."""
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 30)
    idx = UrlIndex(n_shards=2)
    incremental_pass(inp, out, files_per_partition=1, url_index=idx)
    # snapshot now covers partition 0

    # partition 1 commits WITHOUT the index being updated (the crash):
    # run the pass without an index, so manifests advance past the
    # snapshot
    _write_shard(inp, "b.parquet", 30, 20)
    incremental_pass(inp, out, files_per_partition=1, url_index=None)

    fresh = UrlIndex(n_shards=2)
    replayed = fresh.resume_from_run(out)
    assert replayed == 1  # exactly the uncovered partition
    # urls from BOTH partitions are now members
    h_old = stable_hash64_array(
        read_extracted(out).select_columns(["url"]).to_pandas()["url"].tolist()
    )
    assert not fresh.check_new(h_old).any()
    # the refreshed snapshot now covers both partitions — a further
    # resume replays nothing
    again = UrlIndex(n_shards=2)
    assert again.resume_from_run(out) == 0


def test_rebuild_from_run_recovers_lost_snapshot(ray_session, tmp_path):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    _write_shard(inp, "a.parquet", 0, 30)
    incremental_pass(inp, out, files_per_partition=1, url_index=UrlIndex(n_shards=2))

    # snapshot destroyed (crash between commit and save) -> exact
    # rebuild from the committed partitions
    fresh = UrlIndex(n_shards=2)
    n = fresh.rebuild_from_run(out)
    assert n == 28  # 30 rows minus the 6/7/8 url collapse
    hashes = pq.read_table(
        sorted(
            os.path.join(out, d, f)
            for d in os.listdir(out)
            if d.startswith("part=")
            for f in os.listdir(os.path.join(out, d))
        )[0],
        columns=["url_hash"],
    )["url_hash"].to_numpy(zero_copy_only=False)
    assert not fresh.check_new(hashes).any()
