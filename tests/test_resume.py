"""Kill/resume tests for the partitioned run (FIXTURES.md §4)."""

import os

import pytest

from ocr_dataset_builder_ray.pipelines.extraction import (
    read_extracted,
    run_partitioned_extraction,
)
from ocr_dataset_builder_ray.state.manifest import (
    RunManifest,
    input_fingerprint,
    shard_files,
)


class _KillAfter(Exception):
    pass


def _sorted_rows(out_dir):
    ds = read_extracted(out_dir)
    rows = ds.select_columns(["url", "extracted_text", "content_hash"]).take_all()
    return sorted((r["url"], r["extracted_text"], r["content_hash"]) for r in rows)


def test_shard_files_deterministic(pages_corpus):
    from ocr_dataset_builder_ray.sources.pages import pages_parquet_files

    files = pages_parquet_files(pages_corpus)
    a = shard_files(files, 4)
    b = shard_files(list(reversed(files)), 4)
    assert a == b
    assert sum(len(v) for v in a.values()) == len(files)


def test_kill_after_3_resume_runs_remaining_5(ray_session, pages_corpus, tmp_path):
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")

    done: list[int] = []

    def killer(pid):
        done.append(pid)
        if len(done) == 3:
            raise _KillAfter(pid)

    with pytest.raises(_KillAfter):
        run_partitioned_extraction(
            pages_corpus, out_a, num_partitions=8, on_partition_done=killer
        )
    assert len(RunManifest(out_a).completed()) == 3

    # restart: must plan exactly the 5 missing partitions, not reprocess done ones
    summary = run_partitioned_extraction(pages_corpus, out_a, num_partitions=8)
    assert summary["ran_partitions"] == 5
    assert summary["skipped_partitions"] == 3
    assert summary["partitions"] == 8

    # and the final output equals an uninterrupted run, byte-for-byte
    run_partitioned_extraction(pages_corpus, out_b, num_partitions=8)
    assert _sorted_rows(out_a) == _sorted_rows(out_b)


def test_concurrent_partitions_match_sequential(ray_session, pages_corpus, tmp_path):
    seq = str(tmp_path / "seq")
    con = str(tmp_path / "con")
    s1 = run_partitioned_extraction(pages_corpus, seq, num_partitions=6)
    s2 = run_partitioned_extraction(
        pages_corpus, con, num_partitions=6, max_concurrent_partitions=3
    )
    assert s1["ran_partitions"] == s2["ran_partitions"] == 6
    assert _sorted_rows(seq) == _sorted_rows(con)
    # the concurrent run's manifest is complete and a rerun is a no-op
    s3 = run_partitioned_extraction(
        pages_corpus, con, num_partitions=6, max_concurrent_partitions=3
    )
    assert s3["ran_partitions"] == 0 and s3["skipped_partitions"] == 6


def test_concurrent_failure_keeps_completed_partitions(
    ray_session, pages_corpus, tmp_path
):
    out = str(tmp_path / "failing")
    done: list[int] = []

    def killer(pid):
        done.append(pid)
        if len(done) == 2:
            raise _KillAfter(pid)

    with pytest.raises(_KillAfter):
        run_partitioned_extraction(
            pages_corpus,
            out,
            num_partitions=6,
            max_concurrent_partitions=2,
            on_partition_done=killer,
        )
    committed = len(RunManifest(out).completed())
    assert committed >= 2  # everything that finished stayed committed
    s = run_partitioned_extraction(pages_corpus, out, num_partitions=6)
    assert s["ran_partitions"] == 6 - committed
    ref = str(tmp_path / "ref")
    run_partitioned_extraction(pages_corpus, ref, num_partitions=6)
    assert _sorted_rows(out) == _sorted_rows(ref)


def test_noop_rerun_skips_everything(ray_session, pages_corpus, tmp_path):
    out = str(tmp_path / "run")
    s1 = run_partitioned_extraction(pages_corpus, out, num_partitions=4)
    assert s1["ran_partitions"] == 4
    s2 = run_partitioned_extraction(pages_corpus, out, num_partitions=4)
    assert s2["ran_partitions"] == 0 and s2["skipped_partitions"] == 4


def test_changed_input_invalidates_manifest_row(ray_session, pages_corpus, tmp_path):
    out = str(tmp_path / "run")
    run_partitioned_extraction(pages_corpus, out, num_partitions=4)
    manifest = RunManifest(out)
    row = manifest.completed()[0]
    # simulate an input change by rewriting the stored fingerprint
    row["input_fingerprint"] = "stale"
    import json

    with open(os.path.join(manifest.manifest_dir, "part-00000.json"), "w") as f:
        json.dump(row, f)
    s = run_partitioned_extraction(pages_corpus, out, num_partitions=4)
    assert s["ran_partitions"] == 1  # only the invalidated partition re-ran


def test_fingerprint_sensitive_to_size_and_path(tmp_path):
    f1 = tmp_path / "a.parquet"
    f1.write_bytes(b"xx")
    fp1 = input_fingerprint([str(f1)])
    f1.write_bytes(b"xxx")
    assert input_fingerprint([str(f1)]) != fp1
    f2 = tmp_path / "b.parquet"
    f2.write_bytes(b"xxx")
    assert input_fingerprint([str(f2)]) != input_fingerprint([str(f1)])


def test_manifest_metrics_lineage(ray_session, pages_corpus, tmp_path):
    out = str(tmp_path / "run")
    run_partitioned_extraction(pages_corpus, out, num_partitions=4)
    m = RunManifest(out).metrics()
    assert m["partitions"] == 4
    # 200 input rows; rows 6/7/8 share one url and sit in the same input
    # file, so per-partition dedup collapses them to one row: 198 urls.
    assert m["rows"] == 198
    assert m["bytes"] > 0 and m["wall_s"] >= 0
