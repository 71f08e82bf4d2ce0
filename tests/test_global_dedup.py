"""Two-phase global dedup (cross-partition exact per-url dedup),
range-scoped winner planning, and partition-range work slicing."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_dataset_builder_ray.pipelines.extraction import (
    global_dedup_pass,
    plan_dedup_winners,
    plan_dedup_winners_ranged,
    plan_global_winners,
    read_extracted,
    run_partitioned_extraction,
)
from ocr_dataset_builder_ray.sources.pages import gen_table


def _shift_ts(t: pa.Table, seconds: int) -> pa.Table:
    import pyarrow.compute as pc

    ts = pc.add(t["warc_ts"], pa.scalar(seconds * 1_000_000, pa.duration("us")))
    return t.set_column(t.schema.get_field_index("warc_ts"), "warc_ts", ts)


@pytest.fixture()
def cross_partition_corpus(tmp_path):
    """File A: rows 0-29. File B: LATER recaptures of rows 10-19's urls.
    With 2 round-robin partitions the recaptures land in a different
    partition than the originals."""
    inp = str(tmp_path / "inp")
    os.makedirs(inp)
    pq.write_table(gen_table(30, start=0), os.path.join(inp, "a.parquet"))
    recap = _shift_ts(gen_table(10, start=10), 3600)
    pq.write_table(recap, os.path.join(inp, "b.parquet"))
    return inp


def _url_ts(out_dir):
    df = (
        read_extracted(out_dir)
        .select_columns(["url", "warc_ts", "content_hash"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    return df


def test_global_dedup_cross_partition(ray_session, tmp_path, cross_partition_corpus):
    out = str(tmp_path / "out")
    s = run_partitioned_extraction(
        cross_partition_corpus, out, num_partitions=2, global_dedup=True
    )
    df = _url_ts(out)
    # 28 unique urls (rows 6/7/8 share one); recaptured urls keep the
    # LATER capture only
    assert df["url"].is_unique
    assert len(df) == 28
    assert s["global_dedup"]["rewritten_partitions"] >= 1
    assert s["global_dedup"]["dropped_rows"] >= 10

    # byte-identical to a single-partition (globally-scoped) run
    ref_out = str(tmp_path / "ref")
    run_partitioned_extraction(cross_partition_corpus, ref_out, num_partitions=1)
    ref = _url_ts(ref_out)
    assert df.equals(ref)


def test_global_dedup_idempotent(ray_session, tmp_path, cross_partition_corpus):
    out = str(tmp_path / "out")
    run_partitioned_extraction(
        cross_partition_corpus, out, num_partitions=2, global_dedup=True
    )
    before = _url_ts(out)
    s2 = global_dedup_pass(out)
    assert s2["rewritten_partitions"] == 0 and s2["dropped_rows"] == 0
    assert _url_ts(out).equals(before)


def test_global_dedup_identical_twins(ray_session, tmp_path):
    """Same url, same ts, same content committed by two partitions
    (dedup=False run): exactly one row survives (lowest partition id)."""
    inp = str(tmp_path / "inp")
    os.makedirs(inp)
    rows = gen_table(10, start=100)
    pq.write_table(rows, os.path.join(inp, "a.parquet"))
    pq.write_table(rows, os.path.join(inp, "b.parquet"))  # exact twin file
    out = str(tmp_path / "out")
    run_partitioned_extraction(inp, out, num_partitions=2, dedup=False)
    assert len(_url_ts(out)) == 20  # both partitions committed everything
    s = global_dedup_pass(out)
    df = _url_ts(out)
    assert df["url"].is_unique and len(df) == 10
    assert s["dropped_rows"] == 10


def test_plan_ranges_equal_global(ray_session, tmp_path):
    """>256 input files: the distributed planning path with url-hash
    range scoping returns exactly the global plan (ranges partition the
    url space)."""
    from ocr_dataset_builder_ray.sources.pages import generate_pages_corpus

    corpus = generate_pages_corpus(str(tmp_path / "many"), n_rows=600, rows_per_file=2)
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    assert len(files) == 300  # forces the distributed combiner path
    d0, w0, a0 = plan_dedup_winners(files)
    d4, w4, a4 = plan_dedup_winners_ranged(files, 4)
    assert sorted(d0.to_pylist()) == sorted(d4.to_pylist())
    assert sorted(w0.to_pylist()) == sorted(w4.to_pylist())
    assert set(a0) == set(a4)
    assert len(d0) > 0  # rows 6/7/8 recapture is in there


def test_plan_global_winners_range_scoped(ray_session, tmp_path, cross_partition_corpus):
    out = str(tmp_path / "out")
    run_partitioned_extraction(cross_partition_corpus, out, num_partitions=2)
    part_files = sorted(glob.glob(os.path.join(out, "part=*", "*.parquet")))
    import pandas as pd

    full = plan_global_winners(part_files).sort_values(["url", "pid"]).reset_index(drop=True)
    ranged = (
        pd.concat(
            [plan_global_winners(part_files, url_range=(r, 3)) for r in range(3)],
            ignore_index=True,
        )
        .sort_values(["url", "pid"])
        .reset_index(drop=True)
    )
    assert full.equals(ranged)
    assert len(full) > 0


def test_ranged_planning_through_partitioned_run(ray_session, tmp_path, cross_partition_corpus):
    """plan_ranges + global_dedup composed through the runner equals the
    unranged run byte-for-byte."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    run_partitioned_extraction(
        cross_partition_corpus, out_a, num_partitions=2, global_dedup=True
    )
    run_partitioned_extraction(
        cross_partition_corpus,
        out_b,
        num_partitions=2,
        global_dedup=True,
        plan_ranges=3,
    )
    assert _url_ts(out_a).equals(_url_ts(out_b))


def test_partition_range_slicing(ray_session, tmp_path, cross_partition_corpus):
    """Manual multi-driver sharding: disjoint partition ranges against
    one out dir compose into a complete, resumable run."""
    out = str(tmp_path / "out")
    s1 = run_partitioned_extraction(
        cross_partition_corpus, out, num_partitions=2, partition_range=(0, 1)
    )
    assert s1["ran_partitions"] == 1 and s1["partitions"] == 1
    s2 = run_partitioned_extraction(
        cross_partition_corpus, out, num_partitions=2, partition_range=(1, 2)
    )
    assert s2["ran_partitions"] == 1 and s2["partitions"] == 2
    s3 = run_partitioned_extraction(cross_partition_corpus, out, num_partitions=2)
    assert s3["ran_partitions"] == 0
