"""End-to-end flagship tests: Ray pipeline == single-process oracle,
byte-identical at two parallelism configurations (SURVEY.md §5 b/d)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_dataset_builder_ray.functions.textnorm import STATUS_EMPTY_HTML, STATUS_OK
from ocr_dataset_builder_ray.pipelines.extraction import (
    dedup_latest,
    extraction_pipeline,
)
from ocr_dataset_builder_ray.sources.pages import pages_parquet_files
from ocr_dataset_builder_ray.stages.extract import extract_table


def _oracle_extract(corpus_dir: str) -> dict[str, dict]:
    """Single-process oracle: same kernel, sequential, then per-url
    latest-capture dedup — the ground truth the Ray DAG must match."""
    tables = [pq.read_table(f) for f in pages_parquet_files(corpus_dir)]
    table = pa.concat_tables(tables)
    out = extract_table(table)
    best: dict[str, dict] = {}
    for row in out.to_pylist():
        cur = best.get(row["url"])
        key = (row["warc_ts"], row["content_hash"])
        if cur is None or key > (cur["warc_ts"], cur["content_hash"]):
            best[row["url"]] = row
    return best


def _run_pipeline(corpus_dir: str, **kw) -> dict[str, dict]:
    ds = extraction_pipeline(pages_parquet_files(corpus_dir), **kw)
    return {r["url"]: r for r in ds.take_all()}


@pytest.fixture(scope="module")
def oracle(pages_corpus):
    return _oracle_extract(pages_corpus)


def test_pipeline_matches_oracle_byte_identical(ray_session, pages_corpus, oracle):
    got = _run_pipeline(pages_corpus)
    assert set(got) == set(oracle)
    for url, row in oracle.items():
        g = got[url]
        assert g["extracted_text"] == row["extracted_text"], url  # byte-identical
        assert g["status"] == row["status"]
        assert g["spans"] == row["spans"]
        assert g["content_hash"] == row["content_hash"]
        assert g["warc_ts"] == row["warc_ts"]


def test_pipeline_deterministic_across_parallelism(ray_session, pages_corpus):
    a = _run_pipeline(pages_corpus, batch_size=8, concurrency=1, size_split=False)
    b = _run_pipeline(pages_corpus, batch_size=64, concurrency=4, size_split=True)
    assert set(a) == set(b)
    for url in a:
        assert a[url]["extracted_text"] == b[url]["extracted_text"]
        assert a[url]["spans"] == b[url]["spans"]
        assert a[url]["content_hash"] == b[url]["content_hash"]


def test_failure_rows_present_not_dropped(ray_session, pages_corpus):
    got = _run_pipeline(pages_corpus)
    statuses = {r["status"] for r in got.values()}
    assert STATUS_OK in statuses
    assert STATUS_EMPTY_HTML in statuses  # row 1 (empty html) survived as a row


def test_dedup_keeps_latest_capture(ray_session, pages_corpus, oracle):
    got = _run_pipeline(pages_corpus)
    # rows 6/7/8 share one url; the winner must be the latest warc_ts (row 8,
    # the appended revision) and its text must extend row 6's.
    dups = [u for u in got if "/p/000006" in u]
    assert len(dups) == 1
    row = got[dups[0]]
    assert row["warc_ts"] == oracle[dups[0]]["warc_ts"]
    assert row["n_spans"] >= 1


def test_spans_sorted_and_consistent(ray_session, pages_corpus):
    got = _run_pipeline(pages_corpus)
    for url, row in got.items():
        spans = row["spans"]
        starts = [s["start"] for s in spans]
        assert starts == sorted(starts), url
        if spans:
            assert spans[-1]["end"] == row["n_chars"]
        assert row["n_spans"] == len(spans)
        assert row["n_chars"] == len(row["extracted_text"])


def test_no_dedup_mode_keeps_all_captures(ray_session, pages_corpus):
    ds = extraction_pipeline(
        pages_parquet_files(pages_corpus), dedup=False, size_split=False
    )
    n = ds.count()
    assert n == 200  # every input row emitted exactly once


def test_probe_oversized_footer_detection(tmp_path, pages_corpus):
    """The footer-only probe flips on exactly when a row group proves a
    blob over the threshold exists (avg bytes/row > threshold => max >
    threshold), with no data I/O and no false positive on the uniform
    corpus."""
    from ocr_dataset_builder_ray.pipelines.extraction import probe_oversized

    assert probe_oversized(pages_corpus) is False

    big = b"<html><body>" + b"x" * (400 * 1024) + b"</body></html>"
    t = pa.table(
        {
            "url": ["https://heavy.example/a"],
            "warc_ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "html": [big],
            "text": [""],
            "lang": ["en"],
        }
    )
    heavy = tmp_path / "heavy.parquet"
    pq.write_table(t, str(heavy))
    assert probe_oversized(str(heavy)) is True
    files = pages_parquet_files(pages_corpus) + [str(heavy)]
    assert probe_oversized(files) is True


def test_auto_size_split_output_identical(ray_session, tmp_path, pages_corpus):
    """size_split='auto' (the default) must produce byte-identical rows
    whether the probe enables the split (heavy corpus) or not, and must
    match the forced-off run."""
    big_body = b"<p>heavy paragraph</p>" * (30 * 1024)
    t = pa.table(
        {
            "url": ["https://heavy.example/giant/0"],
            "warc_ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "html": [b"<html><body>" + big_body + b"</body></html>"],
            "text": [""],
            "lang": ["en"],
        }
    )
    heavy = tmp_path / "heavy.parquet"
    pq.write_table(t, str(heavy))
    files = pages_parquet_files(pages_corpus) + [str(heavy)]

    from ocr_dataset_builder_ray.pipelines.extraction import probe_oversized

    assert probe_oversized(files) is True  # auto takes the split path here

    auto = {r["url"]: r for r in extraction_pipeline(files).take_all()}
    off = {
        r["url"]: r
        for r in extraction_pipeline(files, size_split=False).take_all()
    }
    assert set(auto) == set(off)
    for url in auto:
        assert auto[url]["extracted_text"] == off[url]["extracted_text"]
        assert auto[url]["content_hash"] == off[url]["content_hash"]
    assert "https://heavy.example/giant/0" in auto
