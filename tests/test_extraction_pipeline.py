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
