"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library calls below.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001-scale synthetic pages.

    Runs the full extraction DAG (read → map_batches(ExtractPages) →
    groupby(url) dedup) on the deterministic 500-row pages corpus and
    returns the extracted table (url, lang, extracted_text, spans,
    status, metrics columns) as a pandas DataFrame.
    """
    from ocr_dataset_builder_ray.pipelines.extraction import extraction_pipeline
    from ocr_dataset_builder_ray.sources.pages import (
        default_corpus_dir,
        generate_pages_corpus,
        pages_parquet_files,
    )

    corpus = generate_pages_corpus(default_corpus_dir(500), n_rows=500)
    ds = extraction_pipeline(pages_parquet_files(corpus))
    return ds.select_columns(
        ["url", "warc_ts", "lang", "extracted_text", "status", "n_chars", "n_spans"]
    ).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ocr_dataset_builder_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-checkable oracle for EVERY registered query: genuine SQL
    where expressible, committed-golden parquet (read_parquet) pins for
    the deterministic non-SQL operators (see pipelines/queries.py
    GOLDEN_SF01_ORACLES — generated at the driver gate's sf0.01)."""
    from ocr_dataset_builder_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
