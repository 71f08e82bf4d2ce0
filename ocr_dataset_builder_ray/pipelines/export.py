"""Export projections (K6): JSONL/Parquet sinks with named output modes.

Graft of the reference's ``extract_text_dataset.py`` exporter
(data/extract_text_dataset.py:92-132) with its two projection modes:

* ``standard``       — one record per document with the extracted text
                       and metadata (≙ per-frame record export);
* ``cleaning_pairs`` — (noisy, clean) training pairs: the raw
                       pre-extracted ``text`` column against the
                       pipeline's ``extracted_text``
                       (≙ task1_raw vs task3_cleaned pairs).

Projections are a registry (SURVEY.md §2.11 extension surface); users
add modes by registering a ``Dataset -> Dataset`` function.
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data


def _standard(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.select_columns(
        ["url", "warc_ts", "lang", "extracted_text", "status", "n_chars", "n_spans"]
    )


def _cleaning_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    # requires the joined view that still carries the raw `text` column
    cols = ds.schema().names
    noisy_col = "text" if "text" in cols else "extracted_text"

    def _project(batch):
        out = batch.select([c for c in ("url", noisy_col, "extracted_text") if c in cols])
        return out.rename_columns(["url", "noisy_text", "clean_text"])

    return ds.map_batches(_project, batch_format="pyarrow")


EXPORT_MODES: dict[str, Callable[[ray.data.Dataset], ray.data.Dataset]] = {
    "standard": _standard,
    "cleaning_pairs": _cleaning_pairs,
}


def register_export_mode(
    name: str, fn: Callable[[ray.data.Dataset], ray.data.Dataset]
) -> None:
    EXPORT_MODES[name] = fn


def export_dataset(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    mode: str = "standard",
    fmt: str = "jsonl",
) -> None:
    """Project and write. ``fmt``: jsonl (one object per line) | parquet."""
    projected = EXPORT_MODES[mode](ds)
    if fmt == "jsonl":
        projected.write_json(out_dir)
    elif fmt == "parquet":
        projected.write_parquet(out_dir)
    else:
        raise ValueError(f"unknown export format {fmt!r}")
