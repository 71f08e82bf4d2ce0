"""Format on-ramps: JSONL / CSV / parquet → the documents shape.

The engine's whole dedup/curation/retrieval family operates on one
canonical table, ``documents(doc_id int64, text string, lang string,
source string, n_chars int64)`` (TESTDATA.md; the same shape
``warc_text_documents`` produces from WET archives). This module
normalizes the three bulk text-interchange formats users actually have
into that shape with a streaming Dataset pipeline — Ray's native
readers do the distributed IO (one read task per file / block), the
normalization is a vectorized pure map, and the write is partitioned
parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["read_any", "normalize_documents"]

_EXT_READERS = {
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".tsv": "csv",
    ".parquet": "parquet",
}


def read_any(path: str | list[str], fmt: str | None = None) -> ray.data.Dataset:
    """Dispatch to the matching native Ray reader by extension
    (``fmt`` overrides: ``json`` / ``csv`` / ``parquet``)."""
    import os

    if fmt is None:
        probe = path[0] if isinstance(path, list) else path
        if os.path.isdir(probe):
            names = os.listdir(probe)
            exts = {os.path.splitext(n)[1].lower() for n in names} & set(
                _EXT_READERS
            )
            if len(exts) != 1:
                raise ValueError(
                    f"cannot infer format from {sorted(exts)} in {probe}; pass fmt="
                )
            fmt = _EXT_READERS[exts.pop()]
        else:
            ext = os.path.splitext(probe)[1].lower()
            if ext not in _EXT_READERS:
                raise ValueError(f"unknown extension {ext!r}; pass fmt=")
            fmt = _EXT_READERS[ext]
    if fmt == "json":
        return ray.data.read_json(path)
    if fmt == "csv":
        return ray.data.read_csv(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path)
    raise ValueError(f"fmt must be json/csv/parquet, got {fmt!r}")


def normalize_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    key_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    min_chars: int = 1,
) -> ray.data.Dataset:
    """Any table with a text column → the canonical documents shape.

    ``doc_id``: an integer ``key_col`` passes through as int64; a
    string ``key_col`` (url, uuid, ...) becomes its stable 64-bit hash
    (blake2b-8 reinterpreted — deterministic across runs and
    parallelism, the ``warc_text_documents`` convention). ``key_col``
    is REQUIRED because every downstream operator keys on ``doc_id``
    and a row ordinal would not survive repartitioning.

    Rows with null / shorter-than-``min_chars`` text are dropped.
    Vectorized pure map — no shuffle, no driver state.
    """
    if key_col is None:
        raise ValueError(
            "normalize_documents requires key_col (doc ids must be "
            "derivable from row content, not position)"
        )
    from ..functions.urltools import hash_nodes_int64

    def _norm(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        n_chars = pc.fill_null(pc.utf8_length(text), 0)
        keep = pc.and_(
            pc.is_valid(text), pc.greater_equal(n_chars, min_chars)
        )
        kept = batch.filter(keep)
        text_k = pc.cast(kept[text_col], pa.string())
        key = kept[key_col]
        if pa.types.is_integer(key.type):
            doc_id = pc.cast(key, pa.int64())
        else:
            doc_id = pa.array(
                hash_nodes_int64(
                    [v if v is not None else "" for v in key.to_pylist()]
                ),
                type=pa.int64(),
            )
        n = kept.num_rows
        lang = (
            pc.cast(kept[lang_col], pa.string())
            if lang_col
            else pa.array([""] * n, pa.string())
        )
        if source_col:
            source = pc.cast(kept[source_col], pa.string())
        elif not pa.types.is_integer(key.type):
            source = pc.cast(key, pa.string())
        else:
            source = pa.array([""] * n, pa.string())
        return pa.Table.from_arrays(
            [
                doc_id,
                text_k,
                pc.fill_null(lang, ""),
                pc.fill_null(source, ""),
                pc.cast(pc.utf8_length(text_k), pa.int64()),
            ],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        )

    return ds.map_batches(_norm, batch_format="pyarrow")
