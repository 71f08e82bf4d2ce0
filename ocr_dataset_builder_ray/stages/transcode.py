"""Dataset-level charset detection / transcoding stages.

The pipeline-facing face of ``functions/charset.py``: pure
``map_batches`` maps (no shuffle, no state), so they compose anywhere
ahead of extraction or curation. At 100-TB scale these are embarrassingly
parallel; the per-payload kernel is a BOM check plus two compiled-regex
scans over at most 1 KiB, dwarfed by the DOM parse that follows, so a
Python loop over the batch's binary values is not the hot path here
(the payloads themselves stay zero-copy Arrow buffers until sliced).

Reference anchor: the reference decodes frames with cv2/PIL and trusts
them (tesseract/processing.py:74); a crawl-payload engine cannot trust
bytes, hence this stage.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.charset import decode_payload, detect_encoding

if False:  # typing only
    import ray.data


def detect_encodings(
    ds: "ray.data.Dataset",
    payload_col: str = "html",
    encoding_col: str = "encoding",
    source_col: str = "encoding_source",
) -> "ray.data.Dataset":
    """Append ``(encoding, encoding_source)`` columns sniffed from the
    raw payload bytes (WHATWG order: BOM > meta/xml declaration >
    utf-8 validity > windows-1252 fallback)."""

    def _sniff(batch: pa.Table) -> pa.Table:
        pairs = [detect_encoding(v) for v in batch[payload_col].to_pylist()]
        batch = batch.append_column(
            encoding_col, pa.array([p[0] for p in pairs], pa.string())
        )
        return batch.append_column(
            source_col, pa.array([p[1] for p in pairs], pa.string())
        )

    return ds.map_batches(_sniff, batch_format="pyarrow")


def transcode_to_utf8(
    ds: "ray.data.Dataset",
    payload_col: str = "html",
    encoding_col: str = "encoding",
    source_col: str = "encoding_source",
) -> "ray.data.Dataset":
    """Rewrite the payload column to clean UTF-8 bytes (BOM stripped,
    undecodable bytes -> U+FFFD) and record what each payload was.

    Downstream stages can then decode with plain utf-8 — useful when
    the corpus is written back to parquet once and consumed by many
    pipelines, so the sniff cost is paid a single time.

    Stale in-document ``<meta charset>`` / XML-declaration labels in
    the prescan window are rewritten to ``utf-8`` (a label edit, not a
    DOM edit — ``rewrite_declared_utf8``): without it, any downstream
    re-sniff (extract_document sniffs unconditionally) would
    double-decode the now-UTF-8 bytes as the stale legacy code page —
    mojibake for exactly the pages transcoding targets.
    """
    from ..functions.charset import rewrite_declared_utf8

    def _transcode(batch: pa.Table) -> pa.Table:
        texts, encs, srcs = [], [], []
        for v in batch[payload_col].to_pylist():
            text, enc, src = decode_payload(v)
            texts.append(
                None
                if v is None
                else rewrite_declared_utf8(text).encode("utf-8")
            )
            encs.append(enc)
            srcs.append(src)
        i = batch.schema.get_field_index(payload_col)
        batch = batch.set_column(
            i, payload_col, pa.array(texts, pa.large_binary())
        )
        batch = batch.append_column(
            encoding_col, pa.array(encs, pa.string())
        )
        return batch.append_column(source_col, pa.array(srcs, pa.string()))

    return ds.map_batches(_transcode, batch_format="pyarrow")
