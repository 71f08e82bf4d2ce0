"""Extraction stage — the actor-pool `map_batches` callable.

Ray-Data analogue of the reference's per-directory Tesseract worker
(`_process_tesseract_directory`, tesseract/pipeline.py:27-107): one
batch in, one batch of extracted rows out, failures as status rows.
Stateful setup happens once per actor in ``__init__`` (the A1/A2
pattern, SURVEY.md §2.4) — per-lang token splitters are compiled
lazily and cached per actor, mirroring the reference's per-worker
engine/client initialization (llm/image_processing.py:56-91).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import md5_hex, stable_hash64
from ..functions.html_extract import extract_document

SPAN_TYPE = pa.struct(
    [
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("text_density", pa.float64()),
        pa.field("link_density", pa.float64()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("extracted_text", pa.large_string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("status", pa.string()),
        pa.field("n_chars", pa.int64()),
        pa.field("n_spans", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("content_hash", pa.string()),
        pa.field("html_bytes", pa.int64()),
        pa.field("url_hash", pa.uint64()),
    ]
)

# Per-lang word tokenizer patterns: space-delimited langs share one
# compiled regex; CJK-style langs would add their own here. The cache
# is the graft of the reference's per-`lang` engine selection
# (tesseract/pipeline.py:31 `language` arg).
_LANG_TOKEN_PATTERNS = {
    "default": r"[\w؀-ۿ]+(?:['’-]\w+)*",
}


class ExtractPages:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    __init__ runs once per actor: compile classifiers/tokenizers.
    __call__ runs per Arrow batch: pure per-row kernel, vectorized
    assembly of output arrays. Never raises on payload content.
    """

    def __init__(self) -> None:
        self._tokenizers: dict[str, re.Pattern] = {}
        self._default_pattern = _LANG_TOKEN_PATTERNS["default"]

    def _tokenizer(self, lang: str) -> re.Pattern:
        tok = self._tokenizers.get(lang)
        if tok is None:
            pattern = _LANG_TOKEN_PATTERNS.get(lang, self._default_pattern)
            tok = self._tokenizers[lang] = re.compile(pattern, re.UNICODE)
        return tok

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist()

        texts: list[str] = []
        spans: list[list[dict]] = []
        statuses: list[str] = []
        n_chars: list[int] = []
        n_spans: list[int] = []
        n_tokens: list[int] = []
        hashes: list[str] = []
        html_bytes: list[int] = []
        url_hashes: list[int] = []

        for url, html, lang in zip(urls, htmls, langs):
            res = extract_document(html)
            text = res["extracted_text"]
            texts.append(text)
            spans.append(res["spans"])
            statuses.append(res["status"])
            n_chars.append(res["n_chars"])
            n_spans.append(res["n_spans"])
            n_tokens.append(len(self._tokenizer(lang).findall(text)) if text else 0)
            hashes.append(md5_hex(text))
            html_bytes.append(len(html) if html is not None else 0)
            url_hashes.append(stable_hash64(url))

        return pa.Table.from_arrays(
            [
                batch["url"],
                batch["warc_ts"],
                batch["lang"],
                pa.array(texts, type=pa.large_string()),
                pa.array(spans, type=pa.list_(SPAN_TYPE)),
                pa.array(statuses, type=pa.string()),
                pa.array(n_chars, type=pa.int64()),
                pa.array(n_spans, type=pa.int64()),
                pa.array(n_tokens, type=pa.int64()),
                pa.array(hashes, type=pa.string()),
                pa.array(html_bytes, type=pa.int64()),
                pa.array(url_hashes, type=pa.uint64()),
            ],
            schema=EXTRACTED_SCHEMA,
        )


def extract_table(batch: pa.Table) -> pa.Table:
    """Stateless single-process form of the stage (the test oracle)."""
    return ExtractPages()(batch)
