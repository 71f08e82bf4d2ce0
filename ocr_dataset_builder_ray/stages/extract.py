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

from hashlib import md5 as _md5

from ..functions.hashing import md5_hex, stable_hash64  # noqa: F401 (md5_hex: public seam)
from ..functions.html_extract import extract_document
from ..functions.layout_extract import FAKE_PDF_MAGIC, PDF_MAGIC, extract_pdf_document


def extract_payload(payload: bytes | None) -> dict:
    """Payload-sniffing kernel dispatch: HTML DOM parse vs PDF layout
    reconstruction (north-star's PDF-embedded-page path). Both return
    the same ``extracted_text/spans/status`` shape and never raise."""
    if payload and (
        payload.startswith(FAKE_PDF_MAGIC) or payload.startswith(PDF_MAGIC)
    ):
        return extract_pdf_document(payload)
    return extract_document(payload)

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
        pa.field("content_hash64", pa.uint64()),  # first 8 md5 bytes (cheap numeric digest)
        pa.field("html_bytes", pa.int64()),
        pa.field("url_hash", pa.uint64()),
    ]
)

# In-flight (shuffle-friendly) layout: spans as five parallel
# list<primitive> columns instead of one list<struct>. Ray's sort-based
# shuffle degrades badly on list<struct> blocks (rows round-trip through
# Python dicts — measured ~3.5x slower exchange); primitive lists stay
# columnar end-to-end. ``assemble_spans`` restores the public
# ``EXTRACTED_SCHEMA`` view after the last all-to-all.
_SPAN_FLAT_FIELDS = [
    pa.field("span_starts", pa.list_(pa.int64())),
    pa.field("span_ends", pa.list_(pa.int64())),
    pa.field("span_kinds", pa.list_(pa.string())),
    pa.field("span_td", pa.list_(pa.float64())),
    pa.field("span_ld", pa.list_(pa.float64())),
]

EXTRACTED_FLAT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("extracted_text", pa.large_string()),
        *_SPAN_FLAT_FIELDS,
        pa.field("status", pa.string()),
        pa.field("n_chars", pa.int64()),
        pa.field("n_spans", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("content_hash", pa.string()),
        pa.field("content_hash64", pa.uint64()),
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


def dedup_table(t: pa.Table) -> pa.Table:
    """Vectorized keep-latest-per-url within one table (flat schema).

    Sort by (url asc, warc_ts desc, content_hash desc), keep the first
    row of each url run. Associative/commutative/idempotent — safe as a
    per-batch combiner AND as the per-bucket final pass; winners are
    identical at any parallelism.
    """
    if t.num_rows <= 1:
        return t
    idx = pa.compute.sort_indices(
        t,
        sort_keys=[
            ("url", "ascending"),
            ("warc_ts", "descending"),
            ("content_hash", "descending"),
        ],
    )
    t = t.take(idx)
    urls = t["url"].combine_chunks()
    neq = pa.compute.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    first = pa.concat_arrays([pa.array([True]), neq])
    return t.filter(first)


class ExtractPages:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    __init__ runs once per actor: compile classifiers/tokenizers.
    __call__ runs per Arrow batch: pure per-row kernel, vectorized
    assembly of output arrays. Never raises on payload content.

    ``dedup_buckets=N`` fuses the dedup combiner into this stage: each
    output batch is pre-deduped (keep-latest per url) and carries an
    ``url_bucket = url_hash % N`` column, so the downstream
    ``groupby("url_bucket")`` shuffle needs no extra map stage.

    ``emit="struct"`` assembles the public ``spans: list<struct>`` view
    inside the actor (use when NO exchange follows, so the assembly
    rides in the actor pool instead of competing with the read/write
    stages for the pool's leftover CPUs); ``emit="flat"`` keeps the
    shuffle-friendly parallel list columns for a downstream exchange.
    """

    def __init__(self, dedup_buckets: int | None = None, emit: str = "flat") -> None:
        self._tokenizers: dict[str, re.Pattern] = {}
        self._default_pattern = _LANG_TOKEN_PATTERNS["default"]
        if emit == "struct" and dedup_buckets is not None:
            raise ValueError("emit='struct' is for shuffle-free plans; "
                             "a bucketed dedup exchange needs emit='flat'")
        self._dedup_buckets = dedup_buckets
        self._emit = emit

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
        statuses: list[str] = []
        n_chars: list[int] = []
        n_spans: list[int] = []
        n_tokens: list[int] = []
        hashes: list[str] = []
        hashes64: list[int] = []
        html_bytes: list[int] = []
        url_hashes: list[int] = []
        # flattened span fields + shared offsets (columnar from the start)
        offsets: list[int] = [0]
        f_starts: list[int] = []
        f_ends: list[int] = []
        f_kinds: list[str] = []
        f_td: list[float] = []
        f_ld: list[float] = []

        for url, html, lang in zip(urls, htmls, langs):
            res = extract_payload(html)
            text = res["extracted_text"]
            texts.append(text)
            for s in res["spans"]:
                f_starts.append(s["start"])
                f_ends.append(s["end"])
                f_kinds.append(s["kind"])
                f_td.append(s["text_density"])
                f_ld.append(s["link_density"])
            offsets.append(len(f_starts))
            statuses.append(res["status"])
            n_chars.append(res["n_chars"])
            n_spans.append(res["n_spans"])
            n_tokens.append(len(self._tokenizer(lang).findall(text)) if text else 0)
            md = _md5(text.encode())
            hashes.append(md.hexdigest())
            hashes64.append(int.from_bytes(md.digest()[:8], "big"))
            html_bytes.append(len(html) if html is not None else 0)
            url_hashes.append(stable_hash64(url))

        off = pa.array(offsets, type=pa.int32())
        out = pa.Table.from_arrays(
            [
                batch["url"],
                batch["warc_ts"],
                batch["lang"],
                pa.array(texts, type=pa.large_string()),
                pa.ListArray.from_arrays(off, pa.array(f_starts, type=pa.int64())),
                pa.ListArray.from_arrays(off, pa.array(f_ends, type=pa.int64())),
                pa.ListArray.from_arrays(off, pa.array(f_kinds, type=pa.string())),
                pa.ListArray.from_arrays(off, pa.array(f_td, type=pa.float64())),
                pa.ListArray.from_arrays(off, pa.array(f_ld, type=pa.float64())),
                pa.array(statuses, type=pa.string()),
                pa.array(n_chars, type=pa.int64()),
                pa.array(n_spans, type=pa.int64()),
                pa.array(n_tokens, type=pa.int64()),
                pa.array(hashes, type=pa.string()),
                pa.array(hashes64, type=pa.uint64()),
                pa.array(html_bytes, type=pa.int64()),
                pa.array(url_hashes, type=pa.uint64()),
            ],
            schema=EXTRACTED_FLAT_SCHEMA,
        )
        if self._dedup_buckets is not None:
            out = dedup_table(out)
            n = self._dedup_buckets
            h = out["url_hash"]
            b = (
                pa.compute.bit_wise_and(h, pa.scalar(n - 1, pa.uint64()))
                if (n & (n - 1)) == 0
                else pa.compute.subtract(h, pa.compute.multiply(pa.compute.divide(h, pa.scalar(n, pa.uint64())), pa.scalar(n, pa.uint64())))
            )
            out = out.append_column("url_bucket", pa.compute.cast(b, pa.int64()))
        if self._emit == "struct":
            out = assemble_spans(out)
        return out


def assemble_spans(t: pa.Table) -> pa.Table:
    """Flat span columns → public ``spans: list<struct>`` view.

    Runs once per output batch AFTER the dedup shuffle, so the struct
    construction cost is paid on the deduped (smaller) table and never
    crosses an exchange.
    """
    starts = t["span_starts"].combine_chunks()
    lengths = pa.compute.list_value_length(starts).fill_null(0)
    import numpy as np

    off = pa.array(
        np.concatenate([[0], np.cumsum(lengths.to_numpy(zero_copy_only=False))]),
        type=pa.int32(),
    )
    fields = list(SPAN_TYPE)
    children = [
        starts.flatten(),
        t["span_ends"].combine_chunks().flatten(),
        t["span_kinds"].combine_chunks().flatten(),
        t["span_td"].combine_chunks().flatten(),
        t["span_ld"].combine_chunks().flatten(),
    ]
    # intermediate exchanges may widen child types (e.g. polars sort
    # promotes string -> large_string); cast back to the public schema
    children = [
        c if c.type == f.type else pa.compute.cast(c, f.type)
        for c, f in zip(children, fields)
    ]
    struct = pa.StructArray.from_arrays(children, fields=fields)
    spans = pa.ListArray.from_arrays(off, struct)
    t = t.drop_columns(["span_starts", "span_ends", "span_kinds", "span_td", "span_ld"])
    t = t.add_column(4, pa.field("spans", pa.list_(SPAN_TYPE)), spans)
    return t.select([f.name for f in EXTRACTED_SCHEMA])


def extract_table(batch: pa.Table) -> pa.Table:
    """Stateless single-process form of the stage (the test oracle) —
    public schema (spans assembled)."""
    return assemble_spans(ExtractPages()(batch))
