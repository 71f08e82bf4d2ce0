"""WARC source: stream Common-Crawl-style web archives into the engine.

The reference ingests capture directories of per-page files
(`tesseract/pipeline.py:301-408` walks a frame tree); the web-scale
analogue of that on-ramp is the ISO 28500 WARC format — the container
Common Crawl and every serious crawler emit. This module turns
``*.warc`` / ``*.warc.gz`` files into the engine's ``pages``-shaped
dataset so the flagship extraction DAG runs unchanged on raw crawls.

Design (Ray-Data-first, sized for ~1 GB crawl segments):

* ``WarcDatasource`` subclasses ``FileBasedDatasource``: file
  discovery, filesystem abstraction and `.gz` decompression come from
  Ray's read machinery (pyarrow's gzip stream concatenates the
  member-per-record gzip framing Common Crawl uses — verified); one
  read task per file is the natural parallelism unit because gzip
  members prevent sub-file splits, exactly how production crawlers
  shard work.
* ``_read_stream`` yields a bounded Arrow block every
  ``rows_per_block`` records or ``block_bytes`` of payload, so a 1 GB
  archive never materializes as one block — the streaming executor
  pipelines blocks into extraction while the file is still being read.
* Hostile input is survival-mode, same contract as the media codecs:
  a structurally corrupt record ends that FILE's parse (records
  already yielded are kept, alignment past a lost boundary is
  guesswork); an oversized declared payload is drained but shipped as
  ``payload=null`` with its true ``payload_len`` so the row still
  exists for accounting. No exception ever leaves the read task for
  malformed content.

Profile: WARC/0.17-1.1 records; ``response`` records carry an HTTP
message (status line + headers + body, chunked transfer-encoding
de-chunked); ``resource``/``conversion`` records carry the payload
directly; ``request``/``metadata``/``warcinfo``/``revisit`` are
dropped by default (``record_types=`` widens this).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

WARC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("record_type", pa.string()),
        pa.field("http_status", pa.int32()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("payload_len", pa.int64()),
        pa.field("warc_record_id", pa.string()),
    ]
)

DEFAULT_RECORD_TYPES = frozenset({"response", "resource", "conversion"})
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024  # beyond this: payload=null, len kept
_HTTP_HEAD_PEEK = 64 * 1024  # head kept from dropped payloads (status/mime)
_ROWS_PER_BLOCK = 512
_BLOCK_BYTES = 32 * 1024 * 1024


class _StreamReader:
    """Buffered exact-read / readline over any ``.read(n)`` object
    (pyarrow NativeFile has no usable readline of its own)."""

    def __init__(self, raw, chunk: int = 1 << 16) -> None:
        self._raw = raw
        self._chunk = chunk
        self._buf = b""

    def _fill(self) -> bool:
        data = self._raw.read(self._chunk)
        if not data:
            return False
        self._buf += data
        return True

    def readline(self, limit: int = 1 << 20) -> bytes:
        """One ``\\n``-terminated line (terminator included); ``b""`` at
        EOF. Lines beyond ``limit`` abort (header lines are small)."""
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line, self._buf = self._buf[: i + 1], self._buf[i + 1 :]
                return line
            if len(self._buf) > limit:
                raise _Corrupt("unterminated header line")
            if not self._fill():
                line, self._buf = self._buf, b""
                return line

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            if not self._fill():
                raise _Corrupt("truncated record body")
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def drain(self, n: int) -> None:
        """Discard ``n`` bytes without accumulating them."""
        have = min(len(self._buf), n)
        self._buf = self._buf[have:]
        n -= have
        while n > 0:
            data = self._raw.read(min(n, self._chunk))
            if not data:
                raise _Corrupt("truncated record body")
            n -= len(data)


class _Corrupt(Exception):
    """Structural corruption: the record boundary is lost."""


def _parse_warc_date(value: str):
    try:
        dt = datetime.fromisoformat(value.strip().replace("Z", "+00:00"))
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    except ValueError:
        return None


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body; on any parse
    error return the raw body unchanged (capture tools sometimes store
    already-dechunked bodies behind a stale header)."""
    out, pos = [], 0
    try:
        while True:
            nl = body.index(b"\r\n", pos)
            size = int(body[pos:nl].split(b";")[0], 16)
            pos = nl + 2
            if size == 0:
                break
            out.append(body[pos : pos + size])
            if pos + size > len(body):
                return body
            pos += size + 2  # chunk + CRLF
        return b"".join(out)
    except (ValueError, IndexError):
        return body


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, mime, payload) from a stored HTTP response message."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, payload = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    status: int | None = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    mime: str | None = None
    chunked = False
    for ln in lines[1:]:
        c = ln.find(b":")
        if c < 0:
            continue
        name = ln[:c].strip().lower()
        if name == b"content-type":
            mime = (
                ln[c + 1 :].split(b";")[0].strip().decode("latin-1").lower()
                or None
            )
        elif name == b"transfer-encoding":
            chunked = b"chunked" in ln[c + 1 :].lower()
    if chunked:
        payload = _dechunk(payload)
    return status, mime, payload


def parse_warc_records(
    raw,
    *,
    record_types: frozenset[str] = DEFAULT_RECORD_TYPES,
    max_payload: int = MAX_PAYLOAD_BYTES,
) -> Iterator[dict]:
    """Yield row dicts (WARC_SCHEMA fields) from a readable byte stream
    of decompressed WARC data. Stops silently at EOF or at the first
    structural corruption (never raises for malformed content)."""
    rd = _StreamReader(raw)
    try:
        while True:
            # -- version line (tolerate blank padding between records)
            line = rd.readline()
            while line in (b"\r\n", b"\n"):
                line = rd.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                raise _Corrupt("bad version line")
            # -- headers
            headers: dict[str, str] = {}
            while True:
                line = rd.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                c = line.find(b":")
                if c < 0:
                    raise _Corrupt("bad header line")
                headers[line[:c].strip().decode("latin-1").lower()] = (
                    line[c + 1 :].strip().decode("latin-1")
                )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                raise _Corrupt("missing content-length")
            if length < 0:
                raise _Corrupt("negative content-length")
            rtype = headers.get("warc-type", "").lower()
            wanted = rtype in record_types
            truncated = length > max_payload
            head = b""
            if not wanted:
                rd.drain(length)
                block = b""
            elif truncated:
                # keep a bounded head so HTTP status/mime survive even
                # when the payload is dropped (metadata-only planning
                # passes read with max_payload=0). Response header
                # blocks beyond _HTTP_HEAD_PEEK are out of profile for
                # the head peek (mime comes back null).
                n_head = min(length, _HTTP_HEAD_PEEK)
                head = rd.read_exact(n_head)
                rd.drain(length - n_head)
                block = b""
            else:
                block = rd.read_exact(length)
            # -- two record-terminating CRLFs (lenient: any blank lines)
            rd.readline()
            rd.readline()
            if not wanted:
                continue
            ctype = headers.get("content-type", "").lower()
            status: int | None = None
            mime: str | None = None
            payload: bytes | None = block
            if rtype == "response" and ctype.startswith("application/http"):
                if truncated:
                    status, mime, _ = _split_http(head)
                    payload = None
                else:
                    status, mime, payload = _split_http(block)
            else:
                mime = ctype.split(";")[0].strip() or None
                if truncated:
                    payload = None
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
                "record_type": rtype,
                "http_status": status,
                "mime": mime,
                "payload": payload,
                "payload_len": length if truncated else
                (len(payload) if payload is not None else 0),
                "warc_record_id": headers.get("warc-record-id"),
            }
    except _Corrupt:
        return
    except Exception:
        return  # defense in depth: never let hostile bytes kill the task


class WarcDatasource(FileBasedDatasource):
    """Ray Data datasource for ``*.warc`` / ``*.warc.gz`` files."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(
        self,
        paths,
        *,
        record_types: frozenset[str] | set[str] = DEFAULT_RECORD_TYPES,
        max_payload: int = MAX_PAYLOAD_BYTES,
        rows_per_block: int = _ROWS_PER_BLOCK,
        block_bytes: int = _BLOCK_BYTES,
        **kwargs,
    ) -> None:
        super().__init__(paths, **kwargs)
        self._record_types = frozenset(record_types)
        self._max_payload = max_payload
        self._rows_per_block = rows_per_block
        self._block_bytes = block_bytes

    def _read_stream(self, f, path: str):
        rows: list[dict] = []
        nbytes = 0
        for row in parse_warc_records(
            f,
            record_types=self._record_types,
            max_payload=self._max_payload,
        ):
            rows.append(row)
            nbytes += row["payload_len"]
            if len(rows) >= self._rows_per_block or nbytes >= self._block_bytes:
                yield pa.Table.from_pylist(rows, schema=WARC_SCHEMA)
                rows, nbytes = [], 0
        if rows:
            yield pa.Table.from_pylist(rows, schema=WARC_SCHEMA)


def read_warc(
    paths,
    *,
    record_types: frozenset[str] | set[str] = DEFAULT_RECORD_TYPES,
    max_payload: int = MAX_PAYLOAD_BYTES,
    **read_args,
):
    """``ray.data``-native WARC read. One read task per archive file
    (gzip members forbid sub-file splits — the crawler-standard unit);
    blocks stream out bounded by rows and payload bytes."""
    import ray.data

    read_args.setdefault("file_extensions", ["warc", "warc.gz"])
    ds_args = {"file_extensions": read_args.pop("file_extensions")}
    return ray.data.read_datasource(
        WarcDatasource(
            paths,
            record_types=record_types,
            max_payload=max_payload,
            **ds_args,
        ),
        **read_args,
    )


HTML_MIMES = ("text/html", "application/xhtml+xml")


def html_mime_mask(batch: pa.Table):
    """Boolean mask: rows that are html documents with a url — the
    shared half of the bridge filter, used identically by ``warc_pages``
    and the winner-planning skinny pass so the prefilter plan and the
    payload stream always agree on which records exist."""
    import pyarrow.compute as pc

    mask = pc.fill_null(
        pc.is_in(batch.column("mime"), value_set=pa.array(HTML_MIMES)), False
    )
    return pc.and_(mask, pc.is_valid(batch.column("url")))


def warc_pages(ds):
    """Bridge a ``read_warc`` dataset to the flagship's ``pages`` shape
    (url, warc_ts, html, lang): html responses / documents only, with
    ``lang`` empty (the corpus langid stage fills it downstream)."""
    import pyarrow.compute as pc

    def to_pages(batch: pa.Table) -> pa.Table:
        mask = pc.and_(html_mime_mask(batch), pc.is_valid(batch.column("payload")))
        kept = batch.filter(mask)
        return pa.Table.from_arrays(
            [
                kept.column("url"),
                kept.column("warc_ts"),
                kept.column("payload"),
                pa.array([""] * len(kept), type=pa.string()),
            ],
            names=["url", "warc_ts", "html", "lang"],
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def warc_text_documents(ds, *, min_chars: int = 1):
    """WET-style bridge: ``conversion``/``resource`` records carrying
    ``text/plain`` (Common Crawl WET files are exactly WARC conversion
    records) -> the engine's documents shape ``(doc_id, text, lang,
    source, n_chars)``, ready for the dedup/curation/retrieval family
    (``key_col="doc_id"``, ``text_col="text"``). ``doc_id`` is the
    stable 64-bit url hash reinterpreted as int64 (bijective), so ids
    are deterministic across runs and parallelism levels."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64_array

    def to_docs(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.equal(batch.column("mime"), "text/plain"), False)
        mask = pc.and_(mask, pc.is_valid(batch.column("url")))
        mask = pc.and_(mask, pc.is_valid(batch.column("payload")))
        kept = batch.filter(mask)
        text = pa.array(
            [
                (b or b"").decode("utf-8", errors="replace")
                for b in kept.column("payload").to_pylist()
            ],
            type=pa.string(),
        )
        n_chars = pc.utf8_length(text)
        urls = kept.column("url").to_pylist()
        doc_id = pa.array(
            stable_hash64_array(urls).view(np.int64), type=pa.int64()
        )
        out = pa.Table.from_arrays(
            [
                doc_id,
                text,
                pa.array([""] * len(kept), type=pa.string()),
                kept.column("url"),
                pc.cast(n_chars, pa.int64()),
            ],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        )
        return out.filter(pc.greater_equal(out["n_chars"], min_chars))

    return ds.map_batches(to_docs, batch_format="pyarrow")


# -- fixture writer (tests / local bench only) ---------------------------


def write_warc(
    path: str,
    records: list[dict],
    *,
    compress: str | None = None,
) -> str:
    """Write a spec-shaped WARC file for fixtures. Each record dict:
    ``{url, date, payload, type='response', mime='text/html',
    status=200, http=True, chunked=False}``. ``compress`` is ``None``,
    ``"member"`` (one gzip member per record, Common Crawl framing) or
    ``"whole"`` (single-member gzip)."""
    out = []
    for rec in records:
        rtype = rec.get("type", "response")
        payload = rec.get("payload", b"")
        if rec.get("http", rtype == "response"):
            mime = rec.get("mime", "text/html")
            status = rec.get("status", 200)
            if rec.get("chunked"):
                body = b"".join(
                    b"%x\r\n%s\r\n" % (len(chunk), chunk)
                    for chunk in (payload[i : i + 7] for i in range(0, len(payload), 7))
                ) + b"0\r\n\r\n"
                te = b"Transfer-Encoding: chunked\r\n"
            else:
                body, te = payload, b""
            block = (
                b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n%s\r\n"
                % (status, mime.encode(), te)
            ) + body
            ctype = b"application/http; msgtype=response"
        else:
            block = payload
            ctype = rec.get("mime", "application/octet-stream").encode()
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rtype.encode(),
            b"WARC-Record-ID: <urn:uuid:%s>" % rec.get("rid", "0" * 8).encode(),
            b"WARC-Date: " + rec.get("date", "2025-06-20T00:00:00Z").encode(),
            b"Content-Type: " + ctype,
            b"Content-Length: " + str(len(block)).encode(),
        ]
        if rec.get("url"):
            headers.insert(2, b"WARC-Target-URI: " + rec["url"].encode())
        raw = b"\r\n".join(headers) + b"\r\n\r\n" + block + b"\r\n\r\n"
        out.append(gzip.compress(raw, mtime=0) if compress == "member" else raw)
    blob = b"".join(out)
    if compress == "whole":
        blob = gzip.compress(blob, mtime=0)
    with open(path, "wb") as fh:
        fh.write(blob)
    return path
