"""WARC source: parse, gzip framings, hostile bytes, Ray read path and
the pages bridge into the flagship extraction DAG."""

from __future__ import annotations

import gzip
import io
import random

import pytest

from ocr_dataset_builder_ray.sources.warc import (
    DEFAULT_RECORD_TYPES,
    WARC_SCHEMA,
    parse_warc_records,
    read_warc,
    warc_pages,
    write_warc,
)

HTML1 = b"<html><body><p>First page body with enough characters.</p></body></html>"
HTML2 = b"<html><body><p>Second page body, also long enough to keep.</p></body></html>"


def _records():
    return [
        {"url": "http://a.example/x", "payload": HTML1, "rid": "aaaa"},
        {  # skipped by default
            "type": "request",
            "url": "http://a.example/x",
            "payload": b"GET /x HTTP/1.1\r\n\r\n",
            "http": False,
        },
        {"type": "warcinfo", "payload": b"software: test\r\n", "http": False},
        {
            "url": "http://b.example/y",
            "payload": HTML2,
            "rid": "bbbb",
            "date": "2025-06-21T12:34:56Z",
        },
        {  # non-html response (filtered by warc_pages, kept by read)
            "url": "http://c.example/data.json",
            "payload": b'{"k": 1}',
            "mime": "application/json",
        },
        {  # conversion record: payload is the block itself
            "type": "conversion",
            "url": "http://d.example/t",
            "payload": b"plain text conversion",
            "http": False,
            "mime": "text/plain",
        },
    ]


def _parse_file(path):
    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    return list(parse_warc_records(io.BytesIO(raw)))


def test_plain_roundtrip(tmp_path):
    p = write_warc(str(tmp_path / "a.warc"), _records())
    rows = _parse_file(p)
    # request/warcinfo skipped; response+conversion kept
    assert [r["record_type"] for r in rows] == [
        "response", "response", "response", "conversion"]
    assert rows[0]["url"] == "http://a.example/x"
    assert rows[0]["payload"] == HTML1
    assert rows[0]["mime"] == "text/html"
    assert rows[0]["http_status"] == 200
    assert rows[0]["payload_len"] == len(HTML1)
    assert str(rows[1]["warc_ts"]) == "2025-06-21 12:34:56"
    assert rows[2]["mime"] == "application/json"
    assert rows[3]["payload"] == b"plain text conversion"
    assert rows[3]["mime"] == "text/plain"
    assert rows[3]["http_status"] is None


def test_gzip_framings_equal(tmp_path):
    plain = _parse_file(write_warc(str(tmp_path / "a.warc"), _records()))
    member = _parse_file(
        write_warc(str(tmp_path / "m.warc.gz"), _records(), compress="member"))
    whole = _parse_file(
        write_warc(str(tmp_path / "w.warc.gz"), _records(), compress="whole"))
    assert plain == member == whole


def test_chunked_transfer_encoding_dechunked(tmp_path):
    p = write_warc(
        str(tmp_path / "c.warc"),
        [{"url": "http://a/x", "payload": HTML1, "chunked": True}],
    )
    rows = _parse_file(p)
    assert rows[0]["payload"] == HTML1


def test_record_types_widens(tmp_path):
    p = write_warc(str(tmp_path / "a.warc"), _records())
    raw = open(p, "rb").read()
    rows = list(parse_warc_records(
        io.BytesIO(raw),
        record_types=DEFAULT_RECORD_TYPES | {"request", "warcinfo"}))
    assert [r["record_type"] for r in rows] == [
        "response", "request", "warcinfo", "response", "response", "conversion"]


def test_oversized_payload_nulled_not_dropped(tmp_path):
    big = b"x" * 2000
    p = write_warc(
        str(tmp_path / "b.warc"),
        [{"url": "http://a/big", "payload": big},
         {"url": "http://a/after", "payload": HTML1}],
    )
    raw = open(p, "rb").read()
    rows = list(parse_warc_records(io.BytesIO(raw), max_payload=1000))
    assert len(rows) == 2  # oversize row survives as accounting row
    assert rows[0]["payload"] is None
    assert rows[0]["payload_len"] > 2000  # declared http-message length
    assert rows[1]["payload"] == HTML1  # stream stays aligned past it


def test_truncated_tail_keeps_prior_records(tmp_path):
    p = write_warc(str(tmp_path / "a.warc"), _records())
    raw = open(p, "rb").read()
    cut = raw[: len(raw) - len(HTML2) // 2 - 4]
    rows = list(parse_warc_records(io.BytesIO(cut)))
    assert [r["url"] for r in rows][:1] == ["http://a.example/x"]
    assert len(rows) < 4


def test_hostile_bytes_never_raise(tmp_path):
    payload = open(
        write_warc(str(tmp_path / "a.warc"), _records()), "rb").read()
    rnd = random.Random(11)
    cases = [payload[:c] for c in range(0, len(payload), max(1, len(payload) // 50))]
    for _ in range(300):
        i = rnd.randrange(len(payload))
        cases.append(payload[:i] + bytes([rnd.randrange(256)]) + payload[i + 1:])
    cases.append(b"WARC/1.0\r\nContent-Length: 999999999999\r\n\r\n")
    cases.append(b"WARC/1.0\r\n" + b"A" * 4096)
    cases.append(bytes(rnd.randrange(256) for _ in range(4096)))
    for q in cases:
        rows = list(parse_warc_records(io.BytesIO(q)))
        assert isinstance(rows, list)


def test_ray_read_warc_and_pages_bridge(ray_session, tmp_path):
    for i, comp in enumerate((None, "member")):
        recs = []
        for j in range(40):
            recs.append({
                "url": f"http://site{i}.example/p{j}",
                "payload": b"<html><body><p>"
                + (f"Document {i}-{j} body text with plenty of words to keep "
                   * 3).encode()
                + b"</p></body></html>",
                "rid": f"{i}-{j}",
            })
        recs.append({"type": "warcinfo", "payload": b"x", "http": False})
        name = f"f{i}.warc" + (".gz" if comp else "")
        write_warc(str(tmp_path / name), recs, compress=comp)

    ds = read_warc(str(tmp_path))
    assert ds.schema().names == WARC_SCHEMA.names
    assert ds.count() == 80  # warcinfo rows skipped

    pages = warc_pages(ds)
    assert pages.schema().names == ["url", "warc_ts", "html", "lang"]
    assert pages.count() == 80

    from ocr_dataset_builder_ray.pipelines.extraction import extraction_pipeline

    out = extraction_pipeline(pages).to_pandas()
    assert len(out) == 80
    assert (out["status"] == "ok").all()
    ok = out[out["url"] == "http://site0.example/p3"]
    assert ok["extracted_text"].iloc[0].startswith("Document 0-3 body text")


def test_extract_from_warc_planned_equals_shuffle(ray_session, tmp_path):
    """The metadata-planned prefilter path must produce exactly the
    grouped-shuffle path's rows, including the corners: cross-file
    duplicate urls, a duplicated url whose LATEST capture is non-html
    (invisible to the bridge — the latest html capture must win), and
    a same-url-same-ts ambiguous tie (content tie-break shuffle)."""

    def page(tag):
        return (
            b"<html><body><p>Body "
            + tag.encode()
            + b" with enough characters to be kept by the extractor.</p></body></html>"
        )

    t1, t2 = "2025-06-20T00:00:00Z", "2025-06-21T00:00:00Z"
    file_a = [
        {"url": "http://d.example/dup", "payload": page("old"), "date": t1},
        {"url": "http://d.example/amb", "payload": page("amb1"), "date": t1},
        {"url": "http://d.example/json", "payload": page("html-wins"), "date": t1},
        {"url": "http://d.example/s1", "payload": page("s1"), "date": t1},
    ]
    file_b = [
        {"url": "http://d.example/dup", "payload": page("new"), "date": t2},
        {"url": "http://d.example/amb", "payload": page("amb2"), "date": t1},
        {
            "url": "http://d.example/json",
            "payload": b'{"newer": true}',
            "date": t2,
            "mime": "application/json",
        },
        {"url": "http://d.example/s2", "payload": page("s2"), "date": t2},
    ]
    write_warc(str(tmp_path / "a.warc.gz"), file_a, compress="member")
    write_warc(str(tmp_path / "b.warc"), file_b)

    from ocr_dataset_builder_ray.pipelines.extraction import (
        extract_from_warc,
        extraction_pipeline,
    )

    def canon(df):
        return (
            df[["url", "extracted_text", "content_hash", "status"]]
            .sort_values(["url"])
            .reset_index(drop=True)
        )

    planned_df = extract_from_warc(str(tmp_path)).to_pandas()
    planned = canon(planned_df)
    shuffled = canon(
        extraction_pipeline(warc_pages(read_warc(str(tmp_path)))).to_pandas()
    )
    assert planned.equals(shuffled)
    assert len(planned) == 5  # one row per url
    text = dict(zip(planned["url"], planned["extracted_text"]))
    assert "Body new" in text["http://d.example/dup"]  # latest ts wins
    assert "Body html-wins" in text["http://d.example/json"]  # latest HTML wins
    assert text["http://d.example/amb"].startswith("Body amb")  # tie resolved


def test_wet_documents_bridge(ray_session, tmp_path):
    """WET-style conversion records land in the documents shape and
    flow straight into a curation-family operator."""
    recs = []
    for j in range(30):
        body = "common shared text " * 5 if j % 2 else f"wet document {j} unique tail"
        recs.append({
            "type": "conversion",
            "url": f"http://w.example/{j}",
            "payload": body.encode(),
            "http": False,
            "mime": "text/plain",
        })
    recs.append({  # html response: must NOT appear in documents
        "url": "http://w.example/html", "payload": HTML1})
    write_warc(str(tmp_path / "w.warc.gz"), recs, compress="member")

    from ocr_dataset_builder_ray.sources.warc import warc_text_documents

    docs = warc_text_documents(read_warc(str(tmp_path)))
    df = docs.to_pandas()
    assert list(df.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert len(df) == 30
    assert df["doc_id"].is_unique
    assert (df["n_chars"] == df["text"].str.len()).all()

    # deterministic ids: a second read yields identical (source, doc_id)
    df2 = warc_text_documents(read_warc(str(tmp_path))).to_pandas()
    assert set(zip(df2["source"], df2["doc_id"])) == set(
        zip(df["source"], df["doc_id"]))

    # feeds the dedup family directly
    from ocr_dataset_builder_ray.stages.dedup import exact_dedup

    kept = exact_dedup(docs, text_col="text", key_col="doc_id").to_pandas()
    assert len(kept) == 16  # 15 identical odd docs collapse to one


def test_block_bounds_stream(ray_session, tmp_path):
    recs = [{"url": f"http://a/{j}", "payload": HTML1} for j in range(25)]
    write_warc(str(tmp_path / "a.warc"), recs)
    ds = read_warc(str(tmp_path / "a.warc"), override_num_blocks=1)
    # rows_per_block default 512 > 25: one block; just assert integrity
    assert ds.count() == 25
    tiny = read_warc(str(tmp_path / "a.warc"))
    assert tiny.count() == 25
