"""PDF/layout extraction tests: reading order, columns, hyphenation,
sentinels, and the payload dispatcher (SURVEY.md §5 model: per-operator
unit tests on deterministic synthetic inputs)."""

from ocr_dataset_builder_ray.functions.layout_extract import (
    STATUS_EMPTY_PDF,
    STATUS_PDF_DECODE_UNAVAILABLE,
    extract_pdf_document,
    render_fake_pdf,
)
from ocr_dataset_builder_ray.functions.textnorm import STATUS_OK
from ocr_dataset_builder_ray.stages.extract import extract_payload


def test_empty_pdf_sentinel():
    for payload in (b"", None):
        res = extract_pdf_document(payload)
        assert res["status"] == STATUS_EMPTY_PDF
        assert res["extracted_text"] == ""


def test_real_pdf_decode_is_stubbed():
    res = extract_pdf_document(b"%PDF-1.7\nbinary pdf innards")
    assert res["status"] == STATUS_PDF_DECODE_UNAVAILABLE
    assert res["extracted_text"] == ""


def test_single_column_roundtrip():
    paras = [
        "First paragraph with several words that wrap across lines.",
        "Second paragraph equally verbose to span multiple lines too.",
    ]
    payload = render_fake_pdf([paras])
    res = extract_pdf_document(payload)
    assert res["status"] == STATUS_OK
    assert res["extracted_text"].split("\n\n") == paras
    assert [s["kind"] for s in res["spans"]] == ["pdf_paragraph"] * 2


def test_two_column_reading_order():
    col1 = ["Alpha paragraph in the left column with plenty of words."]
    col2 = ["Beta paragraph in the right column following the first."]
    res = extract_pdf_document(render_fake_pdf([col1, col2]))
    assert res["extracted_text"].split("\n\n") == col1 + col2


def test_hyphenation_merged():
    paras = ["A supercalifragilistic expialidocious demonstration paragraph"]
    payload = render_fake_pdf([paras], chars_per_line=24)
    assert b"-" in payload  # the wrap actually hyphenated something
    res = extract_pdf_document(payload)
    assert res["extracted_text"] == paras[0]


def test_multi_page_order():
    p0 = render_fake_pdf([["Page zero paragraph content here."]], page=0)
    p1 = render_fake_pdf([["Page one paragraph content here."]], page=1)
    # merge the two containers: header + lines of both
    merged = p0 + p1.split(b"\n", 1)[1]
    res = extract_pdf_document(merged)
    assert res["extracted_text"].index("Page zero") < res["extracted_text"].index(
        "Page one"
    )


def test_poison_payload_becomes_status_row():
    res = extract_pdf_document(b"%FAKE-PDF\n{not json at all")
    assert res["status"].startswith("<<< EXTRACT_EXCEPTION:")


def test_dispatcher_routes_by_magic():
    pdf = render_fake_pdf([["Dispatcher routing paragraph with words."]])
    html = b"<html><body><p>A substantive html paragraph to keep.</p></body></html>"
    assert extract_payload(pdf)["spans"][0]["kind"] == "pdf_paragraph"
    assert extract_payload(html)["spans"][0]["kind"] == "paragraph"
    assert extract_payload(b"%PDF-raw")["status"] == STATUS_PDF_DECODE_UNAVAILABLE


def test_deterministic():
    payload = render_fake_pdf([["Deterministic output check paragraph."]])
    assert extract_pdf_document(payload) == extract_pdf_document(payload)
