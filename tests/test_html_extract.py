"""Extraction-kernel tests: classification, spans, sentinels, determinism."""

import unicodedata

import pytest

from ocr_dataset_builder_ray.functions.html_extract import extract_document
from ocr_dataset_builder_ray.functions.textnorm import STATUS_EMPTY_HTML, STATUS_OK
from ocr_dataset_builder_ray.sources.pages import gen_row


def test_empty_html_sentinel():
    for payload in (b"", None):
        res = extract_document(payload)
        assert res["status"] == STATUS_EMPTY_HTML
        assert res["extracted_text"] == "" and res["n_spans"] == 0


def test_basic_page_keeps_content_drops_boilerplate():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body>"
        b"<header><nav><a href='/'>Home</a><a href='/b'>Blog</a></nav></header>"
        b"<main><h1>Big Heading Here</h1>"
        b"<p>This is the main paragraph with plenty of real content text.</p>"
        b"<pre>code block()</pre></main>"
        b"<footer><a href='/a'>About</a> | <a href='/c'>Contact</a></footer>"
        b"</body></html>"
    )
    res = extract_document(html)
    assert res["status"] == STATUS_OK
    text = res["extracted_text"]
    assert "Big Heading Here" in text
    assert "main paragraph" in text
    assert "code block()" in text
    assert "Home" not in text and "About" not in text  # nav/footer stripped
    assert "var x=1" not in text and "p{}" not in text  # script/style stripped
    kinds = [s["kind"] for s in res["spans"]]
    assert kinds == ["heading", "paragraph", "code"]


def test_span_offsets_index_extracted_text():
    html = (
        b"<html><body><h1>Heading one here</h1>"
        b"<p>First real paragraph with enough characters to keep.</p>"
        b"<p>Second real paragraph, also long enough to be kept.</p></body></html>"
    )
    res = extract_document(html)
    text = res["extracted_text"]
    assert res["n_spans"] == 3
    for span in res["spans"]:
        piece = text[span["start"] : span["end"]]
        assert piece and piece == piece.strip()
        assert "\n\n" not in piece
    # spans are ordered and non-overlapping with the \n\n joiner between
    for a, b in zip(res["spans"], res["spans"][1:]):
        assert b["start"] == a["end"] + 2


def test_link_dense_blocks_dropped():
    links = " ".join(f"<a href='/x{i}'>link number {i}</a>" for i in range(10))
    html = f"<html><body><p>{links}</p></body></html>".encode()
    res = extract_document(html)
    assert res["extracted_text"] == ""
    assert res["status"] == STATUS_OK  # link-only page: empty but ok (FIXTURES §1.10)


def test_short_noise_dropped_substantive_kept():
    html = (
        b"<html><body><p>ok</p>"
        b"<p>A substantive paragraph easily over the minimum length.</p>"
        b"</body></html>"
    )
    res = extract_document(html)
    assert res["extracted_text"].startswith("A substantive")
    assert res["n_spans"] == 1


def test_whitespace_normalization_applied_per_block():
    html = (
        b"<html><body><p>Line one  with   runs.\r\nSecond\rline mix."
        b"\t\tTabbed\tcells.\n\n\n\nAfter blanks.</p></body></html>"
    )
    res = extract_document(html)
    assert res["extracted_text"] == (
        "Line one with runs.\nSecond\nline mix. Tabbed cells.\nAfter blanks."
    )


def test_nfc_normalized_output():
    decomposed = "Café résumé plus enough text to keep around."
    html = f"<html><body><p>{decomposed}</p></body></html>".encode()
    res = extract_document(html)
    assert unicodedata.is_normalized("NFC", res["extracted_text"])
    assert "Café" in res["extracted_text"]


def test_malformed_html_never_raises():
    payloads = [
        b"<html><body><p>Truncated with stray < bracket <di",
        b"<p>unclosed paragraph with sufficient content to keep here",
        b"</div></p>>>><<<",
        b"\xff\xfe\x00garbage bytes not utf8 \x80\x81",
        b"<a <b <c nested < chaos",
    ]
    for p in payloads:
        res = extract_document(p)
        assert res["status"].startswith(("ok", "<<<"))


def test_exception_path_becomes_status_row(monkeypatch):
    import ocr_dataset_builder_ray.functions.html_extract as he

    class Boom(he._BlockParser):
        def feed(self, *_):
            raise RuntimeError("injected parser failure")

    monkeypatch.setattr(he, "_BlockParser", Boom)
    res = he.extract_document(b"<p>whatever</p>")
    assert res["status"].startswith("<<< EXTRACT_EXCEPTION:")
    assert "injected parser failure" in res["status"]


def test_kernel_deterministic_across_calls():
    for i in (0, 4, 6, 9, 10):
        html = gen_row(i)["html"]
        a, b = extract_document(html), extract_document(html)
        assert a == b


def test_revision_row_appends(monkeypatch):
    """FIXTURES §1.7: row 8 = row 6's content + one appended paragraph."""
    base = extract_document(gen_row(6)["html"])["extracted_text"]
    rev = extract_document(gen_row(8)["html"])["extracted_text"]
    assert rev.startswith(base)
    assert len(rev) > len(base)


def test_speaker_prefix_preserved():
    res = extract_document(gen_row(10)["html"])
    assert "Speaker1:" in res["extracted_text"]
    assert "Speaker4:" in res["extracted_text"]
