"""Property-based tests (hypothesis) for the invariants the engine's
determinism contract rests on."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_dataset_builder_ray.functions.html_extract import extract_document
from ocr_dataset_builder_ray.functions.layout_extract import extract_pdf_document
from ocr_dataset_builder_ray.functions.textnorm import clean_text, nfc
from ocr_dataset_builder_ray.stages.extract import dedup_table, extract_table

TEXT = st.text(max_size=400)


@given(TEXT)
@settings(max_examples=200)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once


@given(TEXT)
@settings(max_examples=200)
def test_clean_text_no_blank_lines_no_space_runs(s):
    out = clean_text(s)
    if out == "":
        return
    for line in out.split("\n"):
        assert line == line.strip()
        assert line != ""
        assert "  " not in line and "\t" not in line
    assert not out.startswith("\n") and not out.endswith("\n")


@given(TEXT)
@settings(max_examples=200)
def test_nfc_idempotent_and_normalized(s):
    out = nfc(s)
    assert unicodedata.is_normalized("NFC", out)
    assert nfc(out) == out


@given(st.binary(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_extract_document_total_and_deterministic(payload):
    a = extract_document(payload)
    b = extract_document(payload)
    assert a == b  # pure function of payload
    assert a["n_chars"] == len(a["extracted_text"])
    assert a["n_spans"] == len(a["spans"])
    for s in a["spans"]:
        piece = a["extracted_text"][s["start"] : s["end"]]
        assert len(piece) == s["end"] - s["start"]


@given(st.binary(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_extract_pdf_document_total(payload):
    res = extract_pdf_document(b"%FAKE-PDF\n" + payload)
    assert res["status"].startswith(("ok", "<<<"))
    assert res["n_chars"] == len(res["extracted_text"])


@given(st.permutations(list(range(8))))
@settings(max_examples=50, deadline=None)
def test_dedup_winner_invariant_under_row_order(perm):
    """The keep-latest winner must not depend on input row order."""
    import pyarrow as pa

    from ocr_dataset_builder_ray.sources.pages import gen_table
    from ocr_dataset_builder_ray.stages.extract import ExtractPages

    flat = ExtractPages()(gen_table(12))  # includes the url-6/7/8 dup group
    n = flat.num_rows
    order = [p % n for p in perm] + list(range(n))
    seen: set[int] = set()
    idx = [i for i in order if not (i in seen or seen.add(i))]
    shuffled = flat.take(pa.array(idx))
    a = dedup_table(flat).to_pydict()
    b = dedup_table(shuffled).to_pydict()
    key = lambda d: sorted(zip(d["url"], d["content_hash"]))  # noqa: E731
    assert key(a) == key(b)
