"""Byte-exactness tests for the text-normalization kernel.

Table-driven cases mirror the reference's inline smoke tests
(tesseract/ocr_utils.py:59-87) with asserted (not printed) expectations,
plus a hypothesis property pinning the cleaning contract.
"""

from hypothesis import given
from hypothesis import strategies as st

from ocr_dataset_builder_ray.functions.textnorm import (
    STATUS_EMPTY_HTML,
    clean_text,
    nfc,
    status_exception,
)

CASES = [
    # (raw, expected) — cases 1-7 of tesseract/ocr_utils.py:59-87
    (
        "Line 1  with   extra spaces.\n\n\nLine 2 after triple newline.\r\n"
        "Line 3 with carriage return.\n\n\n\nLine 4 after even more newlines.",
        "Line 1 with extra spaces.\nLine 2 after triple newline.\n"
        "Line 3 with carriage return.\nLine 4 after even more newlines.",
    ),
    (
        "   Leading and trailing spaces   \n\nJust one blank line here.\nAnd   another   line.",
        "Leading and trailing spaces\nJust one blank line here.\nAnd another line.",
    ),
    ("LineA\nLineB\n\nLineC\n\n\nLineD", "LineA\nLineB\nLineC\nLineD"),
    ("", ""),
    ("   \n \n  \n   ", ""),
    ("Hello     World\nThis  is  a    test.", "Hello World\nThis is a test."),
    ("Line with\ttabs\tand  spaces.", "Line with tabs and spaces."),
    (None, ""),
    ("\rCR only\rlines\r", "CR only\nlines"),
]


def test_clean_text_table():
    for raw, expected in CASES:
        assert clean_text(raw) == expected, repr(raw)


@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=300))
def test_clean_text_properties(s):
    out = clean_text(s)
    # idempotent
    assert clean_text(out) == out
    # no blank lines, no leading/trailing whitespace per line, no [ \t] runs
    for line in out.split("\n") if out else []:
        assert line == line.strip() and line
        assert "  " not in line and "\t" not in line
    assert "\r" not in out


def test_nfc_byte_stable():
    decomposed = "Café"  # e + combining acute
    composed = "Café"
    assert nfc(decomposed) == composed
    assert nfc(composed) == composed
    assert nfc(nfc(decomposed)) == nfc(decomposed)


def test_sentinels():
    assert STATUS_EMPTY_HTML.startswith("<<<") and STATUS_EMPTY_HTML.endswith(">>>")
    assert "boom" in status_exception(ValueError("boom"))
