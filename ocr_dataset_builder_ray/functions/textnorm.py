"""Text normalization kernel — the byte-exactness core.

``clean_text`` reimplements, byte-for-byte, the semantics of the
reference's ``clean_tesseract_ocr`` (tesseract/ocr_utils.py:3-56):

1. normalize line endings (``\\r\\n`` / ``\\r`` -> ``\\n``),
2. strip each line (``str.strip`` — full Unicode whitespace),
3. drop lines that are empty after stripping,
4. collapse runs of spaces/tabs inside each line to one space,
5. join surviving lines with single newlines.

(The reference additionally collapses 3+ newlines to 2 and does a final
strip — both are no-ops after steps 3/5, which it acknowledges in its
own comments; we keep the equivalent minimal form and pin equivalence
with table-driven tests mirroring tesseract/ocr_utils.py:59-87.)

``nfc`` is the Unicode NFC normalization applied to every assembled
extraction output (BASELINE.json north_star: "NFC-normalized span
assembly"). Failure sentinels mirror tesseract/pipeline.py:87-92.
"""

from __future__ import annotations

import re
import unicodedata

# Failure-sentinel protocol (M5): extraction failures become status
# values on emitted rows — rows are never dropped, tasks never raised.
# Mirrors "<<< OCR_FAILED_EMPTY_TEXT >>>" / "<<< OCR_EXCEPTION: e >>>"
# at tesseract/pipeline.py:87,91.
STATUS_OK = "ok"
STATUS_EMPTY_HTML = "<<< EXTRACT_FAILED_EMPTY_HTML >>>"


def status_exception(exc: BaseException | str) -> str:
    return f"<<< EXTRACT_EXCEPTION: {exc} >>>"


_SPACE_TAB_RUN = re.compile(r"[ \t]+")


def clean_text(text: str | None) -> str:
    """Whitespace-normalize ``text`` per the reference cleaning contract.

    Byte-identical to ``clean_tesseract_ocr`` (tesseract/ocr_utils.py:3-56)
    on all inputs; pure and deterministic.
    """
    if not text:
        return ""
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    out = []
    for line in lines:
        line = line.strip()
        if line:
            if "\t" in line or "  " in line:  # sub is identity otherwise
                line = _SPACE_TAB_RUN.sub(" ", line)
            out.append(line)
    return "\n".join(out)


def nfc(text: str) -> str:
    """Unicode NFC normalization (byte-stable across platforms)."""
    return unicodedata.normalize("NFC", text)
