"""PDF/layout extraction: reading-order reconstruction from positioned
text lines (the north-star's "Tesseract/LLM-free layout heuristics for
PDF-embedded pages").

Reference analogue: the per-frame OCR map (`tesseract/processing.py:
53-99`) turns a rendered page image into text; here a *positioned-text*
page (what `pdftotext`/pdfminer emit: line boxes with coordinates)
is turned into reading-ordered paragraphs with pure geometry
heuristics — no ML, no external PDF library:

1. group lines into columns by x-interval overlap (sweep over sorted
   x-ranges; a line joins a column when horizontal overlap ≥ 50% of the
   narrower of the two);
2. order columns left→right by x-center, lines top→bottom within a
   column (y descending — PDF user space has y up);
3. merge hyphenated line breaks (``...-`` + lowercase continuation)
   and join remaining intra-paragraph breaks with a space;
4. split paragraphs on vertical gaps > 1.8× the column's median line
   pitch;
5. normalize each paragraph with the same byte-exact ``clean_text`` +
   NFC kernel as the HTML path, and emit the same
   ``extracted_text/spans/status`` layout (span kind ``pdf_paragraph``).

Real PDF *decoding* (bytes → positioned lines) is handled library-free
by ``functions/pdf_decode.py`` for the uncompressed/FlateDecode
text-object profile; PDFs outside that profile soft-fail with
STATUS_PDF_DECODE_UNAVAILABLE (M5), and the deterministic ``FAKE-PDF``
textual container below exercises the full layout path in tests and
benchmarks.
"""

from __future__ import annotations

import json
from statistics import median

from .textnorm import STATUS_OK, clean_text, nfc, status_exception

STATUS_PDF_DECODE_UNAVAILABLE = "<<< PDF_DECODE_UNAVAILABLE >>>"
STATUS_EMPTY_PDF = "<<< EXTRACT_FAILED_EMPTY_PDF >>>"

# Deterministic textual container for positioned lines, used by tests
# and the synthetic corpus: b"%FAKE-PDF\n" + one JSON object per line:
# {"page": int, "x0": f, "y0": f, "x1": f, "y1": f, "text": str}
FAKE_PDF_MAGIC = b"%FAKE-PDF\n"
PDF_MAGIC = b"%PDF-"

PARAGRAPH_GAP_FACTOR = 1.8
MIN_COLUMN_OVERLAP = 0.5


def decode_pdf_lines(payload: bytes) -> list[dict]:
    """bytes → positioned text lines.

    Real `%PDF-` payloads parse library-free for text objects behind
    any chain of the standard non-image stream filters (Flate, LZW,
    ASCIIHex, ASCII85, RunLength — ``functions/pdf_decode.py``);
    out-of-profile PDFs (DCT/CCITT image filters, CMap encodings,
    predictor-coded streams) surface as
    NotImplementedError, which ``extract_pdf_document`` soft-fails to
    the STATUS_PDF_DECODE_UNAVAILABLE sentinel per M5. The `%FAKE-PDF`
    container decodes deterministically.
    """
    if payload.startswith(FAKE_PDF_MAGIC):
        lines = []
        for raw in payload[len(FAKE_PDF_MAGIC) :].splitlines():
            if raw.strip():
                lines.append(json.loads(raw))
        return lines
    if payload.startswith(PDF_MAGIC):
        from .pdf_decode import UnsupportedPdfError, decode_real_pdf_lines

        try:
            return decode_real_pdf_lines(payload)
        except UnsupportedPdfError as e:
            raise NotImplementedError(
                f"PDF outside the minimal supported profile: {e}"
            ) from e
    raise ValueError("not a PDF payload")


def _overlap_frac(a0: float, a1: float, b0: float, b1: float) -> float:
    inter = min(a1, b1) - max(a0, b0)
    if inter <= 0:
        return 0.0
    return inter / max(1e-9, min(a1 - a0, b1 - b0))


def group_columns(lines: list[dict]) -> list[list[dict]]:
    """Cluster one page's lines into columns by x-interval overlap."""
    columns: list[dict] = []  # {"x0","x1","lines"}
    for ln in sorted(lines, key=lambda l: (l["x0"], -l["y0"])):
        placed = None
        for col in columns:
            if _overlap_frac(ln["x0"], ln["x1"], col["x0"], col["x1"]) >= MIN_COLUMN_OVERLAP:
                placed = col
                break
        if placed is None:
            columns.append({"x0": ln["x0"], "x1": ln["x1"], "lines": [ln]})
        else:
            placed["lines"].append(ln)
            placed["x0"] = min(placed["x0"], ln["x0"])
            placed["x1"] = max(placed["x1"], ln["x1"])
    columns.sort(key=lambda c: (c["x0"] + c["x1"]) / 2.0)
    return [c["lines"] for c in columns]


def _column_paragraphs(col_lines: list[dict]) -> list[str]:
    """Top-to-bottom lines of one column → paragraph strings."""
    ordered = sorted(col_lines, key=lambda l: (-l["y0"], l["x0"]))
    pitches = [
        ordered[i]["y0"] - ordered[i + 1]["y0"] for i in range(len(ordered) - 1)
    ]
    pitches = [p for p in pitches if p > 0]
    pitch = median(pitches) if pitches else 0.0
    paras: list[str] = []
    cur: list[str] = []
    prev_y = None
    for ln in ordered:
        text = ln["text"]
        if prev_y is not None and pitch > 0 and (prev_y - ln["y0"]) > PARAGRAPH_GAP_FACTOR * pitch:
            if cur:
                paras.append(_join_lines(cur))
            cur = []
        cur.append(text)
        prev_y = ln["y0"]
    if cur:
        paras.append(_join_lines(cur))
    return [p for p in paras if p]


def _join_lines(lines: list[str]) -> str:
    """Merge a paragraph's physical lines: de-hyphenate, else space-join."""
    out = ""
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        if not out:
            out = ln
        elif out.endswith("-") and ln[:1].islower():
            out = out[:-1] + ln  # soft hyphen at line break
        else:
            out = out + " " + ln
    return out


def extract_pdf_document(payload: bytes | None) -> dict:
    """One positioned-text payload → the engine's extracted layout.

    Output shape matches ``html_extract.extract_document`` exactly so
    the two extractors are interchangeable in the stage/kernel seam.
    Never raises.
    """
    if not payload:
        return {
            "extracted_text": "",
            "spans": [],
            "status": STATUS_EMPTY_PDF,
            "n_chars": 0,
            "n_spans": 0,
        }
    try:
        try:
            lines = decode_pdf_lines(payload)
        except NotImplementedError:
            return {
                "extracted_text": "",
                "spans": [],
                "status": STATUS_PDF_DECODE_UNAVAILABLE,
                "n_chars": 0,
                "n_spans": 0,
            }
        pages: dict[int, list[dict]] = {}
        for ln in lines:
            pages.setdefault(int(ln.get("page", 0)), []).append(ln)

        pieces: list[str] = []
        spans: list[dict] = []
        offset = 0
        for page in sorted(pages):
            for col_lines in group_columns(pages[page]):
                for para in _column_paragraphs(col_lines):
                    text = nfc(clean_text(para))
                    if not text:
                        continue
                    n = len(text)
                    if pieces:
                        offset += 2
                    spans.append(
                        {
                            "start": offset,
                            "end": offset + n,
                            "kind": "pdf_paragraph",
                            "text_density": float(n),
                            "link_density": 0.0,
                        }
                    )
                    pieces.append(text)
                    offset += n
        extracted = "\n\n".join(pieces)
        return {
            "extracted_text": extracted,
            "spans": spans,
            "status": STATUS_OK,
            "n_chars": len(extracted),
            "n_spans": len(spans),
        }
    except Exception as exc:  # poison payloads -> status rows (M5)
        return {
            "extracted_text": "",
            "spans": [],
            "status": status_exception(exc),
            "n_chars": 0,
            "n_spans": 0,
        }


def render_fake_pdf(
    paragraphs_per_column: list[list[str]],
    *,
    page: int = 0,
    chars_per_line: int = 38,
    line_pitch: float = 12.0,
    para_gap: float = 30.0,
    col_width: float = 250.0,
    col_gap: float = 40.0,
    top_y: float = 760.0,
) -> bytes:
    """Deterministic FAKE-PDF writer: columns of paragraphs → payload.

    Wraps each paragraph at ``chars_per_line`` with hyphenation when a
    word must split, lays columns left→right, lines top→bottom — the
    inverse of the extractor, used by tests/fixtures.
    """
    out = [FAKE_PDF_MAGIC.decode().rstrip("\n")]
    for ci, paragraphs in enumerate(paragraphs_per_column):
        x0 = 50.0 + ci * (col_width + col_gap)
        y = top_y
        for para in paragraphs:
            for ln in _wrap(para, chars_per_line):
                out.append(
                    json.dumps(
                        {
                            "page": page,
                            "x0": x0,
                            "y0": round(y, 1),
                            "x1": x0 + col_width,
                            "y1": round(y + 10.0, 1),
                            "text": ln,
                        },
                        separators=(",", ":"),
                    )
                )
                y -= line_pitch
            y -= para_gap - line_pitch
    return ("\n".join(out) + "\n").encode()


def _wrap(text: str, width: int) -> list[str]:
    words = text.split()
    lines: list[str] = []
    cur = ""
    for w in words:
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= width:
            cur = cur + " " + w
        elif len(w) > 8:
            # hyphenate long words only when the continuation starts
            # lowercase (keeps the de-hyphenation rule invertible)
            split_at = width - len(cur) - 2
            if split_at >= 3 and w[split_at:][:1].islower():
                lines.append(cur + " " + w[:split_at] + "-")
                cur = w[split_at:]
            else:
                lines.append(cur)
                cur = w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines
