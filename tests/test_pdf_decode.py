"""Real-PDF text extraction: tokenizer/operator coverage, FlateDecode,
page attribution, layout integration, and flagship dispatcher routing.

Reference parity: the reference extracts page text from rendered
images via OCR (tesseract/processing.py:53-99); this engine's PDF path
parses the text objects directly (VERDICT r2 missing #2) and feeds the
same column/reading-order heuristics as the FAKE-PDF container."""

import numpy as np
import pytest

from ocr_dataset_builder_ray.functions.layout_extract import (
    STATUS_PDF_DECODE_UNAVAILABLE,
    extract_pdf_document,
)
from ocr_dataset_builder_ray.functions.pdf_decode import (
    UnsupportedPdfError,
    decode_real_pdf_lines,
    render_minimal_pdf,
)
from ocr_dataset_builder_ray.functions.textnorm import STATUS_OK


def _raw_pdf(content: bytes, flate: bool = False) -> bytes:
    import zlib

    body = zlib.compress(content) if flate else content
    head = b"<< /Length " + str(len(body)).encode() + (
        b" /Filter /FlateDecode >>" if flate else b" >>"
    )
    return (
        b"%PDF-1.4\n1 0 obj\n" + head + b"\nstream\n" + body + b"\nendstream\nendobj\n"
    )


def test_simple_text_positions():
    pdf = _raw_pdf(b"BT /F1 10 Tf 50 700 Td (Hello) Tj 0 -12 Td (World) Tj ET")
    lines = decode_real_pdf_lines(pdf)
    assert [(l["x0"], l["y0"], l["text"]) for l in lines] == [
        (50.0, 700.0, "Hello"),
        (50.0, 688.0, "World"),
    ]


def test_flate_equals_uncompressed():
    content = b"BT /F1 12 Tf 10 100 Td (same text) Tj ET"
    a = decode_real_pdf_lines(_raw_pdf(content))
    b = decode_real_pdf_lines(_raw_pdf(content, flate=True))
    assert a == b and a[0]["text"] == "same text"


def test_escapes_octal_hex():
    pdf = _raw_pdf(
        rb"BT /F1 10 Tf 0 0 Td (paren \( esc\) tab\t oct \101) Tj <48692100> Tj ET"
    )
    lines = decode_real_pdf_lines(pdf)
    assert lines[0]["text"] == "paren ( esc) tab\t oct A"
    assert lines[1]["text"] == "Hi!\x00"


def test_tj_array_and_tstar_leading():
    pdf = _raw_pdf(
        b"BT /F1 10 Tf 14 TL 5 50 Td [(Ker) -80 (ned)] TJ T* (next) Tj ET"
    )
    lines = decode_real_pdf_lines(pdf)
    assert lines[0]["text"] == "Kerned"
    assert lines[1]["text"] == "next"
    assert lines[1]["y0"] == pytest.approx(36.0)  # 50 - TL 14


def test_quote_operators_advance_line():
    pdf = _raw_pdf(b"BT /F1 10 Tf 12 TL 0 100 Td (a) Tj (b) ' (c) ' ET")
    lines = decode_real_pdf_lines(pdf)
    assert [l["text"] for l in lines] == ["a", "b", "c"]
    assert lines[1]["y0"] == pytest.approx(88.0)
    assert lines[2]["y0"] == pytest.approx(76.0)


def test_tm_sets_position():
    pdf = _raw_pdf(b"BT /F1 10 Tf 1 0 0 1 200 300 Tm (at tm) Tj ET")
    (line,) = decode_real_pdf_lines(pdf)
    assert (line["x0"], line["y0"]) == (200.0, 300.0)


def test_page_attribution_multi_page():
    pdf = render_minimal_pdf(
        [[(50, 700, "first page")], [(60, 650, "second page")]]
    )
    lines = decode_real_pdf_lines(pdf)
    assert {(l["page"], l["text"]) for l in lines} == {
        (0, "first page"),
        (1, "second page"),
    }


def test_unsupported_filter_raises():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 /Filter /DCTDecode >>\n"
        b"stream\nxxxxx\nendstream\nendobj\n"
    )
    with pytest.raises(UnsupportedPdfError):
        decode_real_pdf_lines(pdf)


def test_not_a_pdf_raises():
    with pytest.raises(UnsupportedPdfError):
        decode_real_pdf_lines(b"plain text")


# --- layout integration -----------------------------------------------------


def test_extract_pdf_document_real_pdf_byte_pinned():
    """A real %PDF- payload runs the SAME column/paragraph machinery as
    the FAKE-PDF container; output byte-pinned."""
    pdf = render_minimal_pdf(
        [
            [
                (50, 760, "The quick brown fox jumps over"),
                (50, 748, "the lazy dog near the river bank."),
                (50, 700, "A second paragraph follows after"),
                (50, 688, "a visible vertical gap."),
                (340, 760, "Right column text sits apart"),
                (340, 748, "and reads after the left column."),
            ]
        ]
    )
    doc = extract_pdf_document(pdf)
    assert doc["status"] == STATUS_OK
    assert doc["extracted_text"] == (
        "The quick brown fox jumps over the lazy dog near the river bank.\n\n"
        "A second paragraph follows after a visible vertical gap.\n\n"
        "Right column text sits apart and reads after the left column."
    )
    assert doc["n_spans"] == 3
    assert [s["kind"] for s in doc["spans"]] == ["pdf_paragraph"] * 3


def test_extract_pdf_document_unsupported_soft_fails():
    """Out-of-profile real PDFs keep the M5 sentinel contract."""
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 /Filter /DCTDecode >>\n"
        b"stream\nxxxxx\nendstream\nendobj\n"
    )
    doc = extract_pdf_document(pdf)
    assert doc["status"] == STATUS_PDF_DECODE_UNAVAILABLE
    assert doc["extracted_text"] == "" and doc["n_spans"] == 0


def test_flagship_dispatcher_routes_real_pdf(ray_session):
    """ExtractPages sees a %PDF- html payload and produces extracted
    text through the PDF path, alongside HTML rows."""
    import pyarrow as pa
    import ray.data

    from ocr_dataset_builder_ray.stages.extract import ExtractPages

    pdf = render_minimal_pdf([[(50, 700, "pdf body text here")]])
    rows = pa.table(
        {
            "url": ["https://a.example/pdf1", "https://a.example/h1"],
            "warc_ts": np.array([1, 2], dtype="datetime64[us]"),
            "html": [
                pdf,
                b"<html><body><p>html body text long enough to pass the "
                b"text-density boilerplate classifier with room to spare "
                b"because short fragments are treated as chrome</p>"
                b"</body></html>",
            ],
            "lang": ["en", "en"],
        }
    )
    out = (
        ray.data.from_arrow(rows)
        .map_batches(ExtractPages, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .set_index("url")
    )
    assert out.loc["https://a.example/pdf1", "extracted_text"] == "pdf body text here"
    assert out.loc["https://a.example/pdf1", "status"] == STATUS_OK
    assert "html body text" in out.loc["https://a.example/h1", "extracted_text"]


# --- stream filter chains (VERDICT r3 missing #2) ----------------------------


def _chain_pdf(content: bytes, filters: tuple[str, ...]) -> bytes:
    from ocr_dataset_builder_ray.functions.pdf_decode import _encode_stream

    body = _encode_stream(content, filters)
    names = "".join(f"/{f}" for f in filters)
    chain = f"[{names}]" if len(filters) > 1 else names
    head = (
        b"<< /Length "
        + str(len(body)).encode()
        + b" /Filter "
        + chain.encode()
        + b" >>"
    )
    return (
        b"%PDF-1.4\n1 0 obj\n"
        + head
        + b"\nstream\n"
        + body
        + b"\nendstream\nendobj\n"
    )


CONTENT = b"BT /F1 10 Tf 50 700 Td (filtered text!) Tj ET"


@pytest.mark.parametrize(
    "filters",
    [
        ("ASCIIHexDecode",),
        ("ASCII85Decode",),
        ("RunLengthDecode",),
        ("LZWDecode",),
        ("ASCIIHexDecode", "FlateDecode"),
        ("ASCII85Decode", "LZWDecode"),
        ("RunLengthDecode", "FlateDecode"),
    ],
)
def test_filter_chains_decode(filters):
    lines = decode_real_pdf_lines(_chain_pdf(CONTENT, filters))
    assert [(l["x0"], l["y0"], l["text"]) for l in lines] == [
        (50.0, 700.0, "filtered text!")
    ]


def test_ascii_hex_hand_fixture():
    """Hand-written hex stream: whitespace ignored, '>' terminates,
    odd final nibble pads with 0."""
    from ocr_dataset_builder_ray.functions.pdf_decode import _ascii_hex_decode

    assert _ascii_hex_decode(b"48 65\n6c6C 6f>garbage") == b"Hello"
    assert _ascii_hex_decode(b"7>") == b"\x70"


def test_run_length_hand_fixture():
    from ocr_dataset_builder_ray.functions.pdf_decode import _run_length_decode

    # literal "AB", repeat 'C' x3 (257-254), EOD, trailing ignored
    assert _run_length_decode(bytes([1, 65, 66, 254, 67, 128, 9, 9])) == b"ABCCC"


def test_lzw_hand_fixture():
    """Hand-packed 9-bit code stream for b'AAA': CLEAR(256), 65,
    258 ('AA' from the just-added entry), EOD(257) ->
    bits 100000000 001000001 100000010 100000001 + pad."""
    from ocr_dataset_builder_ray.functions.pdf_decode import (
        _lzw_decode,
        _lzw_encode,
    )

    packed = bytes([0x80, 0x10, 0x60, 0x50, 0x10])
    assert _lzw_decode(packed) == b"AAA"
    assert _lzw_encode(b"AAA") == packed


def test_lzw_roundtrip_long_text():
    """LZW round-trips data long enough to cross the 9->10->11 bit
    width boundaries (table > 1022 entries) incl. the KwKwK case."""
    from ocr_dataset_builder_ray.functions.pdf_decode import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.RandomState(7)
    words = [b"stream", b"filter", b"pdf", b"text", b"ray", b"arrow"]
    data = b" ".join(words[i] for i in rng.randint(0, len(words), 4000))
    assert _lzw_decode(_lzw_encode(data)) == data
    kwkwk = b"abababababab" * 10  # classic KwKwK pattern
    assert _lzw_decode(_lzw_encode(kwkwk)) == kwkwk


def test_render_minimal_pdf_filter_chains():
    """The fixture writer emits /Filter chains the decoder reads back,
    page attribution intact."""
    pages = [[(72.0, 700.0, "page one line")], [(72.0, 680.0, "page two line")]]
    for filters in (("LZWDecode",), ("ASCIIHexDecode", "LZWDecode")):
        pdf = render_minimal_pdf(pages, filters=filters)
        lines = decode_real_pdf_lines(pdf)
        assert [(l["page"], l["text"]) for l in lines] == [
            (0, "page one line"),
            (1, "page two line"),
        ]


def _png_predict(data: bytes, columns: int, filters=(0, 1, 2)) -> bytes:
    """Forward PNG row filtering (encoder side, test-only): pad to the
    column stride, rotate through the given per-row filter types."""
    pad = (-len(data)) % columns
    data = data + b" " * pad
    rows = [data[i : i + columns] for i in range(0, len(data), columns)]
    out = bytearray()
    prev = bytes(columns)
    for y, row in enumerate(rows):
        f = filters[y % len(filters)]
        out.append(f)
        if f == 0:  # None
            out.extend(row)
        elif f == 1:  # Sub (bpp=1)
            left = 0
            for b in row:
                out.append((b - left) & 0xFF)
                left = b
        else:  # Up
            out.extend((b - p) & 0xFF for b, p in zip(row, prev))
        prev = row
    return bytes(out)


def test_png_predictor_streams_decode():
    """A FlateDecode content stream behind /Predictor 12 (PNG Up, with
    per-row None/Sub/Up variety) must yield the same text lines as the
    plain stream; TIFF /Predictor 2 likewise."""
    import zlib

    ops = b"BT /F1 12 Tf 72 700 Td (predicted hello) Tj 0 -20 Td (line two) Tj ET"
    def _pdf(head_extra, body):
        return (
            b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Length " + str(len(body)).encode() + head_extra
            + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
        )

    plain = _pdf(b"", ops)
    want = decode_real_pdf_lines(plain)
    assert [ln["text"] for ln in want] == ["predicted hello", "line two"]

    body = zlib.compress(_png_predict(ops, 16))
    png_pdf = _pdf(
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >>",
        body,
    )
    got = decode_real_pdf_lines(png_pdf)
    assert [ln["text"] for ln in got] == [ln["text"] for ln in want]

    # TIFF predictor 2: horizontal differencing, colors=1 → per-row
    # prefix-diff with no filter bytes
    cols = 16
    padded = ops + b" " * ((-len(ops)) % cols)
    diffed = bytearray()
    for i in range(0, len(padded), cols):
        row = padded[i : i + cols]
        left = 0
        for b in row:
            diffed.append((b - left) & 0xFF)
            left = b
    body2 = zlib.compress(bytes(diffed))
    tiff_pdf = _pdf(
        b" /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 16 >>",
        body2,
    )
    got2 = decode_real_pdf_lines(tiff_pdf)
    assert [ln["text"] for ln in got2] == [ln["text"] for ln in want]


def test_predictor_malformed_raises():
    """Bad predictor geometry (data not a multiple of the row stride)
    raises UnsupportedPdfError rather than corrupting silently."""
    import zlib

    body = zlib.compress(b"\x00abc")  # 4 bytes: not a multiple of 1+16
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 16 >> >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(UnsupportedPdfError):
        decode_real_pdf_lines(pdf)
    with pytest.raises(UnsupportedPdfError):  # predictor 3-9: undefined
        decode_real_pdf_lines(pdf.replace(b"/Predictor 12", b"/Predictor 5"))


def test_pdf_stream_bomb_rejected():
    """A FlateDecode content stream inflating past the 64 MiB profile
    bound must raise UnsupportedPdfError at the bound, not inflate to
    completion (M5 size hostility)."""
    import zlib

    body = zlib.compress(b" BT (x) Tj ET " + b"\x00" * (128 * 1024 * 1024))
    bomb = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + body
        + b"\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(UnsupportedPdfError, match="size profile"):
        decode_real_pdf_lines(bomb)


def test_pdf_arbitrary_corruption_only_raises_unsupported():
    import random

    payload = render_minimal_pdf(
        [[(72, 700, "hello world")], [(72, 650, "page two")]],
        filters=("FlateDecode",),
    )
    rnd = random.Random(3)
    cases = [payload[:c] for c in range(5, len(payload), len(payload) // 40)]
    for _ in range(200):
        i = rnd.randrange(5, len(payload))
        cases.append(payload[:i] + bytes([rnd.randrange(256)]) + payload[i + 1:])
    for q in cases:
        try:
            decode_real_pdf_lines(q)
        except UnsupportedPdfError:
            pass


def _tounicode_pdf(cmap_src: bytes, content: bytes) -> bytes:
    """One page, one font (/F1 -> ToUnicode stream), one content
    stream — hand-assembled with classic refs."""
    objs = [
        b"<< /Type /Page /Contents 2 0 R /Resources << /Font << /F1 3 0 R >> >> >>",
        None,  # content, built below
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 4 0 R >>",
        None,  # cmap stream
    ]
    out = bytearray(b"%PDF-1.4\n")
    bodies = {
        1: (objs[0], None),
        2: (b"<< /Length " + str(len(content)).encode() + b" >>", content),
        3: (objs[2], None),
        4: (b"<< /Length " + str(len(cmap_src)).encode() + b" >>", cmap_src),
    }
    for num, (head, stream) in bodies.items():
        out += b"%d 0 obj\n" % num + head
        if stream is not None:
            out += b"\nstream\n" + stream + b"\nendstream"
        out += b"\nendobj\n"
    out += b"%%EOF"
    return bytes(out)


def test_tounicode_single_byte_bfchar_bfrange():
    """1-byte codes remapped to Greek: bfchar for 'A', bfrange for
    a-z; codes outside the map keep latin-1 semantics."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <0391>\nendbfchar\n"
        b"1 beginbfrange\n<61> <7A> <03B1>\nendbfrange\n"
        b"endcmap\n"
    )
    pdf = _tounicode_pdf(cmap, b"BT /F1 12 Tf 72 700 Td (Aab z!) Tj ET")
    (line,) = decode_real_pdf_lines(pdf)
    # A->Alpha, a->alpha, b->beta, z->alpha+25 (U+03CA), unmapped
    # space/'!' pass through as latin-1
    assert line["text"] == "Ααβ ϊ!"


def test_tounicode_two_byte_identity_h():
    """2-byte codespace (Identity-H subset font): hex show strings map
    code pairs through bfchar; multi-char destination expands a
    ligature."""
    cmap = (
        b"begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"3 beginbfchar\n"
        b"<0001> <0048>\n"   # -> H
        b"<0002> <0069>\n"   # -> i
        b"<0003> <00660066>\n"  # -> ff ligature, decomposed
        b"endbfchar\n"
    )
    pdf = _tounicode_pdf(cmap, b"BT /F1 12 Tf 72 700 Td <000100020003> Tj ET")
    (line,) = decode_real_pdf_lines(pdf)
    assert line["text"] == "Hiff"


def test_tounicode_bfrange_array_form():
    """bfrange with an explicit destination array (one dst per code)."""
    cmap = (
        b"begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfrange\n<41> <43> [<0058> <0059> <005A>]\nendbfrange\n"
    )
    pdf = _tounicode_pdf(cmap, b"BT /F1 12 Tf 0 0 Td (ABC) Tj ET")
    (line,) = decode_real_pdf_lines(pdf)
    assert line["text"] == "XYZ"


def test_tounicode_font_switch_and_default():
    """Tf switching between a mapped font and an unmapped one flips
    the mapping on and off mid-stream."""
    cmap = (
        b"begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<78> <0416>\nendbfchar\n"  # x -> Zhe
    )
    content = (
        b"BT /F1 12 Tf 72 700 Td (xx) Tj /F9 12 Tf 0 -20 Td (xx) Tj ET"
    )
    pdf = _tounicode_pdf(cmap, content)
    lines = decode_real_pdf_lines(pdf)
    assert [ln["text"] for ln in lines] == ["ЖЖ", "xx"]


def _objstm_pdf() -> bytes:
    """PDF-1.5-style fixture: the page and font dicts live inside a
    FlateDecode /ObjStm (with a ToUnicode CMap resolving through it);
    only the content and CMap streams are classic top-level objects."""
    import zlib

    page = b"<< /Type /Page /Contents 4 0 R /Resources << /Font << /F1 2 0 R >> >> >>"
    font = b"<< /Type /Font /ToUnicode 5 0 R >>"
    embedded = page + b" " + font
    header = b"1 0 2 " + str(len(page) + 1).encode()
    first = len(header) + 1
    objstm_data = header + b"\n" + embedded
    objstm = zlib.compress(objstm_data)
    cmap = (
        b"begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<51> <0051> \nendbfchar\n"
        b"1 beginbfrange\n<61> <7A> <0041>\nendbfrange\n"  # lower->UPPER
    )
    content = b"BT /F1 12 Tf 72 700 Td (Qobjstm works) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    for num, head, stream in [
        (3, b"<< /Type /ObjStm /N 2 /First " + str(first).encode()
            + b" /Length " + str(len(objstm)).encode()
            + b" /Filter /FlateDecode >>", objstm),
        (4, b"<< /Length " + str(len(content)).encode() + b" >>", content),
        (5, b"<< /Length " + str(len(cmap)).encode() + b" >>", cmap),
    ]:
        out += b"%d 0 obj\n" % num + head
        if stream is not None:
            out += b"\nstream\n" + stream + b"\nendstream"
        out += b"\nendobj\n"
    out += b"%%EOF"
    return bytes(out)


def test_object_stream_pdf_decodes():
    lines = decode_real_pdf_lines(_objstm_pdf())
    # Q maps via bfchar, a-z via bfrange to A-Z, space is unmapped latin-1.
    assert [ln["text"] for ln in lines] == ["QOBJSTM WORKS"]


def test_objstm_corruption_only_raises_unsupported():
    """Same M5 hostile-bytes contract as the classic-PDF fuzz pin, over
    the /ObjStm expansion path: truncations and single-byte flips must
    decode, or raise UnsupportedPdfError — never leak another exception
    type, hang, or over-allocate."""
    import random

    payload = _objstm_pdf()
    rnd = random.Random(7)
    cases = [payload[:c] for c in range(5, len(payload), len(payload) // 40)]
    for _ in range(300):
        i = rnd.randrange(5, len(payload))
        cases.append(payload[:i] + bytes([rnd.randrange(256)]) + payload[i + 1:])
    for q in cases:
        try:
            decode_real_pdf_lines(q)
        except UnsupportedPdfError:
            pass
