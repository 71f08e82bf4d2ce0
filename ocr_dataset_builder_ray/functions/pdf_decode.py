"""Minimal real-PDF text extraction: ``%PDF-`` bytes → positioned lines.

The flagship dispatcher routes PDF payloads to the layout extractor
(``layout_extract.extract_pdf_document``), whose geometry heuristics
need ``{"page", "x0", "y0", "x1", "y1", "text"}`` line boxes — what
pdftotext/pdfminer would emit. This module produces those boxes for
the profile VERDICT r2 names (missing #2): uncompressed or FlateDecode
content streams with standard text objects. No external PDF library;
zlib is stdlib.

Supported surface (everything else raises UnsupportedPdfError, which
the layout extractor soft-fails per M5):

* classic cross-reference PDFs — objects located by scanning for
  ``N G obj`` ... ``endobj`` (no xref table walk: fixtures and the vast
  majority of linearized single-revision files resolve identically,
  and a scan survives mildly damaged xrefs that would kill a strict
  parser);
* content streams stored uncompressed or behind any chain of the
  standard non-image filters — ``/FlateDecode``, ``/LZWDecode``,
  ``/ASCIIHexDecode``, ``/ASCII85Decode``, ``/RunLengthDecode`` —
  applied in array order (VERDICT r3 missing #2), with
  ``/DecodeParms`` predictors undone after decompression (PNG row
  filters via the PNG codec's unfilter, TIFF horizontal differencing
  for 8-bit samples);
* text operators: BT/ET blocks, Tm/Td/TD/T*/TL positioning, Tf
  font+size tracking, Tj / ' / " and TJ (kern offsets ignored) show
  operators, literal ``(...)`` strings with escapes + octal and hex
  ``<...>`` strings;
* ``/ToUnicode`` CMaps per page font (codespacerange 1-2 byte codes,
  bfchar, bfrange incl. array destinations) — subset/Identity-H fonts
  extract real Unicode; fonts without one keep latin-1 byte semantics.
  CID font programs themselves are never parsed (glyph metrics out of
  scope);
* page attribution via ``/Type /Page`` objects' ``/Contents``
  references, in object order; content streams referenced by no page
  object land on page 0 (fixture-friendly fallback).

Each Tj-style show op emits one line box at the current text-space
position; x1 approximates width as ``0.5 × size`` per character —
enough for the column-overlap clustering the layout extractor runs,
exact metrics would need font programs.
"""

from __future__ import annotations

import re
import zlib


class UnsupportedPdfError(ValueError):
    """PDF uses features outside the minimal supported profile."""


# per-stream decoded-size cap: a text content stream is kilobytes in
# practice; anything larger is a decompression bomb, not a document a
# 100-TB run should spend a worker's heap on
_MAX_STREAM_BYTES = 1 << 26  # 64 MiB


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
# the /Filter value: a single name or an array of names, in order
_FILTER_VAL_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")


def _parse_objects(payload: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """→ {obj_num: (dict_and_body_bytes, stream_bytes_or_None)}."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(payload):
        num = int(m.group(1))
        end = payload.find(b"endobj", m.end())
        if end < 0:
            continue
        body = payload[m.end() : end]
        stream = None
        sm = _STREAM_RE.search(body)
        if sm:
            se = body.find(b"endstream", sm.end())
            if se < 0:
                raise UnsupportedPdfError("unterminated stream")
            stream = body[sm.end() : se]
            # trailing EOL before endstream is not stream data
            if stream.endswith(b"\r\n"):
                stream = stream[:-2]
            elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                stream = stream[:-1]
            body = body[: sm.start()]
        objects[num] = (body, stream)
    if not objects:
        raise UnsupportedPdfError("no PDF objects found")
    _expand_object_streams(objects)
    return objects


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _expand_object_streams(
    objects: dict[int, tuple[bytes, bytes | None]]
) -> None:
    """Inline the objects stored inside /Type /ObjStm compressed
    object streams (PDF 1.5+ puts page and font DICTS there, with only
    content streams left as classic top-level objects). The stream
    starts with N (objnum, offset) integer pairs; offsets are relative
    to /First. Embedded objects never carry streams. Top-level objects
    win on number collision (a later revision shadows the ObjStm)."""
    for num in sorted(objects):
        body, stream = objects[num]
        if stream is None or _OBJSTM_RE.search(body) is None:
            continue
        nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
        if nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        if n <= 0 or n > 100000:
            raise UnsupportedPdfError("object stream /N out of profile")
        try:
            data = _decode_stream(body, stream)
        except UnsupportedPdfError:
            continue  # undecodable container: its objects stay missing
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = []
        try:
            for i in range(n):
                pairs.append((int(header[2 * i]), int(header[2 * i + 1])))
        except ValueError:
            continue
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(data) - first
            if off < 0 or end < off:
                continue
            objects.setdefault(onum, (data[first + off : first + end], None))


def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hexstr = b"".join(data.split())
    if len(hexstr) % 2:  # odd final nibble: pad with 0 per spec
        hexstr += b"0"
    try:
        return bytes.fromhex(hexstr.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise UnsupportedPdfError(f"bad ASCIIHexDecode stream: {e}") from e


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    data = b"".join(data.split())
    if data.endswith(b"~>"):
        data = data[:-2]
    try:  # adobe framing handles the 'z' zero-group shortcut
        return base64.a85decode(b"<~" + data + b"~>", adobe=True)
    except ValueError as e:
        raise UnsupportedPdfError(f"bad ASCII85Decode stream: {e}") from e


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:  # EOD
            break
        if length < 128:  # literal run of length+1 bytes
            if i + length + 1 > n:
                raise UnsupportedPdfError("truncated RunLengthDecode literal")
            out += data[i : i + length + 1]
            i += length + 1
        else:  # repeat next byte 257-length times
            if i >= n:
                raise UnsupportedPdfError("truncated RunLengthDecode repeat")
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """PDF LZWDecode: variable 9-12 bit codes packed MSB-first, clear
    code 256, EOD 257, EarlyChange=1 (code width grows one code early,
    the PDF default)."""
    table: dict[int, bytes] = {}
    code_width = 9
    next_code = 258
    prev: bytes | None = None
    out = bytearray()
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= code_width:
            code = (bitbuf >> (nbits - code_width)) & ((1 << code_width) - 1)
            nbits -= code_width
            if code == 256:  # clear table
                table.clear()
                code_width, next_code, prev = 9, 258, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise UnsupportedPdfError("LZW stream starts mid-table")
                entry = bytes([code])
            elif code < 256:
                entry = bytes([code])
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise UnsupportedPdfError(f"bad LZW code {code}")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # EarlyChange=1: widen when the NEXT code would not fit
                if next_code >= (1 << code_width) - 1 and code_width < 12:
                    code_width += 1
            out += entry
            prev = entry
            if len(out) > _MAX_STREAM_BYTES:
                raise UnsupportedPdfError("LZW stream exceeds size profile")
    raise UnsupportedPdfError("LZW stream missing EOD")


_STREAM_FILTERS = {
    b"FlateDecode": None,  # handled inline for the error message
    b"Fl": None,
    b"LZWDecode": _lzw_decode,
    b"LZW": _lzw_decode,
    b"ASCIIHexDecode": _ascii_hex_decode,
    b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode,
    b"A85": _ascii85_decode,
    b"RunLengthDecode": _run_length_decode,
    b"RL": _run_length_decode,
}


def _apply_predictor(
    data: bytes, predictor: int, colors: int, bits: int, columns: int
) -> bytes:
    """Undo /DecodeParms predictors: 2 = TIFF horizontal differencing
    (8-bit), >= 10 = PNG row filters (reuses the PNG codec's unfilter;
    the predictor value only declares the default filter — each row's
    leading byte picks its actual one, per the PDF spec)."""
    import numpy as np

    if predictor == 2:
        if bits != 8:
            raise UnsupportedPdfError("TIFF predictor requires 8-bit samples")
        stride = colors * columns
        if stride <= 0 or len(data) % stride:
            raise UnsupportedPdfError("TIFF predictor data length mismatch")
        rows = np.frombuffer(data, np.uint8).reshape(-1, columns, colors)
        return (
            np.cumsum(rows.astype(np.uint32), axis=1).astype(np.uint8).tobytes()
        )
    if predictor >= 10:
        from .png_codec import _unfilter

        stride = (colors * bits * columns + 7) // 8
        bpp = max(1, colors * bits // 8)
        if stride <= 0 or len(data) % (1 + stride):
            raise UnsupportedPdfError("PNG predictor data length mismatch")
        n_rows = len(data) // (1 + stride)
        raw = np.frombuffer(data, np.uint8)
        from .media_codecs import UnsupportedMediaError

        try:
            return _unfilter(raw, n_rows, stride, bpp).tobytes()
        except UnsupportedMediaError as e:
            raise UnsupportedPdfError(f"bad PNG predictor row: {e}") from e
    raise UnsupportedPdfError(f"unsupported /Predictor {predictor}")


_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BITSPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    fm = _FILTER_VAL_RE.search(head)
    if fm is None:
        if b"/Filter" in head:
            raise UnsupportedPdfError("unparseable /Filter value")
        return stream
    pm = _PREDICTOR_RE.search(head)
    predictor = int(pm.group(1)) if pm else 1
    for name in _FILTER_NAME_RE.findall(fm.group(1)):
        if name in (b"FlateDecode", b"Fl"):
            try:
                d = zlib.decompressobj()
                stream = d.decompress(stream, _MAX_STREAM_BYTES + 1)
            except zlib.error as e:
                raise UnsupportedPdfError(f"bad FlateDecode stream: {e}") from e
            if len(stream) > _MAX_STREAM_BYTES:
                raise UnsupportedPdfError("decoded stream exceeds size profile")
        elif name in _STREAM_FILTERS:
            stream = _STREAM_FILTERS[name](stream)
        else:
            raise UnsupportedPdfError(
                f"unsupported stream filter /{name.decode('ascii', 'replace')}"
            )
        if predictor > 1 and name in (
            b"FlateDecode", b"Fl", b"LZWDecode", b"LZW",
        ):
            # DecodeParms belong to the compression filter; apply once,
            # right after it (single-parms profile)
            colors = int(m.group(1)) if (m := _COLORS_RE.search(head)) else 1
            bits = int(m.group(1)) if (m := _BITSPC_RE.search(head)) else 8
            cols = int(m.group(1)) if (m := _COLUMNS_RE.search(head)) else 1
            stream = _apply_predictor(stream, predictor, colors, bits, cols)
            predictor = 1
    return stream


def _unescape_literal(raw: bytes) -> str:
    """PDF literal-string body (between parens) → text, latin-1 bytes."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        if e in b"nrtbf":
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
            i += 1
        elif e in b"()\\":
            out.append(e)
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            oct_digits = bytearray()
            while i < n and len(oct_digits) < 3 and 0x30 <= raw[i] <= 0x37:
                oct_digits.append(raw[i])
                i += 1
            out.append(int(oct_digits.decode(), 8) & 0xFF)
        elif e in (10, 13):  # line continuation
            i += 1
            if e == 13 and i < n and raw[i] == 10:
                i += 1
        else:
            out.append(e)
            i += 1
    return out.decode("latin-1")


def _tokenize_content(data: bytes):
    """Content-stream tokens: ('str', text) | ('num', float) |
    ('name', bytes) | ('op', bytes) | ('arr_open'/'arr_close', None)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"%":  # comment to EOL
            while i < n and data[i] not in (10, 13):
                i += 1
        elif c == b"(":
            depth, j = 1, i + 1
            while j < n and depth:
                cj = data[j]
                if cj == 0x5C:
                    j += 2
                    continue
                if cj == 0x28:
                    depth += 1
                elif cj == 0x29:
                    depth -= 1
                j += 1
            yield ("str", _unescape_literal(data[i + 1 : j - 1]))
            i = j
        elif c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i)
            if j < 0:
                raise UnsupportedPdfError("unterminated hex string")
            hx = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode()).decode("latin-1"))
            i = j + 1
        elif data[i : i + 2] == b"<<":
            yield ("op", b"<<")
            i += 2
        elif data[i : i + 2] == b">>":
            yield ("op", b">>")
            i += 2
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and data[j : j + 1] not in b" \t\r\n()<>[]{}/%" :
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
        else:
            m = _NUM_RE.match(data, i)
            if m and m.start() == i:
                yield ("num", float(m.group()))
                i = m.end()
            else:
                j = i
                while j < n and data[j : j + 1] not in b" \t\r\n()<>[]{}/%" :
                    j += 1
                if j == i:
                    i += 1  # stray delimiter
                    continue
                yield ("op", data[i:j])
                i = j


# --- /ToUnicode CMaps (subset-font text without font programs) --------------

_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f\s]+)>")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_BFRANGE_ENTRY_RE = re.compile(
    rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f\s]+>)"
)
_MAX_CMAP_ENTRIES = 1 << 20  # hostile-CMap expansion bound


def _utf16_hex(hx: bytes) -> str:
    clean = re.sub(rb"\s", b"", hx)
    if len(clean) % 2:
        clean += b"0"
    return bytes.fromhex(clean.decode("ascii")).decode("utf-16-be", "replace")


class _CMap:
    """A /ToUnicode mapping: fixed code width (from codespacerange),
    bfchar singles, bfrange bases (last UTF-16 unit increments)."""

    __slots__ = ("code_bytes", "single", "ranges")

    def __init__(self) -> None:
        self.code_bytes = 1
        self.single: dict[int, str] = {}
        self.ranges: list[tuple[int, int, str]] = []

    def _lookup(self, code: int) -> str:
        hit = self.single.get(code)
        if hit is not None:
            return hit
        for lo, hi, base in self.ranges:
            if lo <= code <= hi:
                if not base:
                    return ""
                last = ord(base[-1]) + (code - lo)
                if last > 0x10FFFF or 0xD800 <= last <= 0xDFFF:
                    return "�"
                return base[:-1] + chr(last)
        if 0xD800 <= code <= 0xDFFF or code > 0x10FFFF:
            return "�"
        return chr(code)  # unmapped 1-byte codes keep latin-1 semantics

    def map_string(self, s: str) -> str:
        bs = s.encode("latin-1", "replace")
        cb = self.code_bytes
        out = []
        full = len(bs) - len(bs) % cb
        for i in range(0, full, cb):
            out.append(self._lookup(int.from_bytes(bs[i : i + cb], "big")))
        for b in bs[full:]:  # trailing partial code: keep raw
            out.append(chr(b))
        return "".join(out)


def _parse_tounicode(src: bytes) -> _CMap:
    cm = _CMap()
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", src, re.S)
    if m:
        h = _HEXTOK_RE.search(m.group(1))
        if h:
            cm.code_bytes = max(1, min(2, len(re.sub(rb"\s", b"", h.group(1))) // 2))
    for sec in re.findall(rb"beginbfchar(.*?)endbfchar", src, re.S):
        toks = _HEXTOK_RE.findall(sec)
        for a, b in zip(toks[0::2], toks[1::2]):
            if len(cm.single) >= _MAX_CMAP_ENTRIES:
                raise UnsupportedPdfError("CMap exceeds size profile")
            cm.single[int(re.sub(rb"\s", b"", a), 16)] = _utf16_hex(b)
    for sec in re.findall(rb"beginbfrange(.*?)endbfrange", src, re.S):
        for em in _BFRANGE_ENTRY_RE.finditer(sec):
            lo = int(re.sub(rb"\s", b"", em.group(1)), 16)
            hi = int(re.sub(rb"\s", b"", em.group(2)), 16)
            dst = em.group(3)
            if hi < lo:
                continue
            if dst.startswith(b"["):  # explicit per-code destinations
                dsts = _HEXTOK_RE.findall(dst)
                if len(cm.single) + len(dsts) > _MAX_CMAP_ENTRIES:
                    raise UnsupportedPdfError("CMap exceeds size profile")
                for off, d in enumerate(dsts):
                    if lo + off > hi:
                        break
                    cm.single[lo + off] = _utf16_hex(d)
            else:
                if len(cm.ranges) >= 10000:
                    raise UnsupportedPdfError("CMap exceeds size profile")
                base = _HEXTOK_RE.search(dst)
                if base is None:
                    continue
                cm.ranges.append((lo, hi, _utf16_hex(base.group(1))))
    return cm


def _dict_region_after(body: bytes, key_re: bytes) -> bytes | None:
    """The balanced << ... >> region following the first match of
    ``key_re``, or None."""
    m = re.search(key_re, body)
    if m is None:
        return None
    j = body.find(b"<<", m.end())
    if j < 0:
        return None
    depth, k, n = 0, j, len(body)
    while k < n - 1:
        two = body[k : k + 2]
        if two == b"<<":
            depth += 1
            k += 2
        elif two == b">>":
            depth -= 1
            k += 2
            if depth == 0:
                return body[j:k]
        else:
            k += 1
    return None


def _page_fonts(page_body: bytes, objects) -> dict[bytes, _CMap]:
    """Font resource name → _CMap for every page font carrying a
    /ToUnicode stream (by-reference fonts; fonts without one keep
    latin-1 byte semantics)."""
    res = page_body
    rm = _RESOURCES_REF_RE.search(page_body)
    if rm:
        ref = objects.get(int(rm.group(1)))
        if ref is not None:
            res = ref[0]
    region = _dict_region_after(res, rb"/Font(?![A-Za-z])")
    fonts: dict[bytes, _CMap] = {}
    if region is None:
        return fonts
    for fm in _FONT_REF_RE.finditer(region):
        fobj = objects.get(int(fm.group(2)))
        if fobj is None:
            continue
        tm = _TOUNICODE_RE.search(fobj[0])
        if tm is None:
            continue
        tobj = objects.get(int(tm.group(1)))
        if tobj is None or tobj[1] is None:
            continue
        try:
            fonts[fm.group(1)] = _parse_tounicode(_decode_stream(tobj[0], tobj[1]))
        except UnsupportedPdfError:
            continue  # unparseable CMap: font stays latin-1
    return fonts


def _extract_stream_lines(
    data: bytes, page: int, fonts: dict[bytes, _CMap] | None = None
) -> list[dict]:
    """One decoded content stream → positioned line boxes."""
    fonts = fonts or {}
    cmap: _CMap | None = None
    lines: list[dict] = []
    in_text = False
    # text state: tm holds (a b c d e f); we track only e,f (translation)
    # and approximate glyph size from Tf / Tm d-scale
    x = y = 0.0
    line_x = line_y = 0.0
    size = 12.0
    leading = 0.0
    stack: list = []  # operand accumulator
    in_array = 0
    arr_strings: list[str] = []

    def _emit(text: str) -> None:
        nonlocal x
        if cmap is not None:
            text = cmap.map_string(text)
        if text:
            w = 0.5 * size * len(text)
            lines.append(
                {
                    "page": page,
                    "x0": round(x, 2),
                    "y0": round(y, 2),
                    "x1": round(x + w, 2),
                    "y1": round(y + size, 2),
                    "text": text,
                }
            )
            x += w

    def _newline() -> None:
        nonlocal x, y, line_x, line_y
        line_y -= leading if leading else size * 1.2
        x, y = line_x, line_y

    for kind, val in _tokenize_content(data):
        if kind == "arr_open":
            in_array += 1
            arr_strings = []
            continue
        if kind == "arr_close":
            in_array = max(0, in_array - 1)
            stack.append(("arr", "".join(arr_strings)))
            continue
        if in_array:
            if kind == "str":
                arr_strings.append(val)
            continue  # kern numbers ignored
        if kind in ("num", "str", "name", "arr"):
            stack.append((kind, val))
            continue
        op = val
        if op == b"BT":
            in_text = True
            x = y = line_x = line_y = 0.0
            stack.clear()
        elif op == b"ET":
            in_text = False
            stack.clear()
        elif not in_text:
            stack.clear()
        elif op == b"Tf":
            if stack and stack[-1][0] == "num":
                size = float(stack[-1][1]) or size
            if len(stack) >= 2 and stack[-2][0] == "name":
                cmap = fonts.get(bytes(stack[-2][1]))
            stack.clear()
        elif op == b"TL":
            if stack and stack[-1][0] == "num":
                leading = float(stack[-1][1])
            stack.clear()
        elif op in (b"Td", b"TD"):
            if len(stack) >= 2 and stack[-1][0] == "num" and stack[-2][0] == "num":
                tx, ty = float(stack[-2][1]), float(stack[-1][1])
                line_x += tx
                line_y += ty
                x, y = line_x, line_y
                if op == b"TD":
                    leading = -ty
            stack.clear()
        elif op == b"Tm":
            nums = [v for k, v in stack if k == "num"]
            if len(nums) >= 6:
                # only the translation (e, f) matters for line boxes;
                # scale/rotation would need full matrix tracking
                e, f = nums[-2], nums[-1]
                line_x, line_y = e, f
                x, y = e, f
            stack.clear()
        elif op == b"T*":
            _newline()
            stack.clear()
        elif op == b"Tj":
            if stack and stack[-1][0] == "str":
                _emit(stack[-1][1])
            stack.clear()
        elif op == b"'":
            _newline()
            if stack and stack[-1][0] == "str":
                _emit(stack[-1][1])
            stack.clear()
        elif op == b'"':
            _newline()
            if stack and stack[-1][0] == "str":
                _emit(stack[-1][1])
            stack.clear()
        elif op == b"TJ":
            if stack and stack[-1][0] == "arr":
                _emit(stack[-1][1])
            stack.clear()
        else:
            # any other operator consumes its operands
            stack.clear()
    return lines


def decode_real_pdf_lines(payload: bytes) -> list[dict]:
    """``%PDF-`` bytes → positioned text lines for the layout extractor.

    Never raises anything but UnsupportedPdfError (the caller
    soft-fails per M5): out-of-profile features raise it directly and
    corrupted bytes tripping a parser edge are converted."""
    try:
        return _decode_real_pdf_lines(payload)
    except UnsupportedPdfError:
        raise
    except Exception as e:
        raise UnsupportedPdfError(f"malformed PDF ({type(e).__name__})") from e


def _decode_real_pdf_lines(payload: bytes) -> list[dict]:
    if not payload.startswith(b"%PDF-"):
        raise UnsupportedPdfError("not a %PDF- payload")
    objects = _parse_objects(payload)

    # page attribution: /Type /Page objects in object-number order;
    # each page's /Resources /Font dict supplies its ToUnicode CMaps
    page_of_stream: dict[int, int] = {}
    fonts_of_stream: dict[int, dict[bytes, _CMap]] = {}
    page_idx = 0
    for num in sorted(objects):
        body, _ = objects[num]
        if _PAGE_RE.search(body):
            fonts = _page_fonts(body, objects)
            for cm in _CONTENTS_RE.finditer(body):
                page_of_stream[int(cm.group(1))] = page_idx
                if fonts:
                    fonts_of_stream[int(cm.group(1))] = fonts
            page_idx += 1

    lines: list[dict] = []
    for num in sorted(objects):
        body, stream = objects[num]
        if stream is None:
            continue
        if page_of_stream and num not in page_of_stream:
            continue  # non-content stream (fonts, xref streams, ...)
        data = _decode_stream(body, stream)
        if b"BT" not in data:
            continue
        lines.extend(
            _extract_stream_lines(
                data, page_of_stream.get(num, 0), fonts_of_stream.get(num)
            )
        )
    return lines


# --- fixture writer ---------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode-compatible encoder (EarlyChange=1); fixture/corpus
    writer paired with ``_lzw_decode``."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bitbuf = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # leading clear
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table or len(w + c) == 1:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # the DECODER reconstructs each entry one code later than the
        # encoder creates it, so its early-change widen (at 2^w - 1)
        # lines up with a NORMAL-change widen (at 2^w) here
        if next_code >= 4095:  # table full: clear before overflow
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        elif next_code >= (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _run_length_encode(data: bytes) -> bytes:
    """Literal-runs-only RunLengthDecode writer (valid, not optimal)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _encode_stream(data: bytes, filters: tuple[str, ...]) -> bytes:
    """Apply the ENCODING chain for a /Filter list: the decoder applies
    filters first-to-last, so encoders run last-to-first."""
    import base64

    for name in reversed(filters):
        if name == "FlateDecode":
            data = zlib.compress(data)
        elif name == "LZWDecode":
            data = _lzw_encode(data)
        elif name == "ASCIIHexDecode":
            data = data.hex().encode("ascii") + b">"
        elif name == "ASCII85Decode":
            data = base64.a85encode(data) + b"~>"
        elif name == "RunLengthDecode":
            data = _run_length_encode(data)
        else:
            raise ValueError(f"no encoder for /{name}")
    return data


def render_minimal_pdf(
    page_lines: list[list[tuple[float, float, str]]],
    *,
    compress: bool = True,
    font_size: float = 12.0,
    filters: tuple[str, ...] | None = None,
) -> bytes:
    """Hand-built single-revision PDF for tests: one content stream per
    page, each line a (x, y, text) Td+Tj at ``font_size``. Produces a
    structurally complete file (catalog, pages, page objects, xref,
    trailer) so third-party tools parse it too.

    ``filters``: explicit /Filter chain for the content streams (names
    in DECODE order, e.g. ``("ASCII85Decode", "LZWDecode")``);
    overrides ``compress``."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    n_pages = len(page_lines)
    # object layout: 1 catalog, 2 pages, 3 font, then per page i:
    # (4+2i) page object, (5+2i) content stream
    def add_obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    add_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    add_obj(
        2,
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    )
    add_obj(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(page_lines):
        page_num, content_num = 4 + 2 * i, 5 + 2 * i
        ops = ["BT", f"/F1 {font_size:g} Tf"]
        prev_x = prev_y = 0.0
        for x, y, text in lines:
            ops.append(f"{x - prev_x:g} {y - prev_y:g} Td")
            ops.append(f"({esc(text)}) Tj")
            prev_x, prev_y = x, y
        ops.append("ET")
        data = "\n".join(ops).encode("latin-1")
        if filters:
            body = _encode_stream(data, filters)
            names = "".join(f"/{f}" for f in filters)
            chain = f"[{names}]" if len(filters) > 1 else names
            head = b"<< /Length %d /Filter %s >>" % (
                len(body),
                chain.encode("ascii"),
            )
        elif compress:
            body = zlib.compress(data)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
        else:
            body = data
            head = b"<< /Length %d >>" % len(body)
        add_obj(
            page_num,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode(),
        )
        offsets[content_num] = len(out)
        out.extend(b"%d 0 obj\n" % content_num)
        out.extend(head)
        out.extend(b"\nstream\n")
        out.extend(body)
        out.extend(b"\nendstream\nendobj\n")
    xref_at = len(out)
    n_objs = 3 + 2 * n_pages
    out.extend(b"xref\n0 %d\n" % (n_objs + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, n_objs + 1):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objs + 1, xref_at)
    )
    return bytes(out)
