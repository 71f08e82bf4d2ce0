"""Charset sniffing + decoding for raw web payloads.

Real Common-Crawl HTML arrives as bytes in whatever encoding the
origin server emitted — BOM'd UTF-16, `<meta charset=...>` legacy
code pages (windows-125x, shift_jis, gb2312, ...), XML declarations,
or nothing at all. The reference pipeline never faces this (its
frames are decoded images, `tesseract/processing.py:74`), but a
main-content extractor over crawl payloads must sniff before it
parses: decoding windows-1252 bytes as UTF-8-with-replacement
destroys every non-ASCII character.

The sniffing order follows the WHATWG HTML standard's encoding
sniffing algorithm (public: html.spec.whatwg.org/#determining-the-
character-encoding), simplified to its deterministic core:

1. **BOM** (highest precedence): UTF-8 / UTF-16LE / UTF-16BE byte
   order marks override any in-document declaration.
2. **In-document declaration** within the first ``PRESCAN_BYTES``
   bytes: ``<meta charset=...>``, ``<meta http-equiv=Content-Type
   content="...charset=...">``, or an XML declaration
   ``<?xml ... encoding="..."?>``. Labels are normalized through the
   WHATWG label table (subset below) — e.g. ``latin1`` and
   ``iso-8859-1`` both mean windows-1252 on the web. Per the spec's
   quirk, a *declared* utf-16 label is treated as utf-8 (a document
   readable enough to find the ASCII declaration cannot be utf-16).
3. **UTF-8 validity**: undeclared payloads that decode strictly as
   UTF-8 are UTF-8 (ASCII is a subset).
4. **Fallback**: windows-1252, the spec's default for the
   no-information case (every byte maps to *something*, so decoding
   never raises with ``errors="replace"``).

Everything here is stdlib-only (``codecs`` ships every code page we
map) and per-payload cost is a couple of regex scans over <=1 KiB.
"""

from __future__ import annotations

import codecs
import re

PRESCAN_BYTES = 1024

# WHATWG encoding label table (subset: the labels that appear in real
# crawls; canonical name on the right is what detect_encoding returns).
# Source: html.spec.whatwg.org/multipage/parsing.html + encoding.spec.
_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # windows-1252 absorbs the latin-1/ascii family on the web
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "l1": "windows-1252", "x-cp1252": "windows-1252",
    "x-user-defined": "windows-1252",
    # other windows code pages
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "windows-1253": "windows-1253", "windows-1254": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "windows-874": "windows-874", "tis-620": "windows-874",
    # iso-8859 family (2..16; -9 folds into windows-1254 per spec)
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2", "l2": "iso-8859-2",
    "iso-8859-3": "iso-8859-3", "iso-8859-4": "iso-8859-4",
    "iso-8859-5": "iso-8859-5", "iso-8859-6": "iso-8859-6",
    "iso-8859-7": "iso-8859-7", "iso-8859-8": "iso-8859-8",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "iso-8859-10": "iso-8859-10", "iso-8859-13": "iso-8859-13",
    "iso-8859-14": "iso-8859-14", "iso-8859-15": "iso-8859-15",
    "latin9": "iso-8859-15", "iso-8859-16": "iso-8859-16",
    # cyrillic legacy
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    "ibm866": "ibm866", "cp866": "ibm866",
    "x-mac-cyrillic": "x-mac-cyrillic",
    "macintosh": "macintosh", "mac": "macintosh",
    # CJK
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk",
    "gb_2312-80": "gbk", "csgb2312": "gbk", "chinese": "gbk",
    "csiso58gb231280": "gbk", "iso-ir-58": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5", "cn-big5": "big5",
    "csbig5": "big5", "x-x-big5": "big5",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "csshiftjis": "shift_jis", "ms932": "shift_jis",
    "ms_kanji": "shift_jis", "windows-31j": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp", "cseucpkdfmtjapanese": "euc-jp",
    "iso-2022-jp": "iso-2022-jp", "csiso2022jp": "iso-2022-jp",
    "euc-kr": "euc-kr", "korean": "euc-kr", "csksc56011987": "euc-kr",
    "cseuckr": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "ks_c_5601-1989": "euc-kr", "ksc5601": "euc-kr", "ksc_5601": "euc-kr",
    "windows-949": "euc-kr",
    # utf-16 (honored from a BOM; a *declared* utf-16 label means the
    # declaration itself was ASCII-readable, so the spec says utf-8)
    "utf-16": "utf-16le", "utf-16le": "utf-16le",
    "utf-16be": "utf-16be", "ucs-2": "utf-16le", "unicodefeff": "utf-16le",
}

# canonical name -> python codec (identity unless python spells it
# differently); looked up once, import-time
_PY_CODEC: dict[str, str] = {}
for _canon in set(_LABELS.values()):
    try:
        _PY_CODEC[_canon] = codecs.lookup(_canon).name
    except LookupError:  # pragma: no cover - all present in CPython
        pass

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16le"),
    (codecs.BOM_UTF16_BE, "utf-16be"),
)

# <meta ... charset=...> in either form; attribute-order agnostic,
# ASCII-case-insensitive, tolerant of quotes — the practical reading
# of the spec's prescan (which only inspects ASCII bytes, so scanning
# raw bytes is sound for every ASCII-superset encoding)
_META_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:\-]+)",
    re.IGNORECASE | re.DOTALL,
)
_XMLDECL_RE = re.compile(
    rb"^<\?xml[^>]{0,256}?encoding\s*=\s*[\"']([a-zA-Z0-9._:\-]+)[\"']",
    re.IGNORECASE,
)


# string-domain twins of the prescan regexes, for rewriting stale
# declarations inside already-decoded text (transcode_to_utf8)
_META_RE_S = re.compile(
    r"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:\-]+)",
    re.IGNORECASE | re.DOTALL,
)
_XMLDECL_RE_S = re.compile(
    r"^<\?xml[^>]{0,256}?encoding\s*=\s*[\"']([a-zA-Z0-9._:\-]+)[\"']",
    re.IGNORECASE,
)


def rewrite_declared_utf8(text: str) -> str:
    """Rewrite a non-utf-8 charset declaration in ``text``'s prescan
    window to ``utf-8``.

    Used by ``transcode_to_utf8`` AFTER decoding: the payload bytes
    become UTF-8, so a surviving ``<meta charset=windows-1251>`` would
    make any later re-sniff double-decode the UTF-8 bytes as cp1251 —
    mojibake for exactly the legacy pages transcoding targets. Only
    the FIRST xml-decl/meta match matters (the sniff stops there);
    declarations pushed past the re-sniff window by multi-byte
    expansion are harmless (the validity step then yields utf-8, since
    the transcoded bytes are clean UTF-8 by construction)."""

    def _fix(m: "re.Match[str]") -> str:
        if normalize_label(m.group(1)) == "utf-8":
            return m.group(0)
        s, e = m.span(1)
        off = m.start(0)
        g = m.group(0)
        return g[: s - off] + "utf-8" + g[e - off :]

    head = text[:PRESCAN_BYTES]
    fixed = _XMLDECL_RE_S.sub(_fix, head, count=1)
    fixed = _META_RE_S.sub(_fix, fixed, count=1)
    if fixed is head:
        return text
    return fixed + text[PRESCAN_BYTES:]


def normalize_label(label: str | bytes) -> str | None:
    """WHATWG label -> canonical encoding name (None if unknown)."""
    if isinstance(label, bytes):
        label = label.decode("ascii", errors="replace")
    return _LABELS.get(label.strip().strip("\"'").lower())


def _sniff_declared(payload: bytes) -> tuple[str | None, str | None]:
    """Steps 1-2 of the sniff (BOM, declarations); ``(None, None)``
    when the payload declares nothing and validity must decide."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return name, "bom"
    head = payload[:PRESCAN_BYTES]
    m = _XMLDECL_RE.match(head)
    if m:
        enc = normalize_label(m.group(1))
        if enc is not None:
            return ("utf-8" if enc.startswith("utf-16") else enc), "xml-decl"
    m = _META_RE.search(head)
    if m:
        enc = normalize_label(m.group(1))
        if enc is not None:
            # spec quirk: declared utf-16 is treated as utf-8
            return ("utf-8" if enc.startswith("utf-16") else enc), "meta"
    return None, None


def detect_encoding(payload: bytes | None) -> tuple[str, str]:
    """Sniff a payload's encoding.

    Returns ``(canonical_name, source)`` with source one of ``bom`` /
    ``meta`` / ``xml-decl`` / ``utf-8-valid`` / ``fallback``. Never
    raises; empty/None payloads report ``("utf-8", "fallback")``.
    """
    if not payload:
        return "utf-8", "fallback"
    enc, source = _sniff_declared(payload)
    if enc is not None:
        return enc, source
    try:
        payload.decode("utf-8")
        return "utf-8", "utf-8-valid"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_payload(payload: bytes | None) -> tuple[str, str, str]:
    """Sniff and decode: ``(text, encoding, source)``.

    BOM bytes are stripped; decoding always uses ``errors="replace"``
    so hostile bytes become U+FFFD, never an exception (the M5
    never-raise contract all decode kernels in this repo follow).
    """
    if not payload:
        return "", "utf-8", "fallback"
    enc, source = _sniff_declared(payload)
    if enc is None:
        # undeclared: the strict utf-8 attempt IS the decode on the
        # (overwhelmingly common) valid case — one pass, not a
        # validation pass plus a replace pass
        try:
            return payload.decode("utf-8"), "utf-8", "utf-8-valid"
        except UnicodeDecodeError:
            enc, source = "windows-1252", "fallback"
    if source == "bom":
        payload = payload[len(codecs.BOM_UTF8 if enc == "utf-8" else codecs.BOM_UTF16_LE):]
    return (
        payload.decode(_PY_CODEC.get(enc, "utf-8"), errors="replace"),
        enc,
        source,
    )
