"""Main-content extraction kernel: DOM parse + boilerplate classification.

This is the engine's analogue of the reference's per-frame OCR map
(``process_image_with_tesseract``, tesseract/processing.py:53-99): the
per-record extractor whose output must be byte-identical per url across
parallelism levels. The payload changes (image OCR -> HTML main-content
extraction per BASELINE.json north_star) but the contract is the same:

* pure function of the row payload — no RNG, no wall clock, no
  ambient state, so Ray-parallel output == single-process oracle output;
* failures become status-sentinel rows (textnorm.STATUS_*), mirroring
  tesseract/pipeline.py:79-92 — rows are never dropped and tasks never
  raise on poison payloads;
* text cleanup is the byte-exact ``clean_text`` kernel
  (tesseract/ocr_utils.py:3-56 semantics) + Unicode NFC.

Method (readability/boilerpipe-style, our own single-pass C-regex tag
scanner because lxml/selectolax are unavailable in this environment —
the classifier is our own):

1. stream-parse the HTML into *blocks* at block-level tags
   (p/h1-6/li/pre/blockquote/td/...), tracking per block: raw text,
   chars inside ``<a>`` (link chars), and descendant tag count;
2. score each block: ``text_density = chars / (1 + tags)`` and
   ``link_density = link_chars / chars``;
3. classify: drop blocks inside boilerplate containers
   (nav/header/footer/aside/form) and link-dense blocks; keep headings,
   code and text-dense content blocks;
4. assemble kept blocks in document order into one NFC-normalized
   string joined by blank lines, with per-block spans
   ``(start, end, kind, text_density, link_density)`` whose offsets
   index into the final string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape

from .charset import decode_payload
from .textnorm import STATUS_EMPTY_HTML, STATUS_OK, clean_text, nfc, status_exception

# Tags whose text content is never document text.
_SKIP = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe", "object"}
)
# Boilerplate containers: any block inside them is dropped (readability's
# "strip nav/chrome" rule).
_BOILER = frozenset({"nav", "footer", "header", "aside", "form"})
# Block-level tags that open an extraction block, mapped to a span kind.
_BLOCK_KIND = {
    "h1": "heading",
    "h2": "heading",
    "h3": "heading",
    "h4": "heading",
    "h5": "heading",
    "h6": "heading",
    "p": "paragraph",
    "li": "list_item",
    "dt": "list_item",
    "dd": "list_item",
    "pre": "code",
    "blockquote": "quote",
    "td": "table_cell",
    "th": "table_cell",
    "caption": "caption",
    "figcaption": "caption",
    "title": "title",
}
# Structural tags that flush any implicit (tagless) text block.
_STRUCTURAL = frozenset(
    {"div", "section", "article", "main", "body", "table", "ul", "ol", "dl", "tr"}
)
_VOID = frozenset({"br", "hr", "img", "input", "meta", "link", "wbr", "source"})

# Classifier thresholds (fixed constants — part of the golden contract;
# changing them invalidates committed golden fixtures).
MIN_TEXT_CHARS = 15  # shortest standalone content block kept
MAX_LINK_DENSITY = 0.33  # content blocks
MAX_LINK_DENSITY_HEADING = 0.66  # headings tolerate more linking


@dataclass
class _Block:
    kind: str
    boiler: bool
    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    tag_count: int = 0


# Tag token: <tag ...>, </tag>, <tag/>. Attribute values containing a
# literal ">" inside quotes are mis-split (rare in practice) — the cost
# of a single C-regex scan instead of html.parser's char-level Python
# loop (~4x kernel speedup); the kernel stays deterministic either way.
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*?(/?)>", re.DOTALL)
# Rawtext elements whose content html.parser also treats as CDATA: no
# tags are recognized inside until the matching close tag.
_RAWTEXT = ("script", "style")


class _BlockParser:
    """One-pass block segmenter driven by ``feed``. Fresh per document."""

    def __init__(self) -> None:
        self.blocks: list[_Block] = []
        self._open: list[_Block] = []  # stack of open explicit blocks
        self._implicit: _Block | None = None
        self._skip = 0
        self._boiler = 0
        self._a_depth = 0

    def feed(self, doc: str) -> None:
        """Regex-scan ``doc``; the block-segmentation event logic is
        inlined into the loop (the handler methods below document the
        identical per-event semantics and remain for targeted tests)."""
        pos, n = 0, len(doc)
        lower: str | None = None
        find = doc.find
        tag_match = _TAG_RE.match
        blocks = self.blocks
        open_stack = self._open
        implicit = self._implicit
        skip = self._skip
        boiler = self._boiler
        a_depth = self._a_depth

        while pos < n:
            lt = find("<", pos)
            data = doc[pos:] if lt < 0 else (doc[pos:lt] if lt > pos else "")
            if data and not skip:
                if "&" in data:
                    data = unescape(data)
                sink = open_stack[-1] if open_stack else implicit
                if sink is None:
                    if data.strip():
                        sink = implicit = _Block("text", boiler > 0)
                    else:
                        sink = None
                if sink is not None:
                    sink.parts.append(data)
                    if a_depth:
                        sink.link_chars += len(data.strip())
            if lt < 0:
                break
            nxt = doc[lt + 1 : lt + 2]
            if nxt in ("!", "?"):
                if doc.startswith("<!--", lt):
                    end = find("-->", lt + 4)
                    pos = n if end < 0 else end + 3
                else:  # doctype / processing instruction
                    end = find(">", lt)
                    pos = n if end < 0 else end + 1
                continue
            m = tag_match(doc, lt)
            if m is None:  # stray '<' that opens no tag -> literal text
                if not skip:
                    sink = open_stack[-1] if open_stack else implicit
                    if sink is None:
                        sink = implicit = _Block("text", boiler > 0)
                    sink.parts.append("<")
                    if a_depth:
                        sink.link_chars += 1
                pos = lt + 1
                continue
            closing, tag, selfclose = m.groups()
            tag = tag.lower()
            pos = m.end()
            if closing:  # === handle_endtag semantics ===
                if tag in _SKIP:
                    if skip:
                        skip -= 1
                elif skip:
                    pass
                elif tag in _BOILER:
                    if boiler:
                        boiler -= 1
                elif tag == "a":
                    if a_depth:
                        a_depth -= 1
                elif tag in _BLOCK_KIND:
                    kind = _BLOCK_KIND[tag]
                    for i in range(len(open_stack) - 1, -1, -1):
                        if open_stack[i].kind == kind:
                            blocks.append(open_stack.pop(i))
                            break
                elif tag in _STRUCTURAL:
                    if implicit is not None:
                        blocks.append(implicit)
                        implicit = None
            elif selfclose:  # === handle_startendtag semantics ===
                if tag not in _SKIP and not skip:
                    sink = open_stack[-1] if open_stack else implicit
                    if sink is not None:
                        sink.tag_count += 1
                        if tag == "br":
                            sink.parts.append("\n")
            else:  # === handle_starttag semantics ===
                if tag in _SKIP:
                    skip += 1
                    if tag in _RAWTEXT:
                        if lower is None:
                            lower = doc.lower()
                        end = lower.find("</" + tag, pos)
                        pos = n if end < 0 else end  # loop parses close
                elif skip:
                    pass
                elif tag in _BOILER:
                    boiler += 1
                    if implicit is not None:
                        blocks.append(implicit)
                        implicit = None
                else:
                    if tag == "a":
                        a_depth += 1
                    sink = open_stack[-1] if open_stack else implicit
                    if sink is not None:
                        sink.tag_count += 1
                    if tag in _BLOCK_KIND:
                        if implicit is not None:
                            blocks.append(implicit)
                            implicit = None
                        open_stack.append(_Block(_BLOCK_KIND[tag], boiler > 0))
                    elif tag in _STRUCTURAL:
                        if implicit is not None:
                            blocks.append(implicit)
                            implicit = None
                    elif tag == "br":
                        if sink is not None:
                            sink.parts.append("\n")

        self._implicit = implicit
        self._skip = skip
        self._boiler = boiler
        self._a_depth = a_depth

    def close(self) -> None:
        pass

    # -- helpers ----------------------------------------------------------
    def _flush_implicit(self) -> None:
        if self._implicit is not None:
            self.blocks.append(self._implicit)
            self._implicit = None

    def _sink(self) -> _Block | None:
        if self._open:
            return self._open[-1]
        return self._implicit

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip += 1
            return
        if self._skip:
            return
        if tag in _BOILER:
            self._boiler += 1
            self._flush_implicit()
            return
        if tag == "a":
            self._a_depth += 1
        sink = self._sink()
        if sink is not None:
            sink.tag_count += 1
        if tag in _BLOCK_KIND:
            self._flush_implicit()
            self._open.append(_Block(_BLOCK_KIND[tag], self._boiler > 0))
        elif tag in _STRUCTURAL:
            self._flush_implicit()
        elif tag == "br":
            if sink is not None:
                sink.parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _SKIP or self._skip:
            return
        sink = self._sink()
        if sink is not None:
            sink.tag_count += 1
            if tag == "br":
                sink.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag in _BOILER:
            self._boiler = max(0, self._boiler - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            return
        if tag in _BLOCK_KIND:
            # Close the innermost open block of this kind (tolerates
            # misnested/unclosed markup deterministically).
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i].kind == _BLOCK_KIND[tag]:
                    closed = self._open.pop(i)
                    self.blocks.append(closed)
                    break
        elif tag in _STRUCTURAL:
            self._flush_implicit()

    def handle_data(self, data: str) -> None:
        if self._skip or not data:
            return
        if "&" in data:
            data = unescape(data)
        sink = self._sink()
        if sink is None:
            if not data.strip():
                return
            sink = self._implicit = _Block("text", self._boiler > 0)
        sink.parts.append(data)
        if self._a_depth:
            sink.link_chars += len(data.strip())

    def finalize(self) -> list[_Block]:
        while self._open:
            self.blocks.append(self._open.pop())
        self._flush_implicit()
        return self.blocks


def _keep(kind: str, text: str, text_density: float, link_density: float) -> bool:
    if kind == "title":
        return False  # page chrome, not main content
    if kind == "heading":
        return link_density < MAX_LINK_DENSITY_HEADING
    if kind == "code":
        return True
    if link_density > MAX_LINK_DENSITY:
        return False
    return len(text) >= MIN_TEXT_CHARS


def extract_document(html: bytes | None) -> dict:
    """Extract main content from one HTML payload.

    Returns ``{extracted_text, spans, status, n_chars, n_spans}`` where
    ``spans`` is a list of ``{start, end, kind, text_density,
    link_density}`` dicts indexing into ``extracted_text``. Never raises.
    """
    if not html:
        return {
            "extracted_text": "",
            "spans": [],
            "status": STATUS_EMPTY_HTML,
            "n_chars": 0,
            "n_spans": 0,
        }
    try:
        # charset-sniffed decode (WHATWG order: BOM > declaration >
        # utf-8 validity > windows-1252). Valid-UTF-8 undeclared
        # payloads decode byte-identically to the previous plain
        # utf-8 path, so the flagship checksum is unchanged.
        doc = decode_payload(html)[0] if isinstance(html, bytes) else html
        parser = _BlockParser()
        parser.feed(doc)
        parser.close()
        blocks = parser.finalize()

        pieces: list[str] = []
        spans: list[dict] = []
        offset = 0
        for blk in blocks:
            if blk.boiler:
                continue
            text = nfc(clean_text("".join(blk.parts)))
            if not text:
                continue
            n = len(text)
            text_density = n / (1.0 + blk.tag_count)
            link_density = min(1.0, blk.link_chars / n)
            if not _keep(blk.kind, text, text_density, link_density):
                continue
            if pieces:
                offset += 2  # the "\n\n" joiner
            spans.append(
                {
                    "start": offset,
                    "end": offset + n,
                    "kind": blk.kind,
                    "text_density": text_density,
                    "link_density": link_density,
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
    except Exception as exc:  # poison rows -> status, never task failure
        return {
            "extracted_text": "",
            "spans": [],
            "status": status_exception(exc),
            "n_chars": 0,
            "n_spans": 0,
        }
