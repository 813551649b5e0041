"""HTML boilerplate stripping + table extraction (pure Python, stdlib only).

Semantics rebuilt from the reference (WHAT, not HOW):

- **Main-content vs boilerplate** — the reference's text-density heuristic
  family (document_classification_updated/documentClassifier.py:224-233:
  word-count / area density thresholds). We apply the Readability/jusText
  formulation over DOM blocks: a block is *content* when its link density is
  low and its word count is high; link-heavy short blocks (nav, footers,
  link lists) are boilerplate.
- **Table extraction** — every ``<table>`` is data, never boilerplate;
  cells are the text of ``td``/``th`` nodes joined with a single space,
  mirroring BeautifulSoup ``get_text(" ", strip=True)`` + colspan-aware cell
  walking in the reference
  (entity_extraction_updated/extractor/lc_application.py:14-37).
- **Whitespace pinning** — unit text is whitespace-collapsed (split/join on
  single spaces); output units are joined with ``"\\n"`` (the reference's
  per-page join, microservices/entity-extraction-service/app.py:525,582).

Pinned classification rules (the oracle contract; FIXTURES.md §2):

- A *paragraph unit* is emitted for each block element (``p div li h1 h2
  body``) that has own inline text (text from itself and inline descendants
  ``a/span/br``, not crossing a nested block boundary).
- ``link_density`` = linked chars / total chars of the unit's collapsed text.
- A paragraph unit is **content** iff ``link_density <= 0.33`` and
  ``word_count >= 10``.
- A heading unit (``h1``/``h2``) is **content** iff ``link_density == 0``
  and the document has at least one content paragraph or table (jusText's
  "short block near good block" simplification).
- Every table row is **content**; a row's text is its cells joined by a
  single space; one output line per row.
- Units appear in document order; output lines joined by ``"\\n"``.

Spans: each paragraph/heading unit is one span (kind ``p``/``h``/``li``);
each table cell is one span (kind ``cell``). ``begin``/``end`` are character
offsets into the extracted text (the pixel-bbox analog of
entity-extraction-service/app.py:571-579 word boxes).
"""

from __future__ import annotations

import re
from html import unescape

BLOCK_TAGS = frozenset({"p", "div", "li", "h1", "h2", "body", "html", "ul",
                        "table", "tr", "td", "th"})
INLINE_TAGS = frozenset({"a", "span", "br"})
HEADING_TAGS = frozenset({"h1", "h2"})
VOID_TAGS = frozenset({"br"})

MAX_LINK_DENSITY = 0.33
MIN_CONTENT_WORDS = 10


def _collapse(text: str) -> str:
    """Whitespace-collapse: the pinned single-space normalization."""
    return " ".join(text.split())


class _Unit:
    """One candidate output line: a paragraph/heading/li or a table row."""

    __slots__ = ("kind", "chars", "link_chars", "cells", "in_link")

    def __init__(self, kind: str) -> None:
        self.kind = kind              # 'p' | 'h' | 'li' | 'row'
        self.chars: list[str] = []    # raw text pieces
        self.link_chars: list[str] = []
        self.cells: list[str] = []    # for rows: collapsed cell texts
        self.in_link = 0

    def add_text(self, data: str) -> None:
        self.chars.append(data)
        if self.in_link:
            self.link_chars.append(data)

    def text(self) -> str:
        return _collapse("".join(self.chars))

    def link_text(self) -> str:
        return _collapse("".join(self.link_chars))


# tag tokenizer: start/end tags of the bounded vocabulary; everything else
# (comments, scripts, stray '<') is text. ~5x faster than html.parser for
# this grammar (no charref scanning, no position bookkeeping). Quoted
# attribute strings are tried FIRST and a bare [^>] catches stray/
# unterminated quotes (r7 review: an unquoted value containing an
# apostrophe — href=/it's — used to fail the tokenizer entirely and the
# raw markup leaked into extracted_text, escaping link accounting).
_TOKEN_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>])*?)(/?)>")


class _Extractor:
    """Single-pass, stack-based; lenient on unclosed/mismatched tags."""

    def __init__(self) -> None:
        self.units: list[_Unit] = []   # document order
        self.stack: list[str] = []
        self.cur: _Unit | None = None  # open paragraph-ish unit
        self.row: _Unit | None = None  # open table row
        self.cell: list[str] | None = None
        self.in_table = 0
        # anchor depth lives on the EXTRACTOR (r7 review): it used to
        # live only on the open unit, so an <a> opened before any unit
        # exists (bare anchor under <body>, or <a> wrapping a block —
        # valid HTML5) contributed zero link chars and pure-link
        # boilerplate was emitted as content
        self.link_depth = 0

    # -- driver ------------------------------------------------------------

    def feed(self, text: str) -> None:
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() > pos:
                chunk = text[pos:m.start()]
                if "&" in chunk:  # charref conversion, only when needed
                    chunk = unescape(chunk)
                self.handle_data(chunk)
            closing, tag, _attrs, selfclose = m.groups()
            tag = tag.lower()
            if closing:
                self.handle_endtag(tag)
            else:
                self.handle_starttag(tag, None)
                if selfclose and tag not in VOID_TAGS:
                    self.handle_endtag(tag)
            pos = m.end()
        if pos < len(text):
            chunk = text[pos:]
            if "&" in chunk:
                chunk = unescape(chunk)
            self.handle_data(chunk)

    # -- tag events --------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            # <br> is a soft separator; collapse() eats extra spaces.
            if self.cell is not None:
                self.cell.append(" ")
            elif self.cur is not None:
                self.cur.add_text(" ")
            return
        self.stack.append(tag)
        if tag == "table":
            self._flush_cur()
            self.in_table += 1
        elif tag == "tr" and self.in_table:
            self._flush_row()
            self.row = _Unit("row")
        elif tag in ("td", "th") and self.row is not None:
            self.cell = []
        elif tag in ("p", "li") or tag in HEADING_TAGS or tag == "div":
            if self.in_table == 0:
                self._flush_cur()
                kind = "h" if tag in HEADING_TAGS else ("li" if tag == "li" else "p")
                self.cur = _Unit(kind)
                self.cur.in_link = self.link_depth
        elif tag == "a":
            self.link_depth += 1
            if self.cur is not None:
                self.cur.in_link += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # lenient unwind: pop to the matching open tag if present
        if tag in self.stack:
            while self.stack and self.stack[-1] != tag:
                self._implicit_close(self.stack.pop())
            self.stack.pop()
        self._implicit_close(tag)

    def _implicit_close(self, tag: str) -> None:
        if tag == "table":
            self._flush_row()
            if self.in_table:
                self.in_table -= 1
        elif tag == "tr":
            self._flush_row()
        elif tag in ("td", "th"):
            self._flush_cell()
        elif tag in ("p", "li", "div") or tag in HEADING_TAGS:
            if self.in_table == 0:
                self._flush_cur()
        elif tag == "a":
            if self.link_depth:
                self.link_depth -= 1
            if self.cur is not None and self.cur.in_link:
                self.cur.in_link -= 1

    def handle_data(self, data: str) -> None:
        if self.cell is not None:
            self.cell.append(data)
        elif self.row is not None:
            pass  # text between cells in a row: ignored (not in any cell)
        elif self.in_table:
            pass  # text directly inside <table>: ignored
        elif self.cur is not None:
            self.cur.add_text(data)
        else:
            # bare text outside any block: treat as an implicit paragraph
            if data.strip():
                self.cur = _Unit("p")
                self.cur.in_link = self.link_depth
                self.cur.add_text(data)

    # -- unit lifecycle ----------------------------------------------------

    def _flush_cell(self) -> None:
        if self.cell is not None and self.row is not None:
            self.row.cells.append(_collapse("".join(self.cell)))
            self.cell = None

    def _flush_row(self) -> None:
        self._flush_cell()
        if self.row is not None:
            if any(c for c in self.row.cells):
                self.units.append(self.row)
            self.row = None

    def _flush_cur(self) -> None:
        if self.cur is not None:
            if self.cur.text():
                self.units.append(self.cur)
            self.cur = None

    def finish(self) -> list[_Unit]:
        self._flush_row()
        self._flush_cur()
        return self.units


def table_rows(text: str) -> list[list[str]]:
    """All table rows as raw cell-text lists (collapsed, empties kept) —
    the ``find_all('tr') -> find_all('td')`` traversal surface the LC
    extractor consumes (extractor/lc_application.py:20-36)."""
    parser = _Extractor()
    try:
        parser.feed(text)
    except Exception:
        return []
    return [u.cells for u in parser.finish() if u.kind == "row"]


def extract_html(text: str) -> tuple[str, list[tuple[int, int, str, str]]]:
    """HTML fragment -> (extracted_text, spans).

    Spans are ``(begin, end, kind, text)`` with char offsets into
    extracted_text. Deterministic; total on the bounded tag vocabulary.
    """
    parser = _Extractor()
    try:
        parser.feed(text)
    except Exception:
        # malformed beyond leniency: fall back to whole-text strip
        stripped = _collapse(text)
        return stripped, ([(0, len(stripped), "p", stripped)] if stripped else [])
    units = parser.finish()

    # classification pass: (text, link_density, is_content) computed ONCE
    # per unit and reused by the emit loop (r7 review: the join/collapse/
    # split string work used to run twice per unit)
    has_anchor = False  # >=1 content paragraph or table row
    infos: list[tuple[str, float, bool] | None] = []
    for u in units:
        if u.kind == "row":
            has_anchor = True
            infos.append(None)
            continue
        t = u.text()
        lt = u.link_text()
        ld = (len(lt) / len(t)) if t else 1.0
        is_content = (ld <= MAX_LINK_DENSITY
                      and len(t.split()) >= MIN_CONTENT_WORDS)
        if u.kind in ("p", "li") and is_content:
            has_anchor = True
        infos.append((t, ld, is_content))

    lines: list[str] = []
    spans: list[tuple[int, int, str, str]] = []
    offset = 0
    for u, info in zip(units, infos):
        if u.kind == "row":
            cells = [c for c in u.cells if c]
            if not cells:
                continue
            line = " ".join(cells)
            cursor = offset
            for c in cells:
                spans.append((cursor, cursor + len(c), "cell", c))
                cursor += len(c) + 1
        else:
            t, ld, is_content = info
            if u.kind == "h":
                if not (ld == 0.0 and has_anchor):
                    continue
            else:
                if not is_content:
                    continue
            line = t
            spans.append((offset, offset + len(t), u.kind, t))
        lines.append(line)
        offset += len(line) + 1  # "\n" join

    extracted = "\n".join(lines)
    return extracted, spans
