"""Content-kind detection: ``plain`` / ``html`` / ``layout``.

The reference dispatches each page on detected content kind with a
text-density heuristic (reference: document_classification_updated/
documentClassifier.py:224-256 — word-count + density thresholds deciding
text_based vs image_based, which routes native-span extraction vs OCR).
Our payloads are text, so the analogous dispatch is a deterministic
syntactic test over the turn's ``text`` column:

- **html**   — contains a start tag from the bounded vocabulary
  (FIXTURES.md §1: ``html body div p a ul li table tr td th h1 h2 span br``),
  matched case-insensitively (HTML tag names are case-insensitive).
- **layout** — multi-line text with PDF-layout structure: a blank-line block
  separator, or at least one multi-column table row (two cells separated by
  >= 2 spaces or a tab — the cell delimiter set of layout_extract._CELL_SPLIT
  and the table-detection delimiter in the reference,
  microservices/entity-extraction-service/app.py:831-851
  ``re.split(r'\\s{2,}|\\t')``).
- **plain**  — everything else; extraction is the identity.

The rules are total and deterministic, and cheap enough to run vectorized
(regex) inside an Arrow batch.

**Three-engine portability** (the CLAUDE.md pin): these pattern strings are
shared verbatim with the Spark ``rlike`` mirror and the DuckDB (RE2) gate
oracle (``__spark_entry__._KIND_*``), so they must mean the same thing under
Python ``re``, ``java.util.regex``, and RE2:

- no bare ``\\s``/``\\S`` — Java's ``\\s`` includes ``\\x0b``, RE2's does
  not, so whitespace is the explicit class ``[ \\t\\n\\x0b\\f\\r]`` (the
  curation.TOKEN_WS character set) on every engine;
- no ``re.IGNORECASE`` / ``(?i)`` — Python's IGNORECASE is Unicode-aware
  (``ſ`` U+017F matches ``s``, ``K`` U+212A matches ``k``), Java's default
  is ASCII, RE2 case-folds differently again; tag-name case-insensitivity
  is spelled as explicit ``[hH]``-style classes instead.
"""

from __future__ import annotations

import re

HTML_TAGS = (
    "html", "body", "div", "p", "a", "ul", "li",
    "table", "tr", "td", "th", "h1", "h2", "span", "br",
)

# explicit ASCII whitespace — identical under Python re, Java regex, RE2
# (same character set as curation.TOKEN_WS)
_WS = r" \t\n\x0b\f\r"


def _ci(tag: str) -> str:
    """ASCII-only case-insensitive spelling of a tag name ([hH][tT]...) —
    portable across engines whose case-folding rules differ."""
    return "".join(f"[{c}{c.upper()}]" if c.isalpha() else c for c in tag)


# A start tag from the bounded vocabulary, e.g. <div>, <DIV>, <a href=..>,
# <br/>; any case (HTML tag names are case-insensitive).
KIND_HTML_PAT = r"<(?:%s)(?:[%s][^>]*)?/?>" % (
    "|".join(_ci(t) for t in HTML_TAGS), _WS)

# A line with a cell separator between two non-whitespace runs: >= 2
# consecutive spaces, or a tab (optionally space-padded) — the same
# delimiter set layout_extract._CELL_SPLIT splits cells on, so every
# detectable table row is also parseable.
KIND_MULTICOL_PAT = r"[^%s](?: {2,}| *\t[ \t]*)[^%s]" % (_WS, _WS)

# A blank-line block separator (PDF block boundary analog;
# ref app.py:559-581 block->line->span traversal).
KIND_BLOCKSEP_PAT = r"\n[ \t]*\n"

_HTML_RE = re.compile(KIND_HTML_PAT)
_MULTICOL_RE = re.compile(KIND_MULTICOL_PAT)
_BLOCKSEP_RE = re.compile(KIND_BLOCKSEP_PAT)


def detect_kind(text: str) -> str:
    """Classify one turn's payload. Pure, total, deterministic."""
    if text is None:
        return "plain"
    if _HTML_RE.search(text):
        return "html"
    if "\n" in text and (_BLOCKSEP_RE.search(text) or _MULTICOL_RE.search(text)):
        return "layout"
    return "plain"
