"""Content-kind detection: ``plain`` / ``html`` / ``layout``.

The reference dispatches each page on detected content kind with a
text-density heuristic (reference: document_classification_updated/
documentClassifier.py:224-256 — word-count + density thresholds deciding
text_based vs image_based, which routes native-span extraction vs OCR).
Our payloads are text, so the analogous dispatch is a deterministic
syntactic test over the turn's ``text`` column:

- **html**   — contains a start tag from the bounded vocabulary
  (FIXTURES.md §1: ``html body div p a ul li table tr td th h1 h2 span br``).
- **layout** — multi-line text with PDF-layout structure: a blank-line block
  separator, or at least one multi-column table row (two cells separated by
  >= 2 spaces — the table-detection delimiter in the reference,
  microservices/entity-extraction-service/app.py:831-851 ``re.split(r'\\s{2,}')``).
- **plain**  — everything else; extraction is the identity.

The rules are total and deterministic on the fixture domain (FIXTURES.md)
and cheap enough to run vectorized (regex) inside an Arrow batch.
"""

from __future__ import annotations

import re

HTML_TAGS = (
    "html", "body", "div", "p", "a", "ul", "li",
    "table", "tr", "td", "th", "h1", "h2", "span", "br",
)

# A start tag from the bounded vocabulary, e.g. <div>, <a href=..>, <br/>.
_HTML_RE = re.compile(
    r"<(?:%s)(?:\s[^>]*)?/?>" % "|".join(HTML_TAGS), re.IGNORECASE
)

# A line with >= 2 consecutive spaces between two non-space runs
# (multi-column table row; ref app.py:840 table delimiter).
_MULTICOL_RE = re.compile(r"\S {2,}\S")

# A blank-line block separator (PDF block boundary analog;
# ref app.py:559-581 block->line->span traversal).
_BLOCKSEP_RE = re.compile(r"\n[ \t]*\n")


def detect_kind(text: str) -> str:
    """Classify one turn's payload. Pure, total, deterministic."""
    if text is None:
        return "plain"
    if _HTML_RE.search(text):
        return "html"
    if "\n" in text and (_BLOCKSEP_RE.search(text) or _MULTICOL_RE.search(text)):
        return "layout"
    return "plain"
