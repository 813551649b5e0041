"""Per-turn extraction dispatch: the oracle's single entry point.

Mirrors the reference's per-page content-kind dispatch
(document_classification_updated/documentClassifier.py:236-256: detect
text_based vs image_based, then route to native span extraction vs OCR).
Here the three kinds are ``plain`` / ``html`` / ``layout``
(FIXTURES.md §1) and the extractors are pure Python:

- plain  -> identity text; one span per non-empty line (kind ``line``).
- html   -> boilerplate-stripped main content + tables (html_extract).
- layout -> block/line/cell traversal with char-offset spans
            (layout_extract).

``extract_turn`` is called by BOTH the Arrow pandas UDF
(documentai_spark.operators.extraction) and the pytest oracle, so pipeline
output equals oracle output byte-for-byte by construction; the tests then
pin determinism across runs, partitionings, and parallelism levels.
"""

from __future__ import annotations

from typing import NamedTuple

from documentai_spark.core.html_extract import extract_html
from documentai_spark.core.layout_extract import extract_layout
from documentai_spark.core.textkind import detect_kind


class Span(NamedTuple):
    begin: int
    end: int
    kind: str
    text: str


def _extract_plain(text: str) -> tuple[str, list[tuple[int, int, str, str]]]:
    """Identity extraction; spans = non-empty lines with offsets."""
    spans: list[tuple[int, int, str, str]] = []
    offset = 0
    for raw_line in text.split("\n"):
        if raw_line.strip():
            spans.append((offset, offset + len(raw_line), "line", raw_line))
        offset += len(raw_line) + 1
    return text, spans


def extract_turn(text: str | None) -> tuple[str, str, list[Span]]:
    """One turn's text -> (kind, extracted_text, spans)."""
    if text is None:
        return "plain", "", []
    kind = detect_kind(text)
    if kind == "html":
        extracted, raw_spans = extract_html(text)
    elif kind == "layout":
        extracted, raw_spans = extract_layout(text)
    else:
        extracted, raw_spans = _extract_plain(text)
    return kind, extracted, [Span(*s) for s in raw_spans]
