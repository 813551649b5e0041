"""Entity -> span-offset matching (pure Python; oracle for the span UDF).

The reference locates each extracted entity inside the page's OCR word
boxes with a three-stage cascade and merges the matched boxes into one
bounding rectangle (microservices/entity-extraction-service/app.py:682-733
``find_entity_bounding_box``; :736-755 ``combine_bounding_boxes``). The
text-domain analog replaces 2-D word boxes with char-offset token boxes
over the extracted text; the bbox merge becomes the 1-D envelope
(min begin, max end) — same min/max construction as the reference's
min_x/max_x+width rectangle.

Cascade (order preserved from app.py:696-733):

1. **exact** — a single token equals the cleaned entity value;
2. **consecutive multi-word** — a token equals the first entity word and
   the following tokens match the remaining words in order (app.py:705-725
   consecutive-word scan); all matched -> merged envelope;
3. **fuzzy containment** — first token where either string contains the
   other (app.py:727-731).

Returns None when nothing matches (reference returns None and omits the
bbox, app.py:733).
"""

from __future__ import annotations

import re
from typing import NamedTuple

# deliberately NOT re.ASCII: mirrors the reference's Unicode word
# tokenization. NOTE the constraint this carries (same as
# typed_extract._TABLE_SPLIT, r7 review): the entity_spans DuckDB
# oracle tokenizes with the ASCII complement class
# [^ \t\n\x0b\f\r\x1c-\x1f]+, so the two engines agree on all ASCII
# text (incl. \x0b/\x1c-\x1f, which Python's Unicode \S also excludes)
# but a Unicode space (\xa0, \x85) in a future fixture would split here
# and not in the oracle. The committed transcripts fixture is
# ASCII-only (asserted by tests/test_typed_extract.py).
_TOKEN_RE = re.compile(r"\S+")


class TokenBox(NamedTuple):
    """Char-offset analog of an OCR word box ({text, bbox})."""
    text: str
    begin: int
    end: int


class EntitySpan(NamedTuple):
    field: str
    value: str
    begin: int | None
    end: int | None


def word_boxes(text: str) -> list[TokenBox]:
    """Whitespace-token boxes with char offsets (the OCR word-box analog).

    Tokens are maximal ``\\S+`` runs — identical to ``str.split()`` so the
    box texts match the reference's per-word OCR output granularity."""
    if not text:
        return []
    return [TokenBox(m.group(0), m.start(), m.end())
            for m in _TOKEN_RE.finditer(text)]


def find_entity_span(entity_value: str,
                     boxes: list[TokenBox]) -> tuple[int, int] | None:
    """The exact -> consecutive-multi-word -> containment cascade
    (app.py:682-733), returning the merged (begin, end) char envelope."""
    if not entity_value or not boxes:
        return None
    entity_clean = entity_value.strip().lower()
    entity_words = entity_clean.split()
    if not entity_words:
        return None
    for i, box in enumerate(boxes):
        box_text = box.text.strip().lower()
        if box_text == entity_clean:
            return (box.begin, box.end)
        if len(entity_words) > 1 and box_text == entity_words[0]:
            matched = [box]
            j, word_idx = i + 1, 1
            while j < len(boxes) and word_idx < len(entity_words):
                nxt = boxes[j]
                if nxt.text.strip().lower() == entity_words[word_idx]:
                    matched.append(nxt)
                    word_idx += 1
                    j += 1
                else:
                    break
            if word_idx == len(entity_words):
                # combine_bounding_boxes (app.py:736-755): envelope of all
                # matched boxes -> 1-D (min begin, max end)
                return (min(b.begin for b in matched),
                        max(b.end for b in matched))
    for box in boxes:
        box_text = box.text.strip().lower()
        if entity_clean in box_text or box_text in entity_clean:
            return (box.begin, box.end)
    return None


def entity_spans(text: str, entities: dict[str, str]) -> list[EntitySpan]:
    """Span record per extracted entity, fields in sorted order (the
    entity dict is unordered at the reference boundary; sorting pins the
    Arrow array layout). begin/end are None when the cascade misses."""
    boxes = word_boxes(text)
    out = []
    for field in sorted(entities):
        value = entities[field]
        span = find_entity_span(value, boxes)
        out.append(EntitySpan(field, value,
                              span[0] if span else None,
                              span[1] if span else None))
    return out
