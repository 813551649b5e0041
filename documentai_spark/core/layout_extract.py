"""PDF-layout-like text parsing into ordered spans (pure Python).

Semantics rebuilt from the reference's native-PDF span extraction
(microservices/entity-extraction-service/app.py:547-593): PyMuPDF
``get_text("dict")`` walks blocks -> lines -> spans in layout order and
emits each span's text with a bbox; pages are joined with ``"\\n"``
(app.py:525,582). Table rows are detected by splitting lines on runs of
>= 2 spaces (app.py:831-851 ``re.split(r'\\s{2,}|\\t')``).

Our payload is already text, so the pinned oracle contract is:

- **Blocks** = runs of consecutive non-blank lines (blank line = block
  boundary, the ``get_text`` block analog).
- **Within a block**, each line is processed in order:
  - if splitting on ``\\s{2,}`` (after strip) yields >= 2 cells, the line
    is a *table row*: output is cells joined with a single space, one span
    per cell (kind ``cell``) — mirroring the cell join of
    lc_application.py:28,36.
  - otherwise it is a *text line*: output is the stripped line, one span
    (kind ``line``).
- Output lines are joined with ``"\\n"`` across and within blocks (flat),
  preserving block -> line traversal order (the W1 ordering invariant).

Spans are ``(begin, end, kind, text)`` character offsets into the
extracted text — the character-offset analog of the reference's pixel
word boxes (app.py:571-579).
"""

from __future__ import annotations

import re

# a column gap is any whitespace run CONTAINING a tab or 2+ spaces
# (r7 review: the old ' {2,}|\t+' left a trailing space inside the left
# cell of a mixed 'alpha \tbeta' gap, so extracted_text carried a double
# space and the cell span text was whitespace-padded — corrupting the
# pinned single-space join for any space+tab column layout)
_CELL_SPLIT = re.compile(r" *\t[ \t]*| {2,}")


def extract_layout(text: str) -> tuple[str, list[tuple[int, int, str, str]]]:
    """Layout-ish text -> (extracted_text, spans). Pure + deterministic."""
    lines_out: list[str] = []
    spans: list[tuple[int, int, str, str]] = []
    offset = 0
    for raw_line in text.split("\n"):
        line = raw_line.strip()
        if not line:
            continue  # block boundary; flat join keeps traversal order
        cells = [c for c in _CELL_SPLIT.split(line) if c]
        if len(cells) >= 2:
            out = " ".join(cells)
            cursor = offset
            for c in cells:
                spans.append((cursor, cursor + len(c), "cell", c))
                cursor += len(c) + 1
        else:
            out = line
            spans.append((offset, offset + len(line), "line", line))
        lines_out.append(out)
        offset += len(out) + 1
    extracted = "\n".join(lines_out)
    return extracted, spans
