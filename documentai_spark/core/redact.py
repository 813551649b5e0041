"""Entity redaction: mask extracted entity values in text.

The training-data privacy scrub an LLM pipeline runs before corpus
release: every extracted sensitive entity value (PO/PI numbers, dates,
currency amounts, emails, phones — the identifying surface of the
reference's extractor, entity-extraction-service/app.py:787-799 +
extractor/purchase_order.py / performa_invoice.py regexes re-used via
``core.entities``) is replaced with a typed ``[FIELD]`` tag.

Semantics (pinned, engine-replayable):

- Scope is the EXTRACTOR'S entity surface: ``extract_entities`` is
  first-match-wins per field, and that first-match value is replaced at
  EVERY identical occurrence in the text (plain substring replace, all
  non-overlapping occurrences left-to-right). A second, *different*
  value of the same field in one text is outside the extractor's
  surface and stays — redaction is exactly as strong as extraction,
  never silently stronger.
- Fields apply in the fixed ``REDACT_FIELDS`` order, so overlapping
  values resolve deterministically in every engine (Python str.replace,
  Spark ``replace``, DuckDB ``replace`` all share the
  all-occurrences-left-to-right contract).
- ``incoterm`` (a public trade term) and ``swift_tag`` (a message field
  code) are not identifying and are NOT redacted by default.
"""

from __future__ import annotations

from documentai_spark.core.entities import extract_entities

# fixed application order — part of the contract, mirrored by the Spark
# expression chain and the DuckDB oracle
REDACT_FIELDS = ("po_number", "pi_number", "date_numeric", "date_alpha",
                 "currency_amount", "email", "phone")


def redact_text(text: str | None,
                entities: dict[str, str] | None = None,
                fields: tuple[str, ...] = REDACT_FIELDS) -> str | None:
    """Replace each extracted entity value with its ``[FIELD]`` tag.
    ``entities`` defaults to ``extract_entities(text)``."""
    if text is None:
        return None
    if entities is None:
        entities = extract_entities(text)
    out = text
    for field in fields:
        v = entities.get(field)
        if v:
            out = out.replace(v, f"[{field.upper()}]")
    return out
