"""Regex entity extraction (pure Python; the oracle for the entity UDF).

Rebuilt field-for-field from the reference's extractors:

- purchase order fields — entity_extraction_updated/extractor/
  purchase_order.py:5-83 (``PO NUMBER <X> DATED dd.mm.yyyy``, seller/buyer
  blocks, currency amounts, incoterms).
- proforma invoice fields — extractor/performa_invoice.py:5-71
  (``PI No <X>``, ``Date dd-MMM-yyyy``, goods table rows split from the
  right into 6 fields).
- generic patterns (date/amount/number/email/phone) —
  microservices/entity-extraction-service/app.py:787-799.
- SWIFT field tags (LC applications) — extractor/lc_application.py:8-12
  ENTITY_CODES membership.

Output is a flat ``{field: value}`` dict (the reference's flat entity dict,
purchase_order.py:10-83); first match wins per field — the order-sensitive
first-wins union of lc_application.py:27-36.
"""

from __future__ import annotations

import re

# SWIFT field tags accepted by the LC extractor (lc_application.py:8-12).
ENTITY_CODES = frozenset({
    "40A", "20", "31C", "40E", "31D", "50", "59", "32B", "39A", "41A",
    "42C", "42A", "43P", "43T", "44A", "44E", "44F", "44B", "44C", "45A",
    "46A", "47A", "71B", "48", "49", "53A", "78", "57A", "72Z", "23",
    "52A", "51A", "30", "26E",
})

# All patterns compiled re.ASCII: \d/\w/\b are the ASCII classes, which
# (a) matches the RE2 semantics of the DuckDB oracle SQL exactly and
# (b) makes the vectorized pre-gates in
# operators/quality_vec.completeness_scores sound (the gates count ASCII
# classes; a Unicode-\d pattern could otherwise match a gated-out row).
# Note currency_amount's [\d,]+ group can be satisfied by commas alone,
# so its gate must be digit-OR-comma, not digit (r7 review finding).
# Whitespace is SPELLED OUT as [ \t\n\f\r] (r7 review): Python's ASCII
# \s additionally contains \x0b, which RE2's \s does not — a
# within-ASCII divergence the fixtures' ASCII-only assertion cannot
# catch (the reference's bare \s is Unicode; narrowing it is the price
# of the cross-engine replay, same CLAUDE.md rule as \b).
_A = re.ASCII
_WS = r"[ \t\n\f\r]"  # == RE2 \s exactly
_PATTERNS: dict[str, re.Pattern] = {
    # purchase_order.py:13-22
    "po_number": re.compile(
        rf"PO{_WS}+NUMBER[: \t\n\f\r]+([A-Z0-9/\-]+)",
        re.IGNORECASE | _A),
    # performa_invoice.py:10-13
    "pi_number": re.compile(
        rf"PI{_WS}+No[.: \t\n\f\r]+([A-Z0-9/\-]+)",
        re.IGNORECASE | _A),
    # dd.mm.yyyy / dd-mm-yyyy / dd/mm/yyyy (app.py:788; purchase_order DATED)
    "date_numeric": re.compile(r"\b(\d{2}[./-]\d{2}[./-]\d{4})\b", _A),
    # dd-MMM-yyyy (performa_invoice.py:11)
    "date_alpha": re.compile(r"\b(\d{1,2}-[A-Za-z]{3}-\d{4})\b", _A),
    # ISO-4217 currency amount (validation_engine.py:165 format)
    "currency_amount": re.compile(
        rf"\b([A-Z]{{3}}){_WS}+([\d,]+(?:\.\d+)?)\b", _A),
    # incoterms (purchase_order.py:71-76)
    "incoterm": re.compile(r"\b(CFR|CIF|FOB|DAP|EXW)\b", _A),
    # generic (app.py:787-799)
    "email": re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.]+\b", _A),
    "phone": re.compile(r"\+?\d[\d \t\n\f\r\-]{7,14}\d", _A),
    # SWIFT tag lines like ":40A:" or "40A:" (lc_application.py:24-27)
    "swift_tag": re.compile(rf"(?:^|\n):?(\d{{2}}[A-Z]?){_WS}*:", _A),
}

# The "expected fields" set used by the completeness score
# (entity-extraction-service/app.py:990-999: present/expected).
EXPECTED_FIELDS = (
    "po_number", "date_numeric", "currency_amount", "incoterm", "email",
)
# Key fields granting the +0.1 confidence bonus (app.py:969-988).
KEY_FIELDS = ("po_number", "currency_amount")


def extract_entities(text: str) -> dict[str, str]:
    """Flat first-match-wins entity dict over one turn's text."""
    if not text:
        return {}
    out: dict[str, str] = {}
    for field, pat in _PATTERNS.items():
        m = pat.search(text)
        if not m:
            continue
        if field == "swift_tag":
            tag = m.group(1)
            if tag in ENTITY_CODES:
                out[field] = tag
        elif field == "currency_amount":
            out["currency"] = m.group(1)
            out["amount"] = m.group(2)
            out[field] = m.group(0)
        else:
            out[field] = m.group(1) if m.groups() else m.group(0)
    return out


def completeness_score(entities: dict[str, str]) -> float:
    """present_expected / expected_count (app.py:990-999)."""
    present = sum(1 for f in EXPECTED_FIELDS if f in entities)
    return present / len(EXPECTED_FIELDS)


def completeness_from_text(text: str) -> float:
    """Completeness directly from text (equivalent to
    ``completeness_score(extract_entities(text))`` because every EXPECTED
    field is set iff its pattern matches). The vectorized UDF mirrors this
    with one ``Series.str.contains`` pass per expected pattern."""
    if not text:
        return 0.0
    present = sum(1 for f in EXPECTED_FIELDS
                  if _PATTERNS[f].search(text) is not None)
    return present / len(EXPECTED_FIELDS)


def extraction_confidence(entities: dict[str, str]) -> float:
    """non_empty/expected + 0.1 per key field, capped 1.0 (app.py:969-988)."""
    if not entities:
        return 0.0
    base = completeness_score(entities)
    bonus = 0.1 * sum(1 for f in KEY_FIELDS if f in entities)
    return min(1.0, base + bonus)
