"""Document-type-specific extractors (pure Python; UDF oracle).

Rebuilt regex-for-regex from the reference's typed extractor classes:

- ``extract_purchase_order`` — entity_extraction_updated/extractor/
  purchase_order.py:5-85: PO number (bounded by DATED), PO date, fuzzy
  SELLER/BUYER blocks with line filtering + comma joins, goods
  description up to PARTIAL SHIPMENT/TRANSHIPMENT/blank-blank, quantity
  with unit, currency + total value, delivery terms with optional
  INCOTERMS year; unit_price / payment_terms /
  governing_law_or_force_majeure are structurally absent in the PO format
  and stay '' (purchase_order.py:63-84).
- ``extract_proforma_invoice`` — extractor/performa_invoice.py:5-71:
  PI number/date, fixed-party seller/buyer lines, incoterm+named place,
  delivery window, payment terms, origin, the goods TABLE split from the
  right into 6 fields per row (performa_invoice.py:43-65; see also
  functions/goods.parse_goods_row for the Spark column form), total
  amount + currency with comma strip.

Every field returns '' when its pattern misses (the reference's
ternary-else-'' convention), so downstream rule validation sees the same
missing-field semantics.
"""

from __future__ import annotations

import re

# purchase_order.py:13-15 — the (?=\s*DATED) lookahead is kept verbatim;
# the DuckDB oracle uses the equivalent consuming form
# '([A-Z0-9/ ]+)\s*DATED' (identical group under greedy backtracking)
_PO_NUMBER = re.compile(r"PO NUMBER[ \t\n\f\r]*[:\-]?[ \t\n\f\r]*([A-Z0-9\/ ]+)(?=[ \t\n\f\r]*DATED)",
                        re.I | re.A)
_PO_DATE = re.compile(r"DATED[ \t\n\f\r]*([0-9]{2}\.[0-9]{2}\.[0-9]{4})", re.A)
_SELLER = re.compile(r"SELLER.*?\n(.*?)(?:\nBUYER)", re.I | re.S | re.A)
_BUYER = re.compile(r"BUYER[ \t\n\f\r]*\n([\s\S]+?)(UNITED ARAB EMIRATES)",
                    re.I | re.A)
_GOODS_DESC = re.compile(
    r"DESCRIPTION OF GOODS[ \t\n\f\r]*\n(.+?)(?:\nPARTIAL SHIPMENT|\nTRANSHIPMENT"
    r"|\n{2,}|$)", re.S | re.I | re.A)
_QUANTITY = re.compile(r"([0-9,]+(?:\.\d+)?[ \t\n\f\r]*(?:MT|KG|TON|PCS))",
                       re.I | re.A)
_TOTAL_VALUE = re.compile(r"(USD|EUR|INR|GBP)[ \t\n\f\r]*([0-9,]+\.\d{2})", re.A)
_DELIVERY = re.compile(r"(CFR|CIF|FOB|DAP|EXW)[ \w,()/-]+(INCOTERMS ?\d{4})?",
                       re.I | re.A)

PO_FIELDS = ("po_number", "po_date", "seller_name", "buyer_name",
             "goods_description", "quantity", "unit_price", "currency",
             "total_value", "delivery_terms", "payment_terms",
             "governing_law_or_force_majeure")


def extract_purchase_order(text: str) -> dict[str, str]:
    """purchase_order.py:5-85, field for field."""
    t = text or ""
    e: dict[str, str] = {}
    m = _PO_NUMBER.search(t)
    e["po_number"] = m.group(1).strip() if m else ""
    m = _PO_DATE.search(t)
    e["po_date"] = m.group(1).strip() if m else ""
    m = _SELLER.search(t)
    if m:  # skip PO NUMBER lines inside the block (purchase_order.py:29-31)
        lines = [ln.strip() for ln in m.group(1).split("\n")
                 if ln.strip() and not ln.upper().startswith("PO NUMBER")]
        e["seller_name"] = ", ".join(lines)
    else:
        e["seller_name"] = ""
    m = _BUYER.search(t)
    if m:  # purchase_order.py:36-43
        lines = [ln.strip() for ln in m.group(1).split("\n") if ln.strip()]
        e["buyer_name"] = ", ".join(lines) + ", UNITED ARAB EMIRATES"
    else:
        e["buyer_name"] = ""
    m = _GOODS_DESC.search(t)
    e["goods_description"] = (m.group(1).replace("\n", " ").strip()
                              if m else "")
    m = _QUANTITY.search(t)
    e["quantity"] = m.group(1).replace(",", "") if m else ""
    e["unit_price"] = ""  # purchase_order.py:63-64
    m = _TOTAL_VALUE.search(t)
    e["currency"] = m.group(1) if m else ""
    e["total_value"] = m.group(2) if m else ""
    m = _DELIVERY.search(t)
    e["delivery_terms"] = m.group(0).strip() if m else ""
    e["payment_terms"] = ""  # purchase_order.py:80-81
    e["governing_law_or_force_majeure"] = ""  # purchase_order.py:83-84
    return e


# performa_invoice.py:10-41,67-70
_PI_NO = re.compile(r"PI No[ \t\n\f\r]*([A-Za-z0-9\-]+)", re.A)
_PI_DATE = re.compile(r"Date[ \t\n\f\r]*([0-9]{2}-[A-Za-z]{3}-[0-9]{4})", re.A)
_PI_SELLER = re.compile(r"(Global Exports Ltd\.,[^\n]+)")
_PI_BUYER = re.compile(r"(ABC Importers LLC,[^\n]+)")
_PI_INCOTERM = re.compile(r"Shipment Terms[ \t\n\f\r]*\|[ \t\n\f\r]*(.+?)[ \t\n\f\r]*Delivery Window",
                          re.A)
_PI_WINDOW = re.compile(r"Delivery Window[ \t\n\f\r]*By[ \t\n\f\r]*([0-9A-Za-z\-]+)", re.A)
_PI_PAYMENT = re.compile(r"Payment Terms:[ \t\n\f\r]*([^\n]+)", re.A)
_PI_ORIGIN = re.compile(r"Origin:[ \t\n\f\r]*([A-Za-z]+)", re.A)
_PI_TABLE_HEADER = re.compile(
    r"Description HS Code Qty Unit Unit Price Amount[ \t\n\f\r]*\n", re.A)
_PI_TOTAL = re.compile(r"Total[ \t\n\f\r]*\(([A-Za-z]+)\)[^\d]*([\d,]+\.\d{2})",
                       re.A)

# LC application SWIFT field codes, verbatim (lc_application.py:8-13 —
# note these are the F-prefixed table codes, distinct from the bare tag
# set in core/entities.ENTITY_CODES used by the generic swift_tag regex)
LC_ENTITY_CODES = (
    "F-40A", "F-23", "F-31C", "F40E", "F31D", "F51A", "F50", "F59", "F32B",
    "F39A", "F39C", "F41A", "F42C", "F42A_2", "F42M", "F42P", "F43P",
    "F43T", "F44A", "F44E", "F44F", "F44B", "F44C", "F44D", "F45A", "F46A",
    "F47A", "F718", "F48", "F49", "F53A", "F78", "F57A", "F72",
)

_LC_NORM = {c.replace("-", "").replace(" ", "").lower(): c
            for c in LC_ENTITY_CODES}


def extract_lc_application(md_text: str,
                           existing_entities: dict[str, str] | None = None
                           ) -> dict[str, str]:
    """LC table-code extraction (lc_application.py:16-37
    ``extract_entities_from_html_tables``): per table row, a first cell
    that normalizes (dash/space-stripped, lowercased) to a known F-code
    yields that code's value from the THIRD cell (merged-colspan rows:
    the SECOND); first occurrence wins across tables/pages."""
    from documentai_spark.core.html_extract import table_rows
    out = dict(existing_entities) if existing_entities else {}
    for cells in table_rows(md_text or ""):
        if len(cells) >= 3:
            value_idx = 2
        elif len(cells) == 2:
            value_idx = 1
        else:
            continue
        key = cells[0].replace("-", "").replace(" ", "").lower()
        code = _LC_NORM.get(key)
        if code is not None and code not in out:
            out[code] = cells[value_idx]
    return out


# deliberately NOT re.ASCII: mirrors the reference's Unicode re.split
# (app.py:830-851) and str.split whitespace (incl. \x1c-\x1f). NOTE the
# constraint this carries since the r3 text_tables oracle promotion: the
# DuckDB mirror uses the ASCII class [ \t\n\x0b\f\r\x1c-\x1f]{2,}, so the
# two engines agree only on ASCII text — a Unicode space (\xa0, \x85)
# in a future fixture would split here but not in the oracle. The
# committed transcripts fixture is ASCII-only (asserted by
# tests/test_typed_extract.py), so the hash-match holds; keep Unicode \s
# for reference parity on real-world (non-gated) inputs.
_TABLE_SPLIT = re.compile(r"\s{2,}|\t")


def extract_text_tables(text: str) -> list[list[list[str]]]:
    """Plain-text table detection (entity-extraction-service/
    app.py:830-851 ``extract_tables_from_text``): a line whose stripped
    form splits into >= 2 fields on runs of 2+ whitespace or tabs is a
    table row; a non-row line closes the current table only when it
    already has > 1 rows. Reference quirk preserved: a table holding
    exactly ONE row is NOT reset by non-row lines, so single rows bridge
    gaps and later rows join the same table (app.py:841-844's elif)."""
    tables: list[list[list[str]]] = []
    current: list[list[str]] = []
    for line in (text or "").split("\n"):
        fields = _TABLE_SPLIT.split(line.strip())
        if len(fields) >= 2:
            current.append(fields)
        elif current and len(current) > 1:
            tables.append(current)
            current = []
    if current and len(current) > 1:
        tables.append(current)
    return tables


PI_FIELDS = ("invoice_number", "invoice_date", "seller", "buyer",
             "contract_po_reference", "incoterm_named_place",
             "shipment_period_or_delivery_date", "payment_terms",
             "country_of_origin", "currency", "total_amount")


def parse_goods_line(line: str) -> dict[str, str] | None:
    """One goods-table row -> field dict, or None when the row has fewer
    than 6 right-anchored fields (performa_invoice.py:47-64): split from
    the RIGHT into 6 — ``rsplit(" ", 5)`` — because the description may
    itself contain spaces while the trailing 5 fields (HS code, quantity,
    unit, unit price, amount) are single tokens; each field stripped,
    commas removed from the amount. Single-sourced here so the Spark
    column form (functions/goods.parse_goods_row) can pin exact parity."""
    parts = line.strip().rsplit(" ", 5)
    if len(parts) != 6:
        return None
    desc, hs, qty, unit, price, amount = parts
    return {"description": desc.strip(),
            "hs_code": hs.strip(),
            "quantity": qty.strip(),
            "unit": unit.strip(),
            "unit_price": price.strip(),
            "amount": amount.replace(",", "").strip()}


def extract_proforma_invoice(text: str) -> tuple[dict[str, str], list[dict]]:
    """performa_invoice.py:5-71: (scalar fields, goods rows)."""
    t = text or ""
    e: dict[str, str] = {}
    m = _PI_NO.search(t)
    e["invoice_number"] = m.group(1) if m else ""
    m = _PI_DATE.search(t)
    e["invoice_date"] = m.group(1) if m else ""
    m = _PI_SELLER.search(t)
    e["seller"] = m.group(1).strip() if m else ""
    m = _PI_BUYER.search(t)
    e["buyer"] = m.group(1).strip() if m else ""
    e["contract_po_reference"] = e["invoice_number"]  # :24-25
    m = _PI_INCOTERM.search(t)
    e["incoterm_named_place"] = m.group(1).strip() if m else ""
    m = _PI_WINDOW.search(t)
    e["shipment_period_or_delivery_date"] = (
        f"By {m.group(1)}" if m else "")
    m = _PI_PAYMENT.search(t)
    e["payment_terms"] = m.group(1).strip() if m else ""
    m = _PI_ORIGIN.search(t)
    e["country_of_origin"] = m.group(1) if m else ""
    goods: list[dict] = []
    m = _PI_TABLE_HEADER.search(t)
    if m:  # split-from-right goods rows (performa_invoice.py:47-64)
        for line in t[m.end():].strip().split("\n"):
            raw = line.strip()
            if not raw or "Total" in raw or raw.startswith("<b>"):
                break
            row = parse_goods_line(raw)
            if row is not None:
                goods.append(row)
    m = _PI_TOTAL.search(t)
    e["currency"] = m.group(1) if m else ""
    e["total_amount"] = m.group(2).replace(",", "") if m else ""
    return e, goods
