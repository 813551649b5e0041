"""Typed extractors (purchase order / proforma invoice) — reference
regex-for-regex semantics (extractor/purchase_order.py,
extractor/performa_invoice.py) pinned on synthetic full documents."""

from __future__ import annotations

from documentai_spark.core.typed_extract import (
    extract_proforma_invoice, extract_purchase_order,
)
from documentai_spark.sources.po_docs import gen_po_text

PO_FULL = """PURCHASE ORDER
SELLER
ACME TRADING FZE
PO BOX 1234
PO NUMBER REF 9
BUYER
GULF IMPORTS LLC
DUBAI
UNITED ARAB EMIRATES
PO NUMBER: PO/77/A DATED 05.03.2024
DESCRIPTION OF GOODS
HOT ROLLED STEEL COILS
PRIME QUALITY
PARTIAL SHIPMENT ALLOWED
QUANTITY 1,500 MT
TOTAL USD 350,250.00
CFR DJIBOUTI SEAPORT (INCOTERMS 2020)"""


def test_po_full_document():
    e = extract_purchase_order(PO_FULL)
    assert e["po_number"] == "PO/77/A"
    assert e["po_date"] == "05.03.2024"
    # PO NUMBER shadow line skipped (purchase_order.py:29-31)
    assert e["seller_name"] == "ACME TRADING FZE, PO BOX 1234"
    assert e["buyer_name"] == "GULF IMPORTS LLC, DUBAI, UNITED ARAB EMIRATES"
    assert e["goods_description"] == "HOT ROLLED STEEL COILS PRIME QUALITY"
    assert e["quantity"] == "1500 MT"          # comma stripped
    assert e["currency"] == "USD" and e["total_value"] == "350,250.00"
    assert e["delivery_terms"].startswith("CFR DJIBOUTI SEAPORT")
    assert "INCOTERMS 2020" in e["delivery_terms"]
    # structurally-absent fields stay '' (purchase_order.py:63-84)
    assert e["unit_price"] == "" and e["payment_terms"] == ""
    assert e["governing_law_or_force_majeure"] == ""


def test_po_missing_dated_empties_number_and_date():
    t = PO_FULL.replace(" DATED 05.03.2024", "")
    e = extract_purchase_order(t)
    assert e["po_number"] == "" and e["po_date"] == ""


def test_po_indented_shadow_not_skipped():
    """The reference's startswith check runs on the RAW line, so an
    indented 'PO NUMBER' shadow line survives into seller_name."""
    t = PO_FULL.replace("PO NUMBER REF 9", "  PO NUMBER REF 9")
    e = extract_purchase_order(t)
    assert "PO NUMBER REF 9" in e["seller_name"]


def test_po_fixture_total_and_empty():
    assert extract_purchase_order("")["po_number"] == ""
    for i in range(60):  # generator corpus is fully parseable
        e = extract_purchase_order(gen_po_text(i))
        assert e["seller_name"] and e["buyer_name"]
        assert e["currency"] in ("USD", "EUR", "INR", "GBP")


PI_FULL = """PROFORMA INVOICE PI No PI-2024-001 Date 04-Mar-2024
Global Exports Ltd., 1 Harbour Rd, Singapore
ABC Importers LLC, Dubai, UAE
Shipment Terms | CIF Jebel Ali Delivery Window By 30-Apr-2024
Payment Terms: 30% advance, 70% against BL
Origin: India
Description HS Code Qty Unit Unit Price Amount
Basmati Rice Grade A 100630 500 MT 820.00 410,000.00
Cane Sugar 170199 200 MT 455.50 91,100.00
Total (USD) 501,100.00"""


def test_pi_full_document():
    e, goods = extract_proforma_invoice(PI_FULL)
    assert e["invoice_number"] == "PI-2024-001"
    assert e["invoice_date"] == "04-Mar-2024"
    assert e["contract_po_reference"] == "PI-2024-001"
    assert e["seller"].startswith("Global Exports Ltd.,")
    assert e["buyer"].startswith("ABC Importers LLC,")
    assert e["incoterm_named_place"] == "CIF Jebel Ali"
    assert e["shipment_period_or_delivery_date"] == "By 30-Apr-2024"
    assert e["payment_terms"] == "30% advance, 70% against BL"
    assert e["country_of_origin"] == "India"
    assert e["currency"] == "USD" and e["total_amount"] == "501100.00"
    # goods rows split from the right into 6 fields
    # (performa_invoice.py:55-64); note 'Basmati Rice Grade' keeps 'A'
    # as the hs_code slot candidate? no — rsplit(5) leaves the left rest
    assert len(goods) == 2
    g0 = goods[0]
    assert g0["description"] == "Basmati Rice Grade A"
    assert g0["hs_code"] == "100630" and g0["quantity"] == "500"
    assert g0["unit"] == "MT" and g0["unit_price"] == "820.00"
    assert g0["amount"] == "410000.00"          # comma stripped
    assert goods[1]["description"] == "Cane Sugar"


def test_pi_goods_table_stops_at_total():
    e, goods = extract_proforma_invoice(
        PI_FULL.replace("Cane Sugar 170199 200 MT 455.50 91,100.00\n", ""))
    assert len(goods) == 1


def test_typed_udfs(spark):
    from pyspark.sql import functions as F

    from documentai_spark.operators.typed_entities import (
        with_pi_entities, with_po_entities,
    )
    df = spark.createDataFrame([(0, PO_FULL), (1, "nothing here")],
                               ["doc_id", "text"])
    rows = {r.doc_id: r for r in
            with_po_entities(df).orderBy("doc_id").collect()}
    assert rows[0].po_number == "PO/77/A"
    assert rows[0].seller_name == "ACME TRADING FZE, PO BOX 1234"
    assert rows[1].po_number == "" and rows[1].seller_name == ""

    df2 = spark.createDataFrame([(0, PI_FULL)], ["doc_id", "text"])
    r = with_pi_entities(df2).first()
    assert r.invoice_number == "PI-2024-001"
    assert [g.description for g in r.goods] == ["Basmati Rice Grade A",
                                                "Cane Sugar"]


def test_lc_application_table_codes():
    """LC F-code table extraction (lc_application.py:16-37): normalized
    first-cell code match, value from cell 3 (or cell 2 on merged rows),
    first-wins across tables."""
    from documentai_spark.core.typed_extract import extract_lc_application

    html = """
    <table>
      <tr><td>F-40A</td><td>x</td><td>IRREVOCABLE</td></tr>
      <tr><td>f 31c</td><td>y</td><td>240115</td></tr>
      <tr><td>F32B</td><td>USD 500,000.00</td></tr>
      <tr><td>UNKNOWN</td><td>a</td><td>b</td></tr>
      <tr><td>ignored</td></tr>
    </table>
    <table>
      <tr><td>F-40A</td><td>z</td><td>SHOULD NOT OVERWRITE</td></tr>
    </table>
    """
    e = extract_lc_application(html)
    assert e["F-40A"] == "IRREVOCABLE"          # first-wins
    assert e["F-31C"] == "240115"               # normalized 'f 31c'
    assert e["F32B"] == "USD 500,000.00"        # 2-cell merged row
    assert "UNKNOWN" not in e and len(e) == 3

    # existing entities are preserved, not overwritten
    e2 = extract_lc_application(html, {"F-40A": "KEEP"})
    assert e2["F-40A"] == "KEEP"


def test_lc_plus_rule_validation_roundtrip():
    """LC codes feed the cross-field date rule (the reference's marquee
    check: expiry 31D on-or-after issue 31C) through the same rule core."""
    from documentai_spark.core.rules import compile_rules, validate_entities
    from documentai_spark.core.typed_extract import extract_lc_application

    html = ("<table><tr><td>F-31C</td><td>.</td><td>240115</td></tr>"
            "<tr><td>F31D</td><td>.</td><td>240315</td></tr></table>")
    ents = {k.lower().replace("-", ""): v
            for k, v in extract_lc_application(html).items()}
    rules = compile_rules(["f31d must be on or after f31c"])
    res = validate_entities(rules, ents)
    assert res["overall_valid"]


def test_text_table_detection():
    """extract_tables_from_text semantics (app.py:830-851), incl. the
    single-row bridge quirk: a 1-row table is NOT reset by non-row lines."""
    from documentai_spark.core.typed_extract import extract_text_tables

    t = """header prose line
col1  col2  col3
a  b  c
x\ty\tz
plain text again
lone  row
more prose
second  part
tail"""
    tables = extract_text_tables(t)
    # table 1: three consecutive multi-field lines
    assert tables[0] == [["col1", "col2", "col3"], ["a", "b", "c"],
                         ["x", "y", "z"]]
    # the quirk: 'lone  row' (1-row table) survives 'more prose' and
    # 'second  part' joins it; 'tail' then closes the 2-row table
    assert tables[1] == [["lone", "row"], ["second", "part"]]
    assert len(tables) == 2

    assert extract_text_tables("no tables here\njust prose") == []
    assert extract_text_tables("") == []
    # a trailing single-row table is discarded (len > 1 required)
    assert extract_text_tables("prose\nonly  one") == []
    # a trailing multi-row table IS emitted
    assert extract_text_tables("a  b\nc  d") == [[["a", "b"], ["c", "d"]]]


def test_transcripts_fixture_is_ascii():
    """The text_tables DuckDB oracle splits on an ASCII whitespace class
    while _TABLE_SPLIT uses Unicode \\s; the engines agree only because
    the committed fixture is ASCII. Pin that assumption here — a future
    fixture with \\xa0/\\x85 whitespace must fail loudly, not silently
    diverge at the gate (ADVICE r3)."""
    import pyarrow.parquet as pq

    from tools.freeze_pipeline_expected import FIXTURE

    texts = pq.read_table(FIXTURE, columns=["text"])["text"].to_pylist()
    assert texts and all(t is None or t.isascii() for t in texts)
