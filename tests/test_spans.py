"""Entity span cascade (J1/J2/J3 + U10) + categorized entities.

core/spans.py is the pure-Python spec of the reference's
find_entity_bounding_box cascade (entity-extraction-service/
app.py:682-755); the UDF test pins Spark == spec over the fixture domain.
"""

from __future__ import annotations

from documentai_spark.core.entities import extract_entities
from documentai_spark.core.spans import (
    entity_spans, find_entity_span, word_boxes,
)


def test_word_boxes_offsets():
    t = "  PO NUMBER: ABC-1  "
    boxes = word_boxes(t)
    assert [(b.text, t[b.begin:b.end]) for b in boxes] == [
        ("PO", "PO"), ("NUMBER:", "NUMBER:"), ("ABC-1", "ABC-1")]


def test_exact_single_token_match():
    t = "pay with USD now"
    span = find_entity_span("USD", word_boxes(t))
    assert span == (9, 12) and t[9:12] == "USD"


def test_consecutive_multiword_match_merges_envelope():
    # stage 2 (app.py:705-725): first word matches a token, remaining
    # words match the following tokens in order; envelope = min/max
    t = "total due USD 1,234.56 by friday"
    span = find_entity_span("USD 1,234.56", word_boxes(t))
    assert span == (10, 22) and t[span[0]:span[1]] == "USD 1,234.56"


def test_multiword_broken_run_falls_through_to_containment():
    # "USD X" with an interloper token -> consecutive scan breaks
    # (app.py:718-720), containment then hits the first token that
    # contains-or-is-contained (app.py:727-731): "1,234.56" ⊂ value
    t = "price USD, not 1,234.56"
    span = find_entity_span("USD 1,234.56", word_boxes(t))
    assert span == (15, 23)  # the "1,234.56" token


def test_containment_fuzzy_match():
    # value embedded in a bigger token: token contains entity
    t = "ref:ABC-1;status"
    span = find_entity_span("abc-1", word_boxes(t))
    assert span == (0, 16)


def test_no_match_returns_none():
    assert find_entity_span("zzz", word_boxes("nothing here")) is None
    assert find_entity_span("", word_boxes("a b")) is None
    assert find_entity_span("x", []) is None


def test_case_insensitive_match():
    t = "Incoterm CIF applies"
    assert find_entity_span("cif", word_boxes(t)) == (9, 12)


def test_entity_spans_sorted_fields_and_slices():
    t = "PO NUMBER: PO-77/A DATED 01.02.2024 amount USD 99.50 CIF"
    ents = extract_entities(t)
    spans = entity_spans(t, ents)
    assert [s.field for s in spans] == sorted(ents)
    for s in spans:
        if s.begin is not None:
            # envelope indexes into the text and covers the value's tokens
            assert 0 <= s.begin < s.end <= len(t)
    by_field = {s.field: s for s in spans}
    assert t[by_field["incoterm"].begin:by_field["incoterm"].end] == "CIF"
    ca = by_field["currency_amount"]
    assert t[ca.begin:ca.end] == "USD 99.50"


def test_entity_udf_matches_core_spec(spark):
    """Spark entity_spans column == core.spans.entity_spans, row by row."""
    from pyspark.sql import functions as F

    from documentai_spark.operators.extraction import with_entities

    texts = [
        "PO NUMBER: X-1 DATED 02.03.2024 USD 5,000.00 FOB a@b.co",
        "PI No: P-9 Date 4-Mar-2024 EUR 7.25",
        "no entities at all here",
        "",
        ":46A: docs required GBP 12,345",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    rows = (with_entities(df, extracted_col="text")
            .select("doc_id", "entity_spans").orderBy("doc_id").collect())
    for r in rows:
        t = texts[r.doc_id]
        expect = entity_spans(t, extract_entities(t))
        got = [(s.field, s.value, s.begin, s.end) for s in r.entity_spans]
        assert got == [tuple(e) for e in expect], t
        for s in r.entity_spans:  # offsets really index into the text
            if s.begin is not None:
                assert s.value.strip().lower() in t[s.begin:s.end].lower() \
                    or t[s.begin:s.end].lower() in s.value.strip().lower()


def test_categorized_entities(spark):
    from documentai_spark.functions.categorize import (
        with_categorized_entities,
    )
    from documentai_spark.operators.extraction import with_entities

    t = "PO NUMBER: X-1 DATED 02.03.2024 USD 5,000.00 FOB a@b.co"
    df = spark.createDataFrame([(0, t), (1, "nothing")], ["doc_id", "text"])
    out = (with_categorized_entities(
               with_entities(df, extracted_col="text"), "purchase_order")
           .orderBy("doc_id").collect())
    cats = out[0].categorized_entities
    assert set(cats) == {"Basic Information", "Amounts", "Terms", "Contact"}
    basic = {e.label: e.value for e in cats["Basic Information"]}
    assert basic == {"Po Number": "X-1", "Date Numeric": "02.03.2024"}
    assert all(e.confidence == 0.85
               for es in cats.values() for e in es)
    assert out[1].categorized_entities == {}  # empty categories dropped
