"""Rule-validation operator + selective preprocessing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from documentai_spark.operators.preprocess import (
    normalize_text, selective_preprocess,
)
from documentai_spark.operators.rules_op import (
    rule_failure_summary, with_rule_validation,
)

RULES = [
    "po_number must not be empty",
    "date_numeric must be a valid date",
    "amount must be greater than 1,000",
    "currency must be one of USD, EUR or GBP",
]


def test_rule_validation_operator(spark):
    rows = [
        (0, {"po_number": "PO-1", "date_numeric": "09.06.2024",
             "amount": "19,555.00", "currency": "USD"}),
        (1, {"po_number": "PO-2", "date_numeric": "99.99.2024",
             "amount": "500", "currency": "JPY"}),
        (2, {}),
    ]
    df = spark.createDataFrame(rows, "doc_id long, entities map<string,string>")
    out = {r.doc_id: r for r in with_rule_validation(df, RULES).collect()}
    assert out[0].rules_passed == 4 and out[0].overall_valid
    assert out[1].rules_passed == 1 and not out[1].overall_valid
    assert out[2].rules_passed == 0 and out[2].rules_failed == 4

    summary = {(r.field, r.rule_type): r
               for r in rule_failure_summary(
                   with_rule_validation(df, RULES)).collect()}
    assert summary[("po_number", "not_empty")].n == 3
    assert summary[("po_number", "not_empty")].n_passed == 2


def test_normalize_text_kernel():
    out, ch = normalize_text("bro-\nken  words\x00 here")
    assert out == "broken words here" and ch
    out2, ch2 = normalize_text("already clean")
    assert out2 == "already clean" and not ch2


def test_selective_preprocess(spark):
    rows = [
        ("c1", 0, "messy  text\x01 with   gaps " + "pad " * 20, True),
        ("c1", 1, "clean text stays untouched entirely", False),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string, "
              "needs_preprocessing boolean")
    out = {r.turn_idx: r for r in selective_preprocess(df).collect()}
    assert out[0].was_preprocessed
    assert "  " not in out[0].preprocessed_text
    assert "\x01" not in out[0].preprocessed_text
    assert not out[1].was_preprocessed
    assert out[1].preprocessed_text == out[1].extracted_text
    # X1: the untouched branch must not run the UDF — check the plan
    plan = selective_preprocess(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("preprocess_udf") <= 2  # only on the filtered branch


def test_parse_goods_row(spark):
    """O5 right-anchored split (performa_invoice.py rsplit(' ',5))."""
    from documentai_spark.functions.goods import parse_goods_row
    rows = [
        (0, "steel widgets large size  7208.39  100  PCS  12.50  1,250.00"),
        (1, "x 1 2 3 4 5"),
        (2, "too short row"),
    ]
    df = spark.createDataFrame(rows, ["i", "line"])
    out = {r.i: r.g for r in df.select(
        "i", parse_goods_row(df.line).alias("g")).collect()}
    g = out[0]
    assert g.description == "steel widgets large size"
    assert g.hs_code == "7208.39" and g.qty == "100" and g.unit == "PCS"
    assert g.unit_price == "12.50" and g.amount == "1,250.00"
    assert out[1].description == "x" and out[1].amount == "5"
    assert out[2] is None
