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
    """O5 right-anchored split: the Spark column form must agree
    byte-for-byte with core.typed_extract.parse_goods_line (the
    reference's rsplit(' ', 5) + per-field strip + amount comma-strip),
    including on multi-space rows where a naive \\s+ split diverges."""
    from documentai_spark.core.typed_extract import parse_goods_line
    from documentai_spark.functions.goods import parse_goods_row
    rows = [
        (0, "Steel Widgets Mk II 7208.39 100 PCS 12.50 1,250.00"),
        (1, "x 1 2 3 4 5"),
        (2, "too short row"),
        # consecutive spaces: rsplit(" ", 5) takes the last 5 SINGLE-space
        # boundaries, so 'PCS' lands in hs_code and two fields are empty
        (3, "steel widgets large size  7208.39  100  PCS  12.50  1,250.00"),
        (4, "  padded row 7208.39 100 PCS 12.50 99,000.10  "),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["i", "line"])
    out = {r.i: r.g for r in df.select(
        "i", parse_goods_row(df.line).alias("g")).collect()}
    for i, line in rows:
        expect = parse_goods_line(line)
        got = None if out[i] is None else out[i].asDict()
        assert got == expect, f"row {i}: {got} != core {expect}"
    # spot-check the canonical row's values (incl. the comma-strip)
    g = out[0]
    assert g.description == "Steel Widgets Mk II"
    assert g.hs_code == "7208.39" and g.quantity == "100"
    assert g.unit == "PCS" and g.unit_price == "12.50"
    assert g.amount == "1250.00"


def test_cross_field_date_comparison_grammar():
    from documentai_spark.core.rules import parse_english_rule

    r = parse_english_rule("expiry date must be on or after issue date")
    assert r["type"] == "date_comparison"
    assert r["field"] == "expiry_date"
    assert r["parameters"] == {"compare_with": "issue_date",
                               "operator": ">="}
    r = parse_english_rule("expiry date must be after issue date")
    assert r["parameters"]["operator"] == ">"


def test_date_comparison_dual_parse_quirk():
    """The YYMMDD-first parse (validation_engine.py:219-234): '200115' is
    2020-01-15; '311220' is day-31-month-12 only via the DDMMYY fallback
    (YYMMDD would need day=20 of month 12 in year 2031 — valid! so it
    stays YYMMDD: 2031-12-20)."""
    from documentai_spark.core.rules import (
        _parse_6digit_date, parse_english_rule, validate_rule,
    )

    assert _parse_6digit_date("200115").isoformat()[:10] == "2020-01-15"
    # YYMMDD valid -> wins even though DDMMYY would also be valid
    assert _parse_6digit_date("311220").isoformat()[:10] == "2031-12-20"
    # YYMMDD invalid (day 40) -> DDMMYY fallback
    assert _parse_6digit_date("150140").isoformat()[:10] == "2040-01-15"
    rule = parse_english_rule("expiry must be on or after issue")
    # 2021-01-01 >= 2020-06-15
    assert validate_rule(rule, "210101", {"issue": "200615"})
    assert not validate_rule(rule, "200615", {"issue": "210101"})
    # equal dates pass >= but not >
    gt = parse_english_rule("expiry must be after issue")
    assert validate_rule(rule, "200615", {"issue": "200615"})
    assert not validate_rule(gt, "200615", {"issue": "200615"})
    # non-6-digit (dd.mm.yyyy) fails — the reference parse_date supports
    # only 6-digit shapes inside comparisons (validation_engine.py:221-234)
    assert not validate_rule(rule, "01.02.2024", {"issue": "200615"})
    # missing comparison field fails (validation_engine.py:217-219)
    assert not validate_rule(rule, "210101", {})
    # invalid in both readings (month 13) fails
    assert not validate_rule(rule, "151340", {"issue": "200615"})


def test_unique_and_multiple_choice():
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    u = parse_english_rule("po number must be unique")
    assert u["type"] == "unique" and u["field"] == "po_number"
    assert validate_rule(u, "X-1", {})          # non-empty passes
    assert not validate_rule(u, "  ", {})       # empty fails

    mc = parse_english_rule("status should be active or closed or pending")
    assert mc["type"] == "multiple_choice"
    assert mc["parameters"]["choices"] == ["ACTIVE", "CLOSED", "PENDING"]
    assert validate_rule(mc, "Active", {})      # case-insensitive
    assert not validate_rule(mc, "bogus", {})

    # grammar ordering: 'one of' still wins over multiple_choice,
    # 'on or after' never parses as choices
    oo = parse_english_rule("currency must be one of USD, EUR or GBP")
    assert oo["type"] == "one_of"
    dc = parse_english_rule("expiry must be on or after issue")
    assert dc["type"] == "date_comparison"


def test_max_length_between_date_format():
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    ml = parse_english_rule("po number must be maximum 16 characters")
    assert ml["type"] == "max_length"
    assert ml["parameters"] == {"max_length": 16}
    assert validate_rule(ml, "X" * 16, {})
    assert not validate_rule(ml, "X" * 17, {})

    # the SWIFT 35x4 form: chars-per-line x lines
    mlx = parse_english_rule("goods description must be max 35x4")
    assert mlx["type"] == "max_length"
    assert mlx["parameters"] == {"max_chars_per_line": 35, "max_lines": 4}
    assert validate_rule(mlx, "\n".join(["a" * 35] * 4), {})
    assert not validate_rule(mlx, "\n".join(["a" * 36] * 2), {})
    assert not validate_rule(mlx, "\n".join(["a"] * 5), {})

    bt = parse_english_rule("amount must be between 100 and 5,000")
    assert bt["type"] == "between"
    assert bt["parameters"] == {"min_val": 100.0, "max_val": 5000.0}
    assert validate_rule(bt, "USD 4,999.50", {})   # currency-tolerant parse
    assert validate_rule(bt, "100", {})
    assert not validate_rule(bt, "99.99", {})
    assert not validate_rule(bt, "not a number", {})

    df = parse_english_rule("issue date must be a date in YYMMDD format")
    assert df["type"] == "date_format"
    assert df["parameters"] == {"format": "YYMMDD"}
    assert validate_rule(df, "200115", {})         # 2020-01-15
    assert not validate_rule(df, "201315", {})     # month 13, NO fallback
    ddf = parse_english_rule("issue date must be a date in DDMMYY format")
    assert validate_rule(ddf, "151320", {}) is False  # month 13
    assert validate_rule(ddf, "311220", {})        # 31 Dec 2020
    assert not validate_rule(df, "01.02.2024", {})


def test_currency_requires_positive_amount():
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    c = parse_english_rule("total must be in currency format")
    assert c["type"] == "currency"
    assert validate_rule(c, "USD 1,250.00", {})
    assert not validate_rule(c, "USD 0", {})       # amount must be > 0
    assert not validate_rule(c, "us dollars 5", {})


def test_exact_match_reference_semantics():
    """Case-insensitive equals + first-word acceptance + the 40E UCP
    equivalence (validate_exact_match, validation_engine.py:96-122)."""
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    eq = parse_english_rule("currency must equal usd")
    assert validate_rule(eq, "USD", {})            # case-insensitive
    eq2 = parse_english_rule("terms must equal CIF Singapore Port")
    assert validate_rule(eq2, "cif singapore port", {})
    assert validate_rule(eq2, "CIF", {})           # first word accepted
    assert not validate_rule(eq2, "FOB", {})

    ucp = parse_english_rule("40E must equal UCP LATEST VERSION")
    assert validate_rule(ucp, "UCP", {})           # 40E equivalence
    assert validate_rule(ucp, "UCP LATEST VERSION", {})


def test_validate_field_name_driven():
    """Field-NAME-driven format checks with graded failure confidences
    (validate_field, app.py:852-887); the elif chain means 'date' wins
    over 'number' when both substrings appear."""
    from documentai_spark.core.rules import validate_field

    ok = validate_field("po_number", "PO-123")
    assert ok == {"is_valid": True, "message": "Valid", "confidence": 1.0}
    bad = validate_field("po_number", "PO 123!")
    assert not bad["is_valid"] and bad["confidence"] == 0.5

    assert validate_field("invoice_date", "4/5/2024")["is_valid"]
    d = validate_field("invoice_date", "2024.05.04")
    assert not d["is_valid"] and d["confidence"] == 0.3
    # 'date' beats 'number' in the elif chain
    n = validate_field("date_number", "not-a-date!")
    assert n["confidence"] == 0.3

    assert validate_field("total_amount", "$ 1,234.56")["is_valid"]
    a = validate_field("total_amount", "12a4")
    assert not a["is_valid"] and a["confidence"] == 0.4

    assert validate_field("contact_email", "a.b@x.co")["is_valid"]
    e = validate_field("contact_email", "nope")
    assert not e["is_valid"] and e["confidence"] == 0.2

    # unmatched field names validate trivially
    assert validate_field("freeform_notes", "anything !@#")["is_valid"]


def test_comparison_grammar_family():
    """r7 review: the >=/<= phrase family. 'at most N' used to compile
    to max_length (a STRING length check that passed '9999' against
    'at most 500'); 'at least N' matched nothing and the rule was
    silently dropped; 'greater than or equal to N' fell through to
    multiple_choice (choices ['GREATER THAN', 'EQUAL TO 100']). All now
    compile to proper numeric comparisons — placed before
    multiple_choice in the grammar."""
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    cases = {
        "amount must be at least 100": ("greater_or_equal", 100.0),
        "amount must be not less than 100": ("greater_or_equal", 100.0),
        "amount must be greater than or equal to 100":
            ("greater_or_equal", 100.0),
        "amount must be at most 500": ("less_or_equal", 500.0),
        "amount must be not more than 500": ("less_or_equal", 500.0),
        "amount must be less than or equal to 500":
            ("less_or_equal", 500.0),
    }
    for sentence, (rtype, thr) in cases.items():
        r = parse_english_rule(sentence)
        assert r is not None and r["type"] == rtype, sentence
        assert r["parameters"]["value"] == thr, sentence

    gte = parse_english_rule("amount must be at least 100")
    assert validate_rule(gte, "100")          # boundary INCLUDED
    assert validate_rule(gte, "101")
    assert not validate_rule(gte, "99")
    lte = parse_english_rule("amount must be at most 500")
    assert validate_rule(lte, "500")
    assert not validate_rule(lte, "9999")     # the old max_length pass

    # 'must be maximum N' still compiles to the string length check
    ml = parse_english_rule("ref must be maximum 10")
    assert ml["type"] == "max_length"

    # 'on or before' is a date comparison, not multiple_choice
    d = parse_english_rule("issue_date must be on or before expiry_date")
    assert d["type"] == "date_comparison"
    assert d["parameters"]["operator"] == "<="
    ents = {"expiry_date": "240110", "issue_date": "240105"}
    assert validate_rule(d, ents["issue_date"], ents)
    assert not validate_rule(d, "240111", {"expiry_date": "240110"})


def test_comparisons_are_currency_tolerant():
    """r7 review: greater/less_than used the plain numeric parse and
    rejected 'USD 500' outright while 'between' stripped the currency —
    every comparison now shares the reference's $/USD/EUR strip. The
    'must be a number' check keeps the STRICT parse (oracle-pinned:
    a currency prefix is not 'a number')."""
    from documentai_spark.core.rules import parse_english_rule, validate_rule

    gt = parse_english_rule("total must be greater than 100")
    assert validate_rule(gt, "USD 500")
    assert validate_rule(gt, "$1,000")
    assert not validate_rule(gt, "EUR 50")
    num = parse_english_rule("total must be a number")
    assert not validate_rule(num, "USD 500")   # unchanged strict parse


def test_validate_field_none_quirk_pinned():
    """Reference-verbatim (app.py:852-887): str(None)='None' matches the
    case-insensitive number pattern, so an absent value is graded VALID
    on number-named fields while date/amount/email fields fail it.
    Pinned so a future 'fix' is a conscious decision (r7 review)."""
    from documentai_spark.core.rules import validate_field

    assert validate_field("po_number", None)["is_valid"] is True
    assert validate_field("issue_date", None)["is_valid"] is False
    assert validate_field("total_amount", None)["is_valid"] is False
    assert validate_field("contact_email", None)["is_valid"] is False
