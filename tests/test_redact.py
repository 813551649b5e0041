"""Entity-redaction tests: pinned masking semantics + core/Spark
byte-equality (the pure-Python core is the oracle)."""

from __future__ import annotations

from documentai_spark.core.redact import REDACT_FIELDS, redact_text


def test_redact_semantics_core():
    t = ("PO NUMBER: ABC-123 dated 01.02.2024, pay USD 1,250.50 to "
         "bob@example.com; ref PO again ABC-123, call +1 555-123-4567")
    out = redact_text(t)
    assert "[PO_NUMBER]" in out and "ABC-123" not in out
    assert out.count("[PO_NUMBER]") == 2         # every identical occurrence
    assert "[DATE_NUMERIC]" in out and "01.02.2024" not in out
    assert "[CURRENCY_AMOUNT]" in out and "1,250.50" not in out
    assert "[EMAIL]" in out and "bob@example.com" not in out
    assert "[PHONE]" in out


def test_redact_scope_is_extractor_surface():
    """First-match-wins: a SECOND, different PO value stays (redaction
    is exactly as strong as extraction); incoterms are not redacted."""
    t = "PO NUMBER: AAA-1 then PO NUMBER: BBB-2 shipped FOB"
    out = redact_text(t)
    assert "[PO_NUMBER]" in out and "AAA-1" not in out
    assert "BBB-2" in out and "FOB" in out


def test_redact_none_and_empty():
    assert redact_text(None) is None
    assert redact_text("") == ""
    assert redact_text("no entities here at all") == \
        "no entities here at all"


def test_spark_redaction_byte_equals_core(spark):
    """The JVM replace chain must byte-match core.redact_text on texts
    covering every field, overlaps, repeats, and empty/None lanes."""
    from documentai_spark.functions.redact import with_redaction
    from documentai_spark.operators.extraction import with_entities

    texts = [
        "PO NUMBER: X/9 pay EUR 5,000 via bob@x.co on 12/11/2023",
        "PI No. P-77 delivery 3-Jan-2024 call +44 20 7946 0958 ok",
        "PO NUMBER: X/9 again PO NUMBER: Y/8 and EUR 5,000 EUR 5,000",
        "dates 01.02.2024 and 01.02.2024 and 02.03.2025",
        "",
        "plain text with no entities whatsoever in it",
        "edge USD 1 and more USD 1 text",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    out = with_redaction(with_entities(df, extracted_col="text"))
    got = {r.doc_id: r.redacted_text for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == redact_text(t), (i, got[i], redact_text(t))


def test_word_boundary_mode_core():
    """VERDICT r5 #6: a short extracted value embedded inside a longer
    token stays intact in word_boundary mode (default mode over-redacts
    by contract); standalone occurrences still redact everywhere."""
    t = ("PO NUMBER: AB dated 01.02.2024; see SLAB and ABS, "
         "then AB again and AB, done")
    plain = redact_text(t)
    assert "SL[PO_NUMBER]" in plain            # the documented contract
    bounded = redact_text(t, word_boundary=True)
    assert "SLAB" in bounded and "ABS" in bounded
    assert bounded.count("[PO_NUMBER]") == 3   # AB, AB again, AB,
    assert "[DATE_NUMERIC]" in bounded


def test_word_boundary_ascii_semantics_core():
    """``\\b`` must use the ASCII word set in core (``re.ASCII``):
    Java regex and DuckDB's RE2 both treat a non-ASCII letter as a
    NON-word char, so a value followed by e.g. 'é' redacts there — core
    must agree or three-engine parity breaks on non-ASCII neighbors."""
    t = "PO NUMBER: AB then ABé done"
    bounded = redact_text(t, word_boundary=True)
    assert bounded.count("[PO_NUMBER]") == 2
    assert "[PO_NUMBER]é" in bounded


def test_word_boundary_nonword_edges_core():
    """Values whose edges are NON-word chars (a phone with leading +)
    must not get an inverted \\b guard: the bounded pattern still
    matches the standalone occurrence."""
    t = "call +1 555-123-4567 now"
    bounded = redact_text(t, word_boundary=True)
    assert "[PHONE]" in bounded and "555-123-4567" not in bounded


def test_word_boundary_spark_equals_core_and_duckdb(spark):
    """Three-engine agreement for the bounded form: the Spark
    regexp_replace chain byte-matches core, and a DuckDB oracle that
    re-derives the SAME escape chain + conditional boundary guards in
    SQL (RE2) replays every row."""
    import duckdb

    from documentai_spark.core.redact import REGEX_SPECIALS
    from documentai_spark.functions.redact import with_redaction
    from documentai_spark.operators.extraction import with_entities

    texts = [
        "PO NUMBER: AB inside SLAB and alone AB ok",
        "PO NUMBER: AB then ABé and AB ok",   # non-ASCII neighbor
        "PO NUMBER: X/9 pay EUR 5,000 via bob@x.co on 12/11/2023",
        "PI No. P-77 delivery 3-Jan-2024 call +44 20 7946 0958 ok",
        "dates 01.02.2024 and x01.02.2024y and 01.02.2024",
        "",
        "plain text with no entities whatsoever in it",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    out = with_redaction(with_entities(df, extracted_col="text"),
                         word_boundary=True)
    got = {r.doc_id: r.redacted_text for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == redact_text(t, word_boundary=True), (i, got[i])

    # DuckDB replay: per (text, value, tag) row, build the pattern with
    # the identical chained-replace escape + CASE boundary guards, then
    # global regexp_replace
    esc_sql = "v"
    for ch in REGEX_SPECIALS:
        lit = ch.replace("'", "''")
        esc_sql = (f"replace({esc_sql}, '{lit}', '\\' || '{lit}')")
    pat_sql = (
        "(CASE WHEN regexp_matches(substr(v, 1, 1), '^[A-Za-z0-9_]$') "
        "THEN '\\b' ELSE '' END) || " + esc_sql + " || "
        "(CASE WHEN regexp_matches(substr(v, length(v), 1), "
        "'^[A-Za-z0-9_]$') THEN '\\b' ELSE '' END)")
    from documentai_spark.core.entities import extract_entities
    for t in texts:
        cur = t
        for field in REDACT_FIELDS:
            v = extract_entities(t).get(field)
            if not v:
                continue
            (cur,) = duckdb.sql(
                "SELECT regexp_replace(t, " + pat_sql + ", tag, 'g') "
                "FROM (SELECT ? AS t, ? AS v, ? AS tag)",
                params=[cur, v, f"[{field.upper()}]"]).fetchone()
        assert cur == redact_text(t, word_boundary=True), (t, cur)


def test_redaction_output_collision_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from documentai_spark.functions.redact import with_redaction
    from documentai_spark.operators.extraction import with_entities
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    base = with_entities(df, extracted_col="text") \
        .withColumn("redacted_text", F.lit("y"))
    with pytest.raises(ValueError, match="already exists"):
        with_redaction(base)
