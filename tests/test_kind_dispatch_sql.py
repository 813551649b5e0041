"""The SQL-expressed content-kind rule (q_t_kind_dispatch) must agree with
the oracle's detect_kind on every committed test-table row — this is what
makes the driver's cross-engine check meaningful."""

from __future__ import annotations

import duckdb

from __spark_entry__ import (
    _KIND_BLOCKSEP, _KIND_HTML_PAT, _KIND_MULTICOL, TRANSCRIPTS_TEST,
)
from documentai_spark.core.textkind import detect_kind


def test_sql_kind_equals_oracle_kind():
    rows = duckdb.sql(
        f"""SELECT text, CASE
              WHEN regexp_matches(text, '{_KIND_HTML_PAT}') THEN 'html'
              WHEN contains(text, chr(10))
                   AND (regexp_matches(text, '{_KIND_BLOCKSEP}')
                        OR regexp_matches(text, '{_KIND_MULTICOL}'))
                   THEN 'layout'
              ELSE 'plain' END AS kind
            FROM read_parquet('{TRANSCRIPTS_TEST}/*.parquet')""").fetchall()
    assert len(rows) > 5000
    for text, sql_kind in rows:
        assert sql_kind == detect_kind(text), repr(text[:80])


# the three-engine traps the committed (ASCII, lowercase) table cannot
# exercise: uppercase tags (Python re.IGNORECASE is Unicode-aware, Java's
# is ASCII — hence the explicit [hH]-style classes), Unicode case-fold
# confusables (ſ U+017F folds to 's', K U+212A to 'k' under (?i) on some
# engines), \x0b adjacent to a cell gap (Java \s has \x0b, RE2 \s does
# not — hence the explicit whitespace class), and tab-separated cells
ADVERSARIAL = [
    "<P>hello</P>", "<TABLE><TR><TD>x</TD></TR></TABLE>", "<BR/>",
    "<A HREF='/x'>l</A>", "<DiV class='a'>y</DiV>",
    "ſpan test <ſpan>", "KKb <Kelvin>",
    "a\n\x0b  \x0bb", "x\v\vy\nz",
    "Name\tQty\nSteel\t5", "x \t y\nz", "col1  col2\nrow",
    "one\ntwo", "plain text", "a < b > c", "<notatag>x</notatag>",
    "line one\n\nline two", "price<p>x",
]


def test_sql_kind_adversarial_rows():
    """DuckDB RE2 leg of the three-engine pin on inputs the committed
    table never contains (tests/test_formulation_portability is the
    pattern; the Spark rlike leg is test_spark_kind_adversarial_rows)."""
    for text in ADVERSARIAL:
        sql_kind = duckdb.sql(
            f"""SELECT CASE
                  WHEN regexp_matches(t, '{_KIND_HTML_PAT}') THEN 'html'
                  WHEN contains(t, chr(10))
                       AND (regexp_matches(t, '{_KIND_BLOCKSEP}')
                            OR regexp_matches(t, '{_KIND_MULTICOL}'))
                       THEN 'layout'
                  ELSE 'plain' END
                FROM (SELECT ? AS t)""", params=[text]).fetchone()[0]
        assert sql_kind == detect_kind(text), repr(text)


def test_spark_kind_adversarial_rows(spark):
    """Java-regex (rlike) leg of the three-engine pin, via the same
    expression q_t_kind_dispatch builds."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], ["text"])
    kind = (F.when(F.col("text").rlike(_KIND_HTML_PAT), "html")
             .when(F.col("text").contains("\n")
                   & (F.col("text").rlike(_KIND_BLOCKSEP)
                      | F.col("text").rlike(_KIND_MULTICOL)), "layout")
             .otherwise("plain"))
    for row in df.select("text", kind.alias("kind")).collect():
        assert row.kind == detect_kind(row.text), repr(row.text)
