"""Cross-engine pins for the token / stopword / fingerprint
formulations on ADVERSARIAL inputs (r7 review): vertical tab (Java \\s
has \\x0b, RE2's \\s does not — hence the explicit class), non-ASCII
letters adjacent to stopwords (Java \\b is Unicode-aware, RE2's \\b and
Python's re.ASCII \\b are not — hence Spark's explicit ASCII
lookarounds), NULL text (pinned to 0 tokens / 0 stopwords everywhere),
NBSP, \\x1c, and boundary tabs. Each gate pair is run end-to-end:
queries() on Spark vs oracle_sql() on DuckDB over the same parquet.
"""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entry
from tools.check_correctness import normalize

ROWS = [
    (0, "the cat sat on the mat and the dog ran by the tree in it"),
    (1, "a\x0bb the c d"),               # \x0b IS a token split (Java \s)
    (2, None),                            # NULL text: 0 tokens, no crash
    (3, "\tthe quick fox ran far"),       # leading tab -> boundary empty
    (4, "aérospace café the a of né and"),  # Unicode vs ASCII \b
    (5, ""),
    (6, "word joined the end one"),  # NBSP is NOT whitespace
    (7, "x\x1cy the a"),                  # \x1c: token glue, ml-split
]

QUERIES = [
    "doc_token_stats", "doc_lang_quality", "doc_fingerprint",
    "bpe_token_count", "corpus_report", "rep_signals",
    "stratified_sample", "pack_sequences",
]


@pytest.fixture(scope="module")
def adv_sf(spark, tmp_path_factory):
    """A documents.parquet of adversarial texts, usable as an sf_dir."""
    d = tmp_path_factory.mktemp("advsf")
    spark.createDataFrame(ROWS, "doc_id long, text string") \
         .coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(adv_sf):
    import duckdb
    c = duckdb.connect()
    c.sql("CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{adv_sf}/documents.parquet/*.parquet')")
    return c


@pytest.mark.parametrize("name", QUERIES)
def test_gate_pair_agrees_on_adversarial_text(spark, adv_sf, con, name):
    sdf = entry.queries()[name](spark, adv_sf).toPandas()
    odf = con.sql(entry.oracle_sql()[name]).df()
    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)


def test_token_and_stopword_values_pinned(spark, adv_sf):
    """Spot-pin the interesting rows so a future 'both engines drifted
    together' regression is still visible, and pin the PYTHON leg
    (core.textstats) to the same numbers."""
    from documentai_spark.core.textstats import (
        stopword_ratio, token_count,
    )

    got = {r.doc_id: r for r in
           entry.queries()["doc_lang_quality"](spark, adv_sf).collect()}
    # \x0b splits: 'a', 'b', 'the', 'c', 'd' -> 5 tokens; stopwords
    # 'a' (bounded by \x0b) and 'the' -> 2
    assert (got[1].n_tokens, got[1].n_stopwords) == (5, 2)
    # NULL text: 0 tokens, 0 stopwords, ratio 0.0, unknown
    assert (got[2].n_tokens, got[2].n_stopwords,
            got[2].stopword_ratio, got[2].lang_pred) == \
        (0, 0, 0.0, "unknown")
    # leading tab survives the space-trim -> a boundary empty token
    assert got[3].n_tokens == 6
    # ASCII boundaries: 'a' matches inside 'aérospace' (é is not an
    # ASCII word char, so there IS a boundary after 'a'), plus the bare
    # 'the', 'a', 'of', 'and' -> 5. Java's Unicode \b would see no
    # boundary and give 4 — this row detects a lookaround regression.
    assert got[4].n_stopwords == 5
    # NBSP does not split: 'word\xa0joined','the','end','one' -> 4/1
    assert (got[6].n_tokens, got[6].n_stopwords) == (4, 1)
    # \x1c does not split the whitespace tokenization
    assert (got[7].n_tokens, got[7].n_stopwords) == (3, 2)

    for i, text in ROWS:
        assert token_count(text) == got[i].n_tokens, i
        assert stopword_ratio(text) == got[i].stopword_ratio, i


def test_entity_patterns_re2_whitespace_pinned():
    """r7 review: Python's ASCII \\s includes \\x0b, RE2's does not — a
    within-ASCII divergence the fixtures' ASCII-only assertion cannot
    catch. The core entity/typed patterns now spell [ \\t\\n\\f\\r]
    explicitly: both engines agree that a vertical tab does NOT glue
    'PO NUMBER' together, and still match every real separator."""
    import duckdb

    from documentai_spark.core.entities import extract_entities

    good = "PO NUMBER:\tPO-77 DATED 01.02.2024 total USD 5,000.00"
    bad = "PO\x0bNUMBER:\x0bPO-77 says USD\x0b5,000.00"

    py_good = extract_entities(good)
    py_bad = extract_entities(bad)
    assert py_good.get("po_number") == "PO-77"
    assert py_good.get("currency_amount") == "USD 5,000.00"
    assert "po_number" not in py_bad or py_bad.get("po_number") is None
    assert not py_bad.get("currency_amount")

    for text, field, pat, expect in [
            (good, "po_number", r"PO\s+NUMBER[:\s]+([A-Z0-9/\-]+)",
             "PO-77"),
            (bad, "po_number", r"PO\s+NUMBER[:\s]+([A-Z0-9/\-]+)", ""),
            (good, "currency_amount",
             r"\b([A-Z]{3})\s+([\d,]+(?:\.\d+)?)\b", "USD 5,000.00"),
            (bad, "currency_amount",
             r"\b([A-Z]{3})\s+([\d,]+(?:\.\d+)?)\b", "")]:
        got = duckdb.sql(
            "select regexp_extract($$" + text + "$$, '" + pat + "', "
            + ("1" if field == "po_number" else "0")
            + (", 'i'" if field == "po_number" else "")
            + ")").fetchone()[0]
        assert got == expect, (field, text, got)


def test_categorize_all_fields_covers_every_entity_key():
    """r7 review: functions/categorize.ALL_FIELDS hardcodes the entity
    keys — a new pattern in core/entities._PATTERNS (or a new derived
    key like the currency/amount split) would silently vanish from the
    default 'Extracted Information' bucket. Lockstep-pinned here."""
    from documentai_spark.core.entities import _PATTERNS
    from documentai_spark.functions.categorize import ALL_FIELDS

    derived = {"currency", "amount"}       # the currency_amount split
    expected = set(_PATTERNS) | derived
    assert set(ALL_FIELDS) == expected, (
        "ALL_FIELDS out of lockstep with core/entities: "
        f"missing={sorted(expected - set(ALL_FIELDS))} "
        f"extra={sorted(set(ALL_FIELDS) - expected)}")
