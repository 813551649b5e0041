"""Classification tests: technique scoring, majority vote, consecutive
grouping (documentClassifier.py semantics per SURVEY §2.4 A6/A7, §2.5 W2).
"""

from __future__ import annotations

import pytest

from documentai_spark.operators.classify import (
    ClassifierConfig, classify_with_vote, group_consecutive,
)

CFG = ClassifierConfig.compile({
    "invoice": {"keywords": ["invoice", "unit price", "total amount"],
                "weight": 1.0},
    "purchase_order": {"keywords": ["purchase order", "po number"],
                       "weight": 1.0, "max_pages": 2},
    "letter_of_credit": {"keywords": ["letter of credit", "beneficiary",
                                      "documentary credit"],
                         "weight": 1.0, "always_separate": True},
})


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("c1", 0, "this invoice shows unit price and total amount due"),
        ("c1", 1, "po number PO-9 of the purchase order follows"),
        ("c1", 2, "purchase order terms continue with po number ref"),
        ("c1", 3, "purchase order continues again po number here"),
        ("c1", 4, "purchase order final page po number end"),
        ("c1", 5, "beneficiary of the documentary credit is named"),
        ("c1", 6, "beneficiary continues letter of credit terms"),
        ("c1", 8, "invoice again with unit price listed"),  # gap at 7
        ("c2", 0, "x"),                                     # below min len
        ("c2", 1, "nothing matching any category keywords today"),
    ]
    return spark.createDataFrame(rows, ["conv_id", "turn_idx",
                                        "extracted_text"])


def test_vote_categories(turns):
    out = {(r.conv_id, r.turn_idx): r
           for r in classify_with_vote(turns, CFG).collect()}
    assert out[("c1", 0)].category == "invoice"
    assert out[("c1", 1)].category == "purchase_order"
    assert out[("c1", 5)].category == "letter_of_credit"
    assert out[("c2", 0)].category == "unclassified"      # min-length gate
    assert out[("c2", 0)].vote_confidence == 0.0
    assert out[("c2", 1)].category == "unclassified"      # no keywords
    # vote confidence is k/3
    assert 0.0 < out[("c1", 0)].vote_confidence <= 1.0


def test_group_consecutive(turns):
    df = classify_with_vote(turns, CFG)
    out = {(r.conv_id, r.turn_idx): r.group_id
           for r in group_consecutive(df, CFG).collect()}
    # same category + consecutive -> same group, except caps/always_separate
    assert out[("c1", 1)] == out[("c1", 2)]      # po pages 1-2 (cap=2)
    assert out[("c1", 3)] == out[("c1", 4)]      # po pages 3-4 (next chunk)
    assert out[("c1", 1)] != out[("c1", 3)]      # max_pages=2 split
    assert out[("c1", 5)] != out[("c1", 6)]      # always_separate
    assert out[("c1", 0)] != out[("c1", 1)]      # category change
    assert out[("c1", 6)] != out[("c1", 8)]      # gap breaks island


def test_keyword_normalization():
    cfg = ClassifierConfig.compile(
        {"a": {"keywords": ["Foo-Bar", "BAZ qux", ""]}})
    # length-desc sort, alphabetical tie-break; empties dropped
    assert cfg.categories[0].keywords == ("bazqux", "foobar")


def test_classified_sink_partitions(spark, transcripts_path, tmp_path):
    """S6 analog: per-category partition dirs, prunable reads."""
    import os

    from documentai_spark.plans.pipeline import run_classified
    cfg = ClassifierConfig.compile({
        "trade": {"keywords": ["invoice", "credit", "shipment",
                               "beneficiary"]},
        "logistics": {"keywords": ["vessel", "port", "freight", "lading"]},
    })
    out = str(tmp_path / "classified")
    run_classified(spark, transcripts_path, out, cfg)
    dirs = {d for d in os.listdir(out) if d.startswith("category=")}
    assert len(dirs) >= 2  # at least two categories materialized
    # partition pruning: reading one category filters at the source
    one = spark.read.parquet(out).filter("category = 'trade'")
    assert one.count() > 0
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


def test_norm_batch_matches_column_forms(spark):
    """The byte-LUT normalization (one Arrow stage) must be byte-identical
    to the lower+regexp_replace column forms it replaced — on adversarial
    inputs including non-ASCII (multi-byte deletion), control chars, and
    whitespace variants."""
    import pandas as pd

    from pyspark.sql import functions as F

    from documentai_spark.operators.classify import _norm_batch

    cases = [
        "Simple Mixed CASE text 123",
        "punct!@#$%^&*()-=_+[]{};':\",./<>?",
        "tabs\tand\nnewlines\x0b\x0c\r here",
        "  leading and trailing   ",
        "unicode Élève K café 中文",
        "", "   ", "\x00\x01control\x1f\x7f",
        "PO-123 USD 5,000.00 01.01.2024",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "t"])
    jvm = {r.i: (r.na, r.ns) for r in df.select(
        "i",
        F.regexp_replace(F.lower("t"), "[^0-9a-z]", "").alias("na"),
        F.trim(F.regexp_replace(F.lower("t"), r"[^0-9a-z\s]", ""))
         .alias("ns")).collect()}
    out = _norm_batch(pd.Series(cases))
    for i, c in enumerate(cases):
        assert (out["na"][i], out["ns"][i]) == jvm[i], repr(c)


def test_features_counts_match_jvm(spark):
    """The Python-re technique-2 counts (Arrow feature pass) must equal
    Java regexp_extract_all on the same alternation — overlapping
    keywords (leftmost preference), multi-word \\s+ joins, whitespace
    variants, repeated hits."""
    import pandas as pd

    from pyspark.sql import functions as F

    from documentai_spark.operators.classify import (
        ClassifierConfig, _features_batch,
    )

    cfg = ClassifierConfig.compile({
        "a": {"keywords": ["po", "po number", "purchase order"]},
        "b": {"keywords": ["credit", "letter of credit"]},
    })
    cases = [
        "po number po-7 purchase  order purchase\torder po",
        "letter of credit and credit and letter  of\ncredit",
        "po po po po", "PO NUMBER", "nothing here",
        "po\x0bnumber po\x0cnumber",      # \s variants Java also matches
        "", "   ", "credit creditcredit letter of credit",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "t"])
    jvm = {}
    for ci, cat in enumerate(cfg.categories):
        pat = "|".join(cat.patterns)
        col = F.size(F.regexp_extract_all(F.lower("t"), F.lit(pat),
                                          F.lit(0)))
        for r in df.select("i", col.alias("n")).collect():
            jvm[(r.i, ci)] = r.n
    out = _features_batch(pd.Series(cases),
                          ["|".join(cat.patterns_py)
                           for cat in cfg.categories])
    for i, c in enumerate(cases):
        for ci in range(2):
            assert out[f"c{ci}"][i] == jvm[(i, ci)], (repr(c), ci)


def test_jvm_scoring_path_identical(spark):
    """classify_with_vote(jvm_scoring=True) — the pure column-expression
    path for hosts with normal-speed JVM regex — must produce identical
    votes to the Arrow feature pass."""
    from documentai_spark.operators.classify import (
        ClassifierConfig, classify_with_vote,
    )

    cfg = ClassifierConfig.compile({
        "billing": {"keywords": ["invoice", "amount", "total"]},
        "shipping": {"keywords": ["vessel", "port", "freight",
                                  "shipment"]},
        "credit": {"keywords": ["credit", "beneficiary"]},
    })
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumnRenamed("text", "extracted_text")
    cols = ["doc_id", "technique_1", "technique_2", "technique_3",
            "category", "vote_confidence"]
    arrow = {r.doc_id: tuple(r) for r in
             classify_with_vote(docs, cfg).select(cols).collect()}
    jvm = {r.doc_id: tuple(r) for r in
           classify_with_vote(docs, cfg, jvm_scoring=True)
           .select(cols).collect()}
    assert arrow == jvm and len(arrow) > 0
