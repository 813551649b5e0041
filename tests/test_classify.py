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
    Java regexp_extract_all per-keyword-summed (r7: the reference
    findalls each keyword independently, so 'credit' AND 'letter of
    credit' both count on overlapping text) — multi-word \\s+ joins,
    whitespace variants, repeated hits."""
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
        col = None
        for pat in cat.patterns:
            term = F.size(F.regexp_extract_all(F.lower("t"), F.lit(pat),
                                               F.lit(0)))
            col = term if col is None else col + term
        for r in df.select("i", col.alias("n")).collect():
            jvm[(r.i, ci)] = r.n
    out = _features_batch(pd.Series(cases),
                          [list(cat.patterns_py)
                           for cat in cfg.categories])
    for i, c in enumerate(cases):
        for ci in range(2):
            assert out[f"c{ci}"][i] == jvm[(i, ci)], (repr(c), ci)
    # the per-keyword semantics itself: 'letter of credit' text counts
    # BOTH 'credit' and 'letter of credit' (the joined alternation
    # consumed the span once and undercounted — r7 review)
    b = cfg.categories[1]
    assert b.name == "b"
    single = _features_batch(pd.Series(["letter of credit"]),
                             [list(cat.patterns_py)
                              for cat in cfg.categories])
    assert single["c1"][0] == 2


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


def test_token_overlap_reference_semantics(spark):
    """r7 review, two reference-parity fixes to technique 3
    (documentClassifier.py:524,540): multi-word keywords contribute
    their individual WORDS to the lookup set (so 'purchase order'
    matches documents containing 'purchase' and 'order' as separate
    tokens), and tokens split on the whitespace CLASS (so newline- or
    tab-separated words are separate tokens)."""
    from pyspark.sql import functions as F

    from documentai_spark.operators.classify import (
        ClassifierConfig, technique_token_overlap,
    )

    cfg = ClassifierConfig.compile({
        "po": {"keywords": ["purchase order"]},
        "lc": {"keywords": ["letter of credit"]},
    })
    assert cfg.categories[0].words == ("order", "purchase")
    docs = spark.createDataFrame([
        (0, "please send the purchase order today"),   # 2 word hits
        (1, "a letter\nof\tcredit arrived"),           # class-split hits
        (2, "nothing relevant here at all"),
        (3, None),
    ], "doc_id long, text string")
    got = {r.doc_id: r.cat for r in docs.select(
        "doc_id",
        technique_token_overlap(F.col("text"), cfg).alias("cat"))
        .collect()}
    assert got[0] == "po"      # was unclassified: 'purchaseorder' token
    assert got[1] == "lc"      # was unclassified: 'letter\nof\tcredit'
    assert got[2] == "unclassified"
    assert got[3] == "unclassified"


def test_single_category_config_and_null_text_gate(spark):
    """r7 review: a one-category config used to crash F.greatest at
    plan build; NULL text used to bypass the min-length gate and report
    vote_confidence 1.0."""
    from documentai_spark.operators.classify import (
        ClassifierConfig, classify_with_vote,
    )

    cfg = ClassifierConfig.compile({
        "invoice": {"keywords": ["invoice", "amount"]},
    })
    docs = spark.createDataFrame(
        [(0, "the invoice amount is due now"), (1, None), (2, "hi")],
        "doc_id long, extracted_text string")
    got = {r.doc_id: (r.category, r.vote_confidence)
           for r in classify_with_vote(docs, cfg).collect()}
    assert got[0] == ("invoice", 1.0)
    assert got[1] == ("unclassified", 0.0)    # NULL text is gated
    assert got[2] == ("unclassified", 0.0)    # too short


def test_compile_rejects_unusable_keywords():
    """r7 review: a category whose keywords all normalize to empty used
    to compile to an empty alternation that matched everywhere; the
    config is refused up front."""
    import pytest

    from documentai_spark.operators.classify import ClassifierConfig

    with pytest.raises(ValueError, match="no usable keywords"):
        ClassifierConfig.compile({"junk": {"keywords": ["***", "!!"]},
                                  "ok": {"keywords": ["fine"]}})


def test_group_id_conversation_qualified(spark):
    """r7 review: group_id repeats like '1-0' across conversations —
    now conversation-qualified so grouping on it alone is safe."""
    from pyspark.sql import functions as F

    from documentai_spark.operators.classify import (
        ClassifierConfig, group_consecutive,
    )

    cfg = ClassifierConfig.compile({"x": {"keywords": ["x"]}})
    df = spark.createDataFrame(
        [("a", 0, "x"), ("a", 1, "x"), ("b", 0, "x")],
        ["conv_id", "turn_idx", "category"])
    got = group_consecutive(df, cfg).select("conv_id", "group_id") \
        .distinct().collect()
    ids = {r.group_id for r in got}
    assert len(ids) == 2 and all(
        r.group_id.startswith(r.conv_id + "-") for r in got)
