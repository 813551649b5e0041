"""Confidence + verdict as pure Spark SQL column expressions.

The reference's verdict machinery is scalar threshold logic
(quality_analysis_updated/quality_config.py:39-129), so it stays JVM-side
in whole-stage codegen — no Python round trip (SURVEY §2.10:
``verdict_for_page`` -> pure when/otherwise).

Arithmetic is written in exactly the oracle's operation order
(core/quality.py: sequential weighted sum legibility*3 + completeness*2 +
(1-blank)*1, then /6) so the IEEE-double results are bit-identical to the
pytest oracle — verified by tests/test_pipeline_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documentai_spark.core.quality import (
    BLANK_LOW, CRITICAL_CAP, CRITICAL_LOW, VERDICT_AZURE, VERDICT_DIRECT,
    VERDICT_PREPROCESS,
)


def confidence_col(q_blank: Column, q_legibility: Column,
                   q_completeness: Column) -> Column:
    """Weighted mean with critical cap (quality_config.py:39-74 analog)."""
    conf = (q_legibility * F.lit(3.0) + q_completeness * F.lit(2.0)
            + (F.lit(1.0) - q_blank) * F.lit(1.0)) / F.lit(6.0)
    return F.when(q_legibility < F.lit(CRITICAL_LOW),
                  F.least(conf, F.lit(CRITICAL_CAP))).otherwise(conf)


def verdict_col(q_blank: Column, confidence: Column) -> Column:
    """4-way verdict + blank hard blocker (quality_config.py:86-129).

    The blank "low" branch short-circuits before the confidence logic —
    the X3 hard-blocker early exit, free under Catalyst ``when`` ordering.
    """
    return (F.when(q_blank >= F.lit(BLANK_LOW), F.lit("re-scan"))
             .when(confidence >= F.lit(VERDICT_DIRECT), F.lit("direct analysis"))
             .when(confidence >= F.lit(VERDICT_PREPROCESS), F.lit("pre-processing"))
             .when(confidence >= F.lit(VERDICT_AZURE),
                   F.lit("azure document analysis"))
             .otherwise(F.lit("reupload")))


def needs_preprocessing_col(verdict: Column) -> Column:
    """P4 preprocessing-need predicate (api-gateway/app.py:132-219 analog)."""
    return verdict.isin("pre-processing", "azure document analysis")


def with_verdict(df: DataFrame) -> DataFrame:
    """Add confidence / verdict / needs_preprocessing columns (pure SQL)."""
    df = df.withColumn("confidence", confidence_col(
        F.col("q_blank"), F.col("q_legibility"), F.col("q_completeness")))
    df = df.withColumn("verdict", verdict_col(F.col("q_blank"),
                                              F.col("confidence")))
    return df.withColumn("needs_preprocessing",
                         needs_preprocessing_col(F.col("verdict")))
