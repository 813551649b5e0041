"""Confidence + verdict + recommendations as pure Spark SQL expressions.

The reference's verdict machinery is scalar threshold logic
(quality_analysis_updated/quality_config.py:39-129), so it stays JVM-side
in whole-stage codegen — no Python round trip (SURVEY §2.10:
``verdict_for_page`` -> pure when/otherwise).

Arithmetic is written in exactly the oracle's operation order
(core/quality.confidence_score — the r3 12-POINT scheme: sequential
weighted sum legibility*3 + completeness*3 + (1-skew)*2 + (1-noise)*2 +
contrast*1 + brightness*1, then /12; skew and noise are REVERSE
metrics; blank is EXCLUDED like the reference excludes
blank_page_score, and edge_crop/shadow_glare/resolution are
reported-only — quality_config.py:45-53,119-121) so the IEEE-double
results are bit-identical to the pytest oracle — verified by
tests/test_pipeline_oracle.py. A low critical metric (legibility,
skew, noise — CRITICAL_LOW) returns the flat 0.55 outright
(quality_config.py:57-62), and the blank hard block ZEROES confidence
alongside the 're-scan' verdict (the CLAUDE.md r3 invariant; this
docstring used to describe the retired /10 no-skew r2 formula).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from documentai_spark.core.quality import (
    BLANK_LOW, BLANK_RECOMMENDATION, CONFIDENCE_W_TOTAL, CRITICAL_CAP,
    CRITICAL_LOW, METRIC_THRESHOLDS, RECOMMENDATION_TEXT, REVERSE_METRICS,
    VERDICT_AZURE, VERDICT_DIRECT, VERDICT_PREPROCESS, _METRIC_ORDER,
)

_METRIC_COL = {"legibility": "q_legibility", "completeness":
               "q_completeness", "skew": "q_skew", "noise": "q_noise",
               "contrast": "q_contrast", "brightness": "q_brightness",
               "edge_crop": "q_edge_crop",
               "shadow_glare": "q_shadow_glare",
               "resolution": "q_resolution"}


def confidence_col(q_legibility: Column, q_completeness: Column,
                   q_skew: Column, q_noise: Column, q_contrast: Column,
                   q_brightness: Column,
                   q_blank: Column | None = None) -> Column:
    """Weighted mean with the critical flat-return
    (quality_config.py:39-74 analog; the reference's full 12-point scheme:
    legibility 3, completeness 3, skew 2 reversed, noise 2 reversed,
    contrast 1, brightness 1). When ``q_blank`` is given, the blank hard
    block zeroes confidence alongside the 're-scan' verdict —
    verdict_for_page returns (re-scan, 0.0) (quality_config.py:109-121)."""
    conf = (q_legibility * F.lit(3.0) + q_completeness * F.lit(3.0)
            + (F.lit(1.0) - q_skew) * F.lit(2.0)
            + (F.lit(1.0) - q_noise) * F.lit(2.0)
            + q_contrast * F.lit(1.0) + q_brightness * F.lit(1.0)) \
        / F.lit(CONFIDENCE_W_TOTAL)
    critical_low = (q_legibility < F.lit(CRITICAL_LOW)) \
        | ((F.lit(1.0) - q_skew) < F.lit(CRITICAL_LOW)) \
        | ((F.lit(1.0) - q_noise) < F.lit(CRITICAL_LOW))
    out = F.when(critical_low, F.lit(CRITICAL_CAP)).otherwise(conf)
    if q_blank is not None:
        out = F.when(q_blank >= F.lit(BLANK_LOW), F.lit(0.0)).otherwise(out)
    return out


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


def _category_col(metric: str, value: Column) -> Column:
    """excellent/good/medium/low when-chain per the threshold table; the
    reverse metric (noise) is categorized on 1-value
    (core/quality.metric_category; quality_config.py:17-27)."""
    v = (F.lit(1.0) - value) if metric in REVERSE_METRICS else value
    exc, good, med = METRIC_THRESHOLDS[metric]
    return (F.when(v >= F.lit(exc), "excellent")
             .when(v >= F.lit(good), "good")
             .when(v >= F.lit(med), "medium")
             .otherwise("low"))


def recommendations_col(q_blank: Column, **metric_cols: Column) -> Column:
    """array<string> of '{Metric}: {advice}' lines per non-excellent
    metric (generate_recommendations, quality_config.py:96-103), with the
    blank hard blocker short-circuiting to the single re-scan line
    (quality_config.py:109-116). Metric order is pinned
    (core/quality._METRIC_ORDER) so the array matches the oracle."""
    entries = []
    for m in _METRIC_ORDER:
        cat = _category_col(m, metric_cols[m])
        texts = RECOMMENDATION_TEXT[m]
        label = m.replace("_", " ").capitalize()
        e = None
        for c in ("good", "medium", "low"):
            lit = F.lit(f"{label}: {texts[c]}")
            e = (F.when(cat == c, lit) if e is None
                 else e.when(cat == c, lit))
        entries.append(e)  # null on 'excellent'
    recs = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return F.when(q_blank >= F.lit(BLANK_LOW),
                  F.array(F.lit(BLANK_RECOMMENDATION))).otherwise(recs)


def with_verdict(df: DataFrame) -> DataFrame:
    """Add confidence / verdict / needs_preprocessing / recommendations
    columns (pure SQL over the ten q_* metrics)."""
    df = df.withColumn("confidence", confidence_col(
        F.col("q_legibility"), F.col("q_completeness"), F.col("q_skew"),
        F.col("q_noise"), F.col("q_contrast"), F.col("q_brightness"),
        q_blank=F.col("q_blank")))
    df = df.withColumn("verdict", verdict_col(F.col("q_blank"),
                                              F.col("confidence")))
    df = df.withColumn("needs_preprocessing",
                       needs_preprocessing_col(F.col("verdict")))
    return df.withColumn("recommendations", recommendations_col(
        F.col("q_blank"),
        **{m: F.col(c) for m, c in _METRIC_COL.items()}))
