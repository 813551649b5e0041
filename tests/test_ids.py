"""with_surrogate_id — the fix-path every checked_long error names.

Zero-padded / UUID-style string ids are rejected by the long-label
surfaces by design ('007' and '7' would collapse onto one closure
label); the documented remedy is a collision-checked xxhash64 surrogate.
These tests pin that the remedy actually works end-to-end: distinctness,
determinism (resume/replay paths need stable surrogates), the salted
retry on collision, the all-salts-collide failure, and the NULL guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documentai_spark.functions.ids import (SurrogateCollisionError,
                                            with_surrogate_id)


def test_surrogate_distinct_and_deterministic(spark):
    """'007' and '7' — the exact pair the canonical-form guard exists
    for — get DISTINCT long surrogates, and a second derivation over
    the same ids is byte-identical (stable across resume/replay)."""
    rows = [("007", "alpha"), ("7", "beta"), ("doc-xyz", "gamma"),
            ("00042", "delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out1 = with_surrogate_id(df, "doc_id").orderBy("doc_id").collect()
    out2 = with_surrogate_id(df, "doc_id").orderBy("doc_id").collect()
    assert out1 == out2
    sids = [r.surrogate_id for r in out1]
    assert len(set(sids)) == 4
    assert all(isinstance(s, int) for s in sids)
    # the surrogate is the documented hash family at the winning salt 0
    expected = {r.doc_id: r.e for r in df.select(
        "doc_id", F.xxhash64("doc_id", F.lit(0)).alias("e")).collect()}
    assert all(r.surrogate_id == expected[r.doc_id] for r in out1)


def test_surrogate_unblocks_long_label_surfaces(spark):
    """Integration: ids that near_dedup fails fast on flow through once
    the surrogate is derived — same survivor TEXTS as a numeric-id run."""
    from documentai_spark.operators.dedup import near_dedup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain falls mainly on the plain tonight again")
    rows = [("007", base), ("7", base + " ok"),
            ("doc-c", "completely different content about parquet row "
                      "groups and dictionary encoding at rest forever")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(Exception, match="canonical"):
        near_dedup(df, jaccard_threshold=0.7).collect()

    out = near_dedup(with_surrogate_id(df, "doc_id"),
                     id_col="surrogate_id", jaccard_threshold=0.7)
    kept_texts = {r.text for r in out.collect()}
    # one of the two near-dup copies survives, plus the unrelated doc
    assert len(kept_texts) == 2
    assert ("completely different content about parquet row groups and "
            "dictionary encoding at rest forever") in kept_texts


def test_surrogate_retries_past_colliding_salt(spark):
    """The salted retry: a hash family whose salt 0 is degenerate
    (constant) must be skipped, and the output must use salt 1."""
    calls = []

    def coarse(col, salt):
        calls.append(salt)
        if salt == 0:
            return F.lit(0).cast("long")
        return F.xxhash64(col, F.lit(salt))

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["doc_id", "v"])
    out = with_surrogate_id(df, "doc_id", _hash=coarse)
    got = {r.doc_id: r.surrogate_id for r in out.collect()}
    expected = {r.doc_id: r.e for r in df.select(
        "doc_id", F.xxhash64("doc_id", F.lit(1)).alias("e")).collect()}
    assert got == expected
    assert 0 in calls and 1 in calls


def test_surrogate_all_salts_collide_raises_named_error(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["doc_id", "v"])
    with pytest.raises(SurrogateCollisionError, match="dictionary join"):
        with_surrogate_id(df, "doc_id", max_attempts=2,
                          _hash=lambda c, s: F.lit(7).cast("long"))


def test_surrogate_null_id_fails_fast(spark):
    df = spark.createDataFrame([("a", 1), (None, 2)],
                               "doc_id string, v int")
    with pytest.raises(Exception, match="with_surrogate_id.*non-NULL"):
        with_surrogate_id(df, "doc_id").collect()


def test_surrogate_max_attempts_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["doc_id", "v"])
    with pytest.raises(ValueError, match="max_attempts"):
        with_surrogate_id(df, "doc_id", max_attempts=0)
