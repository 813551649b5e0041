"""Multimodal plumbing tests: schema, mapInPandas batching, determinism.
(The decode step is a documented deterministic stub — the Spark-side
schema/partitioning/batch shape is what's under test.)"""

from __future__ import annotations

from documentai_spark.operators.multimodal import (
    N_FEATURES, extract_media_features, synthesize_media,
)


def test_media_features_schema_and_rows(spark):
    media = synthesize_media(spark, n=48)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == 48
    assert set(out.columns) == {"media_id", "media_type", "n_bytes",
                                "features", "decode_ok"}
    for r in rows:
        assert len(r.features) == N_FEATURES
        assert all(0.0 <= f <= 1.0 for f in r.features)
        assert r.decode_ok == "ok"
        assert r.n_bytes > 0


def test_media_features_deterministic_across_partitioning(spark):
    media = synthesize_media(spark, n=48)
    a = {r.media_id: r.features
         for r in extract_media_features(media.repartition(1)).collect()}
    b = {r.media_id: r.features
         for r in extract_media_features(media.repartition(9)).collect()}
    assert a == b


def test_media_features_feed_similarity(spark):
    """Feature vectors compose with the similarity operators unchanged."""
    from pyspark.sql import functions as F

    from documentai_spark.operators.similarity import brute_force_topk
    media = synthesize_media(spark, n=30)
    feats = extract_media_features(media) \
        .select(F.col("media_id").alias("vec_id"),
                F.col("features").alias("embedding"))
    anchors = feats.filter(F.col("vec_id") < 2) \
                   .select(F.col("vec_id").alias("anchor_id"), "embedding")
    out = brute_force_topk(feats, anchors, k=3,
                           id_col="vec_id", vec_col="embedding")
    got = out.collect()
    assert len(got) == 6  # 2 anchors x top-3
