"""Streaming pipeline test: availableNow drain over the synthetic
transcripts, output equals the batch pipeline's (unordered) result."""

from __future__ import annotations

from documentai_spark.plans.pipeline import extraction_pipeline
from documentai_spark.streaming.pipeline import (
    read_transcript_stream, start_to_parquet, streaming_extraction,
)


def test_stream_equals_batch(spark, transcripts_path, tmp_path):
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_transcript_stream(spark, transcripts_path,
                                    max_files_per_trigger=4)
    q = start_to_parquet(streaming_extraction(stream), out_dir, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir) \
        .select("conv_id", "turn_idx", "extracted_text", "verdict").collect()
    want = extraction_pipeline(spark.read.parquet(transcripts_path),
                               ordered_output=False) \
        .select("conv_id", "turn_idx", "extracted_text", "verdict").collect()
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert len(got_s) == len(want_s)
    assert got_s == want_s


def test_stream_restart_is_exactly_once(spark, transcripts_path, tmp_path):
    """Re-starting with the same checkpoint adds nothing (no duplicates)."""
    out_dir = str(tmp_path / "stream_out2")
    ckpt = str(tmp_path / "ckpt2")
    stream = read_transcript_stream(spark, transcripts_path)
    q = start_to_parquet(streaming_extraction(stream), out_dir, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()

    q2 = start_to_parquet(streaming_extraction(
        read_transcript_stream(spark, transcripts_path)), out_dir, ckpt)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2


def test_watermarked_rollup(spark, transcripts_path):
    """Windowed verdict rollup with watermark: stream totals equal the
    batch groupBy over the same windows (memory sink, complete mode)."""
    from pyspark.sql import functions as F

    from documentai_spark.streaming.pipeline import (
        read_transcript_stream, streaming_verdict_rollup,
    )
    stream = read_transcript_stream(spark, transcripts_path)
    q = (streaming_verdict_rollup(stream, window="10 minutes",
                                  watermark="20 minutes")
         .writeStream.format("memory").queryName("rollup")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r.window.start, r.verdict): r.n_turns
           for r in spark.sql("select * from rollup").collect()}
    from documentai_spark.plans.pipeline import extraction_pipeline
    batch = extraction_pipeline(spark.read.parquet(transcripts_path),
                                ordered_output=False)
    want = {((r.win.start), r.verdict): r.n
            for r in batch.groupBy(F.window("ts", "10 minutes").alias("win"),
                                   "verdict")
                          .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and len(got) > 0


def test_stateful_conversation_totals(spark, transcripts_path):
    """applyInPandasWithState running totals: state accumulates across
    micro-batches (maxFilesPerTrigger forces several), and the FINAL
    emission per conversation equals the batch groupBy rollup."""
    from pyspark.sql import functions as F

    from documentai_spark.streaming.pipeline import (
        read_transcript_stream, streaming_conversation_totals,
    )

    stream = read_transcript_stream(spark, transcripts_path,
                                    max_files_per_trigger=2)
    out = streaming_conversation_totals(stream)
    q = (out.writeStream.format("memory").queryName("conv_totals")
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)

    # totals are monotone across updates -> max() per conv == final state
    got = {r.conv_id: (r.n_turns, r.total_chars, r.max_turn_idx)
           for r in spark.sql(
               "SELECT conv_id, max(n_turns) n_turns, "
               "max(total_chars) total_chars, max(max_turn_idx) "
               "max_turn_idx FROM conv_totals GROUP BY conv_id").collect()}
    want = {r.conv_id: (r.n_turns, r.total_chars, r.max_turn_idx)
            for r in spark.read.parquet(transcripts_path)
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.sum(F.length("text")).alias("total_chars"),
                 F.max("turn_idx").alias("max_turn_idx")).collect()}
    assert got == want


def test_streaming_classified_equals_batch(spark, transcripts_path,
                                           tmp_path):
    """The classification vote is stateless, so the streamed per-turn
    categories must equal the batch chain's on the same input; the
    windowed per-category rollup must sum to the same totals."""
    from pyspark.sql import functions as F

    from documentai_spark.operators.classify import (
        ClassifierConfig, classify_with_vote,
    )
    from documentai_spark.plans.pipeline import extraction_pipeline
    from documentai_spark.streaming.pipeline import (
        read_transcript_stream, start_to_parquet, streaming_classified,
        streaming_category_rollup,
    )

    cfg = ClassifierConfig.compile({
        "billing": {"keywords": ["invoice", "amount", "total"]},
        "shipping": {"keywords": ["vessel", "port", "freight"]},
    })
    out_dir = str(tmp_path / "cstream_out")
    ckpt = str(tmp_path / "cstream_ckpt")
    stream = read_transcript_stream(spark, transcripts_path)
    q = start_to_parquet(
        streaming_classified(stream, cfg).select(
            "conv_id", "turn_idx", "category", "vote_confidence"),
        out_dir, ckpt)
    q.awaitTermination(300)
    got = {(r.conv_id, r.turn_idx): (r.category, r.vote_confidence)
           for r in spark.read.parquet(out_dir).collect()}

    batch = classify_with_vote(
        extraction_pipeline(spark.read.parquet(transcripts_path),
                            ordered_output=False), cfg)
    want = {(r.conv_id, r.turn_idx): (r.category, r.vote_confidence)
            for r in batch.select("conv_id", "turn_idx", "category",
                                  "vote_confidence").collect()}
    assert got == want

    q2 = (streaming_category_rollup(
              read_transcript_stream(spark, transcripts_path), cfg,
              window="10 minutes", watermark="20 minutes")
          .writeStream.format("memory").queryName("cat_rollup")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(300)
    rolled = spark.sql("SELECT category, sum(n_turns) AS n FROM "
                       "cat_rollup GROUP BY category").collect()
    want_counts = {r.category: r.n for r in
                   batch.groupBy("category").count()
                        .withColumnRenamed("count", "n").collect()}
    assert {r.category: r.n for r in rolled} == want_counts


def test_streaming_first_wins_dedup(spark, transcripts_path, tmp_path):
    """Streaming exact dedup drops every later duplicate of a
    fingerprint across micro-batches; the surviving fingerprint set
    equals the batch operator's."""
    from pyspark.sql import functions as F

    from documentai_spark.streaming.pipeline import (
        read_transcript_stream, start_to_parquet,
        streaming_first_wins_dedup,
    )

    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    # small trigger: several micro-batches, so cross-batch state matters
    stream = read_transcript_stream(spark, transcripts_path,
                                    max_files_per_trigger=2)
    q = start_to_parquet(streaming_first_wins_dedup(stream), out_dir,
                         ckpt)
    q.awaitTermination(300)

    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                       r"\s+", " ")))
    got = spark.read.parquet(out_dir).withColumn("_fp", fp)
    n_out = got.count()
    # exactly one survivor per distinct fingerprint
    assert got.select("_fp").distinct().count() == n_out
    batch_fps = {r._fp for r in
                 spark.read.parquet(transcripts_path)
                 .select(fp.alias("_fp")).distinct().collect()}
    assert {r._fp for r in got.select("_fp").collect()} == batch_fps
    # duplicates existed in the input, so the stream really dropped rows
    assert n_out < spark.read.parquet(transcripts_path).count()
