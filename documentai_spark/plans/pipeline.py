"""The flagship extraction pipeline: one lazily-planned DataFrame DAG.

The reference's gateway chain (api-gateway/app.py:262-772: quality ->
conditional preprocessing -> classification -> entity extraction -> rule
validation, HTTP between every step, files between classification and
extraction) collapses into a single Spark plan with NO service hops and NO
intermediate files (SURVEY §3.1 "Spark rewrite"):

    read transcripts
      -> salted repartition (skew defusal; the ONLY shuffle before write)
      -> extract_udf   (kind dispatch -> extracted_text + spans)
      -> quality_udf   (the ten q_* metric columns of the 10-metric ensemble)
      -> confidence + verdict + routing + recommendations (pure SQL)
      -> [optional] entity_udf
      -> restore (conv_id, turn_idx) order  (range exchange, W1)
      -> write partitioned output

Scale notes (the 100 TB story):
- Exactly two exchanges end-to-end: the salt repartition and the final
  range exchange for ordered output. Everything between is pipelined
  per-partition work with Arrow batches.
- The scan ships only the needed columns into Python (column pruning holds:
  extract_udf reads ``text`` alone).
- No collect, no driver-side loops; output partitioning by bucket(conv_id)
  keeps downstream per-conversation reads co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documentai_spark.functions.verdict import with_verdict
from documentai_spark.operators.extraction import (
    with_entities, with_extraction_and_quality,
)
from documentai_spark.operators.skew import salted_repartition

OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts", "kind", "extracted_text",
    "spans", "q_blank", "q_legibility", "q_completeness", "q_skew",
    "q_noise", "q_contrast", "q_brightness", "q_edge_crop",
    "q_shadow_glare", "q_resolution", "confidence", "verdict",
    "needs_preprocessing", "recommendations",
]


def extraction_pipeline(transcripts: DataFrame, *,
                        salt_partitions: int | None = None,
                        salt_buckets: int = 16,
                        include_entities: bool = False,
                        ordered_output: bool = True,
                        input_observation=None) -> DataFrame:
    """transcripts (conv_id, turn_idx, role, text, tool, ts) -> extracted.

    Exchange placement (the 100 TB-critical decision): the ONE shuffle
    happens BEFORE the UDFs, on the raw input —

    - ordered output: ``repartitionByRange(conv_id, turn_idx)``. Range
      boundaries come from a sampling job over the *scan only* (column
      pruning: two key columns) — placing this exchange after the UDFs
      would re-execute the whole Python chain inside the sampling job
      (measured 2x cost). Equal-row-count ranges also defuse mega-
      conversation skew for free (a 10^5-turn conversation spans several
      contiguous ranges). ``sortWithinPartitions`` after the UDFs is a
      partition-local sort, no exchange, and yields globally ordered
      output because the ranges are already ordered.
    - unordered: salted repartition (uniform task sizing, W1 not needed).
    """
    if salt_partitions is None:
        # EXPLICIT partition count: without it AQE coalesces this exchange
        # to ~default.parallelism giant tasks (42 MB shuffle < 64 MB
        # advisory size), making the UDF stage straggler-bound — measured
        # as 2 output files at local[2]. Fine-grained tasks (the
        # configured shuffle partitions) keep all cores busy to stage end.
        salt_partitions = int(
            transcripts.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if ordered_output:
        # sort the NARROW input inside the range-exchange stage; the UDF
        # projections preserve per-partition row order, so the wide output
        # is already globally ordered — no post-UDF sort of big rows.
        df = (transcripts.repartitionByRange(
                  salt_partitions, F.col("conv_id"), F.col("turn_idx"))
              .sortWithinPartitions("conv_id", "turn_idx"))
    else:
        df = salted_repartition(transcripts, salt_partitions,
                                salt_buckets=salt_buckets)
    if input_observation is not None:
        # rows_in metric rides the SAME job, observed ABOVE the exchange:
        # the RangePartitioner sampling job re-executes only the subplan
        # BELOW the exchange, so this node runs exactly once per consumed
        # row (an observation on the raw input would double-count; a
        # separate count() would pay an extra scan per checkpoint bucket —
        # VERDICT r2 'What's wrong' #2).
        df = df.observe(input_observation, F.count(F.lit(1)).alias("n"))
    df = with_extraction_and_quality(df)
    df = with_verdict(df)
    cols = list(OUTPUT_COLUMNS)
    if include_entities:
        df = with_entities(df)
        cols += ["entities", "entity_spans", "extraction_confidence"]
    return df.select(*cols)


TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read the transcripts table in any supported landing format.

    ``parquet`` (default) is the at-scale path — on a real cluster the
    same call reads the Iceberg table
    (``spark.read.format("iceberg").load(tbl)``) and gains partition
    pruning from the table's bucket(conv_id) spec. ``json`` (JSON Lines)
    and ``csv`` cover the ingest edge where transcripts land raw before
    compaction. Both get the EXPLICIT canonical schema — never
    inference, which costs a second full scan at scale — and permissive
    corrupt-record handling (malformed rows become nulls and are dropped
    by the non-null conv_id filter rather than failing the job).

    Scale note on CSV: ``multiLine`` is required because transcript text
    contains newlines, and multiLine CSV is NOT splittable (one task per
    file). Use it for ingest-edge conversion only; land parquet for the
    real pipeline. The pipeline is storage-agnostic above this function.
    """
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        df = (spark.read.schema(TRANSCRIPT_DDL)
              .option("mode", "PERMISSIVE")
              .option("timestampFormat",
                      "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
              .json(path))
        return df.filter(F.col("conv_id").isNotNull())
    if fmt == "csv":
        # nullValue='\\N' keeps the empty-string / NULL distinction:
        # Spark's default nullValue is "" which silently nulls every
        # quoted-empty field (a real text/tool value in this table).
        # Writers must emit \N for SQL NULL — the standard convention.
        df = (spark.read.schema(TRANSCRIPT_DDL)
              .option("header", "true")
              .option("multiLine", "true")
              .option("escape", '"')
              .option("nullValue", "\\N")
              .option("mode", "PERMISSIVE")
              .option("timestampFormat",
                      "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
              .csv(path))
        return df.filter(F.col("conv_id").isNotNull())
    raise ValueError(f"unsupported transcripts format: {fmt!r}")


def run_pipeline(spark: SparkSession, in_path: str, out_path: str,
                 input_format: str = "parquet", **kwargs) -> None:
    """One-shot (non-checkpointed) run; see plans.checkpoint for resume."""
    df = extraction_pipeline(
        read_transcripts(spark, in_path, fmt=input_format), **kwargs)
    (df.withColumn("bucket", F.pmod(F.hash("conv_id"), F.lit(16)))
       .write.mode("overwrite").partitionBy("bucket").parquet(out_path))


def classified_pipeline(transcripts: DataFrame, classifier_config,
                        **kwargs) -> DataFrame:
    """Extraction + 3-technique vote + consecutive grouping.

    The reference's full chain (SURVEY §3.1): quality -> classify ->
    group consecutive same-category pages into output documents
    (documentClassifier.py:1039-1121). Grouping adds the W1 window over
    (conv_id, turn_idx) — the only per-conversation stage."""
    from documentai_spark.operators.classify import (
        classify_with_vote, group_consecutive,
    )
    df = extraction_pipeline(transcripts, ordered_output=False, **kwargs)
    df = classify_with_vote(df, classifier_config)
    return group_consecutive(df, classifier_config)


def run_classified(spark: SparkSession, in_path: str, out_path: str,
                   classifier_config) -> None:
    """Classified sink: one directory per category (the Spark analog of
    the reference's per-category PDF folders, S6 — category is a
    partition column, so downstream per-category reads prune)."""
    df = classified_pipeline(read_transcripts(spark, in_path),
                             classifier_config)
    df.write.mode("overwrite").partitionBy("category").parquet(out_path)
