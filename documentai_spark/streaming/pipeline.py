"""Streaming extraction: the batch operators under readStream.

Use case at scale: transcripts land continuously in the Iceberg table (or
a file/Kafka source); extraction + quality + verdict run per micro-batch
with exactly-once file sinks. The per-turn stages are stateless, so the
only streaming-specific pieces are:

- watermark on ``ts`` for the optional windowed rollup (late turns beyond
  the watermark are dropped from aggregates, never from extraction);
- checkpointLocation for exactly-once progress (the streaming analog of
  plans/checkpoint.py's per-partition manifests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from documentai_spark.functions.verdict import with_verdict
from documentai_spark.operators.extraction import with_extraction_and_quality

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a transcripts directory (parquet)."""
    return (spark.readStream.schema(TRANSCRIPT_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_extraction(stream: DataFrame) -> DataFrame:
    """Stateless per-turn extraction + quality + verdict on a stream."""
    return with_verdict(with_extraction_and_quality(stream))


def streaming_verdict_rollup(stream: DataFrame,
                             window: str = "5 minutes",
                             watermark: str = "10 minutes") -> DataFrame:
    """Windowed verdict counts with late-data handling (watermark)."""
    out = streaming_extraction(stream)
    return (out.withWatermark("ts", watermark)
               .groupBy(F.window("ts", window), "verdict")
               .agg(F.count(F.lit(1)).alias("n_turns")))


def streaming_classified(stream: DataFrame, cfg) -> DataFrame:
    """Stateless per-turn classification on a stream: extraction +
    quality + the 3-technique vote (row-local, so trivially streamable).
    Consecutive grouping is a batch concern — the reference groups per
    uploaded document; the streaming analog is the per-turn category
    plus the windowed rollup below."""
    from documentai_spark.operators.classify import classify_with_vote
    return classify_with_vote(streaming_extraction(stream), cfg)


def streaming_category_rollup(stream: DataFrame, cfg,
                              window: str = "5 minutes",
                              watermark: str = "10 minutes") -> DataFrame:
    """Windowed per-category turn counts with late-data handling."""
    out = streaming_classified(stream, cfg)
    return (out.withWatermark("ts", watermark)
               .groupBy(F.window("ts", window), "category")
               .agg(F.count(F.lit(1)).alias("n_turns")))


def streaming_conversation_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-conversation totals that survive across micro-batches.

    This is the streaming form of the batch per-conversation rollup
    (q_t_conv_stats): state = (n_turns, total_chars, max_turn_idx) per
    conv_id; every micro-batch that touches a conversation emits its
    updated totals (outputMode=update). At 10^12-turn scale the state
    store shards by conv_id with the shuffle, so a conversation's state
    lives on exactly one executor; mega-conversations are a single hot
    key only for this aggregate's tiny fixed-size state, not for the
    extraction work. A production variant would add EventTimeTimeout to
    emit-and-evict closed conversations (state.setTimeoutTimestamp on the
    watermark + gap); the fixture drain is one-shot, so the test pins the
    no-timeout running-total semantics.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_type = ("conv_id string, n_turns bigint, total_chars bigint, "
                "max_turn_idx int")
    state_type = "n_turns bigint, total_chars bigint, max_turn_idx int"

    def update(key, pdfs, state):
        n, chars, mx = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf["text"].str.len().sum())
            mx = max(mx, int(pdf["turn_idx"].max()))
        state.update((n, chars, mx))
        yield pd.DataFrame([{"conv_id": key[0], "n_turns": n,
                             "total_chars": chars, "max_turn_idx": mx}])

    return (stream.groupBy("conv_id")
            .applyInPandasWithState(update, out_type, state_type,
                                    "update", GroupStateTimeout.NoTimeout))


def streaming_first_wins_dedup(stream: DataFrame,
                               text_col: str = "text",
                               id_cols: tuple[str, ...] = ("conv_id",
                                                           "turn_idx"),
                               ) -> DataFrame:
    """Streaming exact dedup, first-wins: the streaming form of the
    batch U2 operator (dedup.exact_dedup) for continuously-landing
    training data. Keyed state on the normalized md5 fingerprint — the
    FIRST row of a fingerprint ever seen (across micro-batches) passes;
    every later exact duplicate is dropped.

    Scale shape: state is one boolean per distinct fingerprint, sharded
    by the groupBy shuffle, so each fingerprint's state lives on exactly
    one executor; within a batch the earliest (id_cols)-ordered row wins
    deterministically. A production variant bounds state with a TTL
    timeout (duplicates arriving later than the TTL re-admit — the
    standard windowed-dedup tradeoff, equivalent to
    ``dropDuplicates`` + watermark but with the pipeline's OWN
    fingerprint normalization instead of raw-column equality).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                       r"\s+", " ")))
    keyed = stream.withColumn("_fp", fp)
    out_cols = list(dict.fromkeys([*id_cols, text_col]))
    out_type = ", ".join({"conv_id": "conv_id string",
                          "turn_idx": "turn_idx int",
                          text_col: f"{text_col} string",
                          }.get(c, f"{c} string") for c in out_cols)

    def first_wins(key, pdfs, state):
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            pdf = pdf.sort_values(list(id_cols)).head(1)
            row = pdf.iloc[0]
            cand = tuple(row[c] for c in out_cols)
            if first is None or cand < first:
                first = cand
        state.update((True,))
        yield pd.DataFrame([dict(zip(out_cols, first))])

    # "append" output: every emission is final (a key emits at most once
    # ever), which is what file sinks require
    return (keyed.groupBy("_fp")
            .applyInPandasWithState(first_wins, out_type, "seen boolean",
                                    "append", GroupStateTimeout.NoTimeout))


def start_to_parquet(stream_df: DataFrame, out_path: str,
                     checkpoint: str, trigger_once: bool = True):
    """Exactly-once parquet sink; availableNow drains existing input."""
    w = (stream_df.writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
