"""Sequence packing: greedy document->training-sequence bin assignment.

LLM pretraining consumes fixed-length token sequences; packing many
short documents into each sequence (instead of padding) is the standard
throughput move. This operator assigns every document to a (shard, bin)
pair under a token budget:

- **shard** = ``doc_id % n_shards`` — the unit of parallelism. Packing
  is inherently a sequential scan (each bin decision depends on the
  running fill), so global single-stream packing cannot scale; the
  standard at-scale shape is per-shard independent packing, which this
  implements: shards pack concurrently, each as one ordered group.
- **bin** — within a shard, documents are visited in ``id`` order and
  greedily appended to the current bin while ``fill + n_tokens <=
  budget``; otherwise a new bin opens. A document alone larger than the
  budget still gets its own bin and is flagged ``oversize`` (the caller
  truncates or splits it downstream — this operator never silently
  drops data).

Scale shape: token counts are computed JVM-side (the pinned whitespace
formulation) and only narrow (id, shard, n_tokens) rows enter the
``applyInPandas`` stage — one shuffle by shard, then a per-shard
sequential pass (the irreducible part), emitting one assignment row per
document. Determinism: assignment depends only on (doc_id, n_tokens,
budget, n_shards) — never on partitioning or arrival order.

The greedy reset-at-boundary scan has no closed-form window expression
(a running sum that RESETS is not a prefix sum), so the DuckDB gate
oracle replays it with a recursive CTE stepping row-by-row per shard —
an exact, independent re-derivation of the same recurrence.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from documentai_spark.operators.curation import token_count_col

PACK_SCHEMA = ("doc_id bigint, shard int, bin bigint, n_tokens int, "
               "oversize boolean")


def pack_sequences(docs: DataFrame, *, budget: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_shards: int = 16) -> DataFrame:
    """(doc_id, shard, bin, n_tokens, oversize) greedy packing
    assignment (see module docstring). ``budget`` is the per-bin token
    capacity; ``n_shards`` the packing parallelism."""
    if budget < 1 or n_shards < 1:
        raise ValueError("budget and n_shards must be positive")
    narrow = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        token_count_col(F.col(text_col)).cast("int").alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        b = -1
        fill = 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if b < 0 or fill + n > budget:
                b += 1
                fill = n
            else:
                fill += n
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["oversize"] = pdf["n_tokens"] > budget
        return pdf[["doc_id", "shard", "bin", "n_tokens", "oversize"]]

    return narrow.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def pack_stats(assignment: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing efficiency: bins used, mean fill ratio, count
    of oversize documents — the report a pipeline logs to judge whether
    the budget suits the corpus."""
    per_bin = (assignment.groupBy("shard", "bin")
               .agg(F.sum("n_tokens").alias("fill"),
                    F.max(F.col("oversize").cast("int")).alias("ov")))
    return (per_bin.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_bins"),
                 F.round(F.avg(F.least(F.col("fill"), F.lit(budget))
                               / F.lit(float(budget))), 6)
                  .alias("mean_fill_ratio"),
                 F.sum("ov").cast("bigint").alias("n_oversize"))
            .orderBy("shard"))
