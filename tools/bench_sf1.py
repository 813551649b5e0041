"""Full-suite scale run at sf1 shape (VERDICT r3 #5).

STRESS_r03 covered dedup/ANN at 10x bench scale; this harness covers the
REST of the suite — extraction, classification, quality, text-analysis —
at a 10x-sf0.1 ("sf1") data shape, recording per-query wall times so the
scale story is measured, not asserted, for every query family.

Data (deterministic, cached under .benchcache/sf1shape):

- ``documents``  50,000 rows: the sf0.1 table replicated 10x with doc_id
  offsets and a per-copy 8-token perturbation suffix (keeps cross-copy
  Jaccard ~0.7, far below the 0.9 dedup threshold, so the dup structure
  scales LINEARLY instead of exploding into 10-way identical clusters);
- ``embeddings`` 20,000 x 64: replicated 10x with vec_id offsets and a
  per-copy deterministic dim perturbation;
- ``events``     10x with event_id/user_id offsets (window/rollup
  queries keep their per-user shape, 10x the users);
- ``transcripts`` 4,000 conversations (10x the bench headline) from the
  deterministic generator, mega-conversation skew included.

Queries: every ``queries()`` entry whose source touches only the scaled
tables (documents/embeddings/events), plus the full pipeline legs over
the 4,000-conv transcripts (extraction+quality+verdict, selective
preprocess, classify+group, entities). TPC-H-table queries
(pricing_summary / top_customers / order_priority) and the committed-
fixture entity/rule queries are excluded: the former are standard
scan/agg/join shapes already exercised by the scaled events table; the
latter are pinned to the committed fixture by design.

Appends a markdown table to BENCH/SF1.md with a flag on any query whose
time scales super-linearly (> 15x its same-session sf0.1 time).

Usage: SF1_CPUS=32 python tools/bench_sf1.py
"""

from __future__ import annotations

import inspect
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SF1_CPUS", "32"))
COPIES = int(os.environ.get("SF1_COPIES", "10"))
CONVS = int(os.environ.get("SF1_CONVS", "4000"))
SRC_SF = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
CACHE = os.path.join(REPO, ".benchcache", "sf1shape")
OUT_MD = os.path.join(REPO, "BENCH", "SF1.md")

SCALED_TABLES = ("documents", "embeddings", "events")
EXCLUDED_TABLES = ("lineitem", "orders", "customer", "supplier", "part",
                   "region", "nation")


def _build_tables(spark) -> None:
    marker = os.path.join(CACHE, "_DONE")
    if os.path.exists(marker):
        return
    os.makedirs(CACHE, exist_ok=True)

    docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    n_docs = docs.count()
    parts = []
    for c in range(COPIES):
        # per-copy suffix: 8 copy+id-derived tokens -> cross-copy Jaccard
        # ~0.7 on ~45-token docs, below every dedup threshold in the suite
        suffix = F.concat_ws(" ", *[
            F.concat(F.lit(f"cp{c}x{j}q"),
                     F.conv(F.hex(F.abs(F.xxhash64(
                         F.col("doc_id"), F.lit(c * 8 + j)))), 16, 36))
            for j in range(8)])
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(c * n_docs)).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), suffix).alias("text"),
            *[col for col in docs.columns if col not in
              ("doc_id", "text")]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS).write.mode("overwrite") \
       .parquet(f"{CACHE}/documents.parquet")

    emb = spark.read.parquet(f"{SRC_SF}/embeddings.parquet")
    n_emb = emb.count()
    parts = []
    for c in range(COPIES):
        if c == 0:
            e = emb
        else:
            # deterministic per-copy perturbation of one dimension
            e = emb.withColumn("embedding", F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == F.lit(c % 64),
                    x + F.lit(0.01 * (c + 1))).otherwise(x)
                .cast("float")))
        parts.append(e.select(
            (F.col("vec_id") + F.lit(c * n_emb)).alias("vec_id"),
            "embedding",
            *[col for col in emb.columns if col not in
              ("vec_id", "embedding")]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS).write.mode("overwrite") \
       .parquet(f"{CACHE}/embeddings.parquet")

    ev = spark.read.parquet(f"{SRC_SF}/events.parquet")
    maxes = ev.select(*[F.max(c).alias(c) for c in ("event_id", "user_id")
                        if c in ev.columns]).collect()[0].asDict()
    parts = []
    for c in range(COPIES):
        sel = ev
        for k, m in maxes.items():
            sel = sel.withColumn(k, F.col(k) + F.lit(c * (int(m) + 1)))
        parts.append(sel)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS).write.mode("overwrite") \
       .parquet(f"{CACHE}/events.parquet")

    from documentai_spark.sources.transcripts import (
        write_transcripts_parquet,
    )
    n = write_transcripts_parquet(
        os.path.join(CACHE, "transcripts"), seed=42, n_convs=CONVS,
        mega_every=100, mega_turns=5000)
    with open(marker, "w") as f:
        f.write(json.dumps({"docs": n_docs * COPIES,
                            "vecs": n_emb * COPIES, "turns": n}))


def _eligible_queries(entry) -> list[str]:
    names = []
    for name, fn in entry.queries().items():
        src = inspect.getsource(fn)
        if "_transcripts(" in src:
            continue
        if any(f'"{t}"' in src for t in EXCLUDED_TABLES):
            continue
        if any(f'"{t}"' in src for t in SCALED_TABLES):
            names.append(name)
    return names


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry
    from documentai_spark.plans.pipeline import extraction_pipeline
    from documentai_spark.sources.session import build_session

    spark = build_session("bench-sf1", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    _build_tables(spark)
    meta = json.loads(open(os.path.join(CACHE, "_DONE")).read())

    # warm workers off the clock (shared bench protocol)
    from documentai_spark.sources.session import warm_workers
    warm_workers(spark, CPUS)

    names = _eligible_queries(entry)
    rows = []
    for name in names:
        fn = entry.queries()[name]
        t0 = time.time()
        _force(fn(spark, SRC_SF))
        t_small = time.time() - t0
        t0 = time.time()
        _force(fn(spark, CACHE))
        t_big = time.time() - t0
        ratio = t_big / max(t_small, 1e-9)
        rows.append((name, t_small, t_big, ratio))
        print(f"{name:24s} sf0.1={t_small:6.1f}s sf1={t_big:7.1f}s "
              f"x{ratio:.1f}")

    # pipeline legs over the 4,000-conv transcripts
    tpath = os.path.join(CACHE, "transcripts")

    def leg_extract():
        _force(extraction_pipeline(spark.read.parquet(tpath),
                                   salt_buckets=16, ordered_output=True))

    def leg_preprocess():
        from documentai_spark.functions.verdict import with_verdict
        from documentai_spark.operators.extraction import (
            with_extraction_and_quality,
        )
        from documentai_spark.operators.preprocess import (
            selective_preprocess,
        )
        df = with_verdict(with_extraction_and_quality(
            spark.read.parquet(tpath)))
        _force(selective_preprocess(df).select(
            "conv_id", "turn_idx", "was_preprocessed", "was_reverted"))

    def leg_classify():
        from documentai_spark.operators.classify import (
            ClassifierConfig, classify_with_vote, group_consecutive,
        )
        cfg = ClassifierConfig.compile({
            "billing": {"keywords": ["invoice", "amount", "total"],
                        "max_pages": 3},
            "shipping": {"keywords": ["vessel", "port", "freight",
                                      "shipment"]},
            "credit": {"keywords": ["credit", "beneficiary"]},
        })
        t = spark.read.parquet(tpath) \
            .withColumnRenamed("text", "extracted_text")
        _force(group_consecutive(classify_with_vote(t, cfg), cfg))

    def leg_entities():
        _force(extraction_pipeline(spark.read.parquet(tpath),
                                   salt_buckets=16, ordered_output=False,
                                   include_entities=True))

    for name, leg in (("pipeline_extraction", leg_extract),
                      ("pipeline_preprocess", leg_preprocess),
                      ("pipeline_classify", leg_classify),
                      ("pipeline_entities", leg_entities)):
        t0 = time.time()
        leg()
        t_big = time.time() - t0
        rows.append((name, None, t_big, None))
        print(f"{name:24s} sf1={t_big:7.1f}s "
              f"({meta['turns'] / t_big:,.0f} turns/s)"
              if name == "pipeline_extraction" else
              f"{name:24s} sf1={t_big:7.1f}s")

    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(OUT_MD, "a") as f:
        f.write(f"\n## sf1-shape full-suite run {stamp} "
                f"(local[{CPUS}], {COPIES}x sf0.1: "
                f"{meta['docs']:,} docs / {meta['vecs']:,} vecs / "
                f"{meta['turns']:,} turns)\n\n")
        f.write("| query | sf0.1 s | sf1 s | ratio | note |\n")
        f.write("|---|---|---|---|---|\n")
        for name, ts, tb, ratio in rows:
            note = ""
            if ratio is not None and ratio > 15:
                note = "**SUPER-LINEAR — triage**"
            f.write(f"| {name} | "
                    f"{'' if ts is None else f'{ts:.1f}'} | {tb:.1f} | "
                    f"{'' if ratio is None else f'{ratio:.1f}x'} | "
                    f"{note} |\n")
    print(f"appended -> {OUT_MD}")
    spark.stop()


if __name__ == "__main__":
    main()
