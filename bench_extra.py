"""Extra (non-frozen) benchmarks: noop-sink isolation of the expensive
queries' internal stages (guide §1.4), so optimization targets the
component that actually costs, not the query total.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]

Prints one line per stage: name, best-of-N seconds. Not part of the
driver contract — bench.py stays the frozen measurement harness.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    only = set(sys.argv[1:])

    from documentai_spark.sources.session import build_session, warm_workers
    spark = build_session("bench_extra", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark, cpus)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    from documentai_spark.operators.dedup import (
        _md5_fold, normalized_text, simhash_signatures, simhash_near_dups,
        with_shingles, minhash_signatures, minhash_lsh_candidates,
    )
    from documentai_spark.operators.ml_classify import (
        explode_terms, tokens_col,
    )

    stages: dict[str, object] = {}

    # --- simhash decomposition ---
    stages["simhash/0_scan"] = lambda: _force(docs.select("doc_id", "text"))
    stages["simhash/1_norm"] = lambda: _force(
        docs.select("doc_id", normalized_text(F.col("text")).alias("n")))
    stages["simhash/2_explode_md5"] = lambda: _force(
        docs.select("doc_id",
                    F.split(normalized_text(F.col("text")), " ")
                    .alias("_toks"))
            .select("doc_id", F.explode("_toks").alias("_tok"))
            .select("doc_id", _md5_fold(F.col("_tok")).alias("_h")))
    stages["simhash/3_signatures"] = lambda: _force(
        simhash_signatures(docs))
    stages["simhash/4_full"] = lambda: _force(
        simhash_near_dups(docs, max_hamming=3).orderBy("id_a", "id_b"))

    # --- minhash decomposition ---
    stages["minhash/1_shingles"] = lambda: _force(
        with_shingles(docs, "text"))
    stages["minhash/2_signatures"] = lambda: _force(
        minhash_signatures(docs))
    stages["minhash/3_candidates"] = lambda: _force(
        minhash_lsh_candidates(docs))

    # --- ml scorer decomposition ---
    from documentai_spark.operators.ml_classify import (
        FrozenTextClassifier, integer_scores,
    )
    ml_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "ml_frozen")
    model = FrozenTextClassifier.load(spark, ml_dir)
    d2 = docs.select("doc_id", "text")
    stages["ml/1_tokens"] = lambda: _force(
        d2.select("doc_id", tokens_col(F.col("text")).alias("_tk")))
    stages["ml/2_terms"] = lambda: _force(
        explode_terms(d2, "text", ["doc_id"], model.max_ngram))
    stages["ml/3_joined"] = lambda: _force(
        explode_terms(d2, "text", ["doc_id"], model.max_ngram)
        .join(F.broadcast(model.weights), "term"))
    stages["ml/4_scores"] = lambda: _force(
        integer_scores(model, d2).orderBy("doc_id"))

    # --- rep_signals decomposition ---
    from documentai_spark.operators.curation import (
        exact_ngrams_col, repetition_signals, token_count_col,
    )
    stages["rep/1_lines"] = lambda: _force(
        docs.select("doc_id", F.split(F.col("text"), "\n").alias("_ls"))
            .select("doc_id", F.explode("_ls").alias("line"))
            .filter(F.length(F.trim(F.col("line"))) > 0)
            .groupBy("doc_id", "line").agg(F.count(F.lit(1)).alias("c")))
    stages["rep/2_grams"] = lambda: _force(
        docs.select("doc_id", tokens_col(F.col("text")).alias("_tk"))
            .select("doc_id",
                    F.explode(exact_ngrams_col(F.col("_tk"), 2))
                    .alias("gram"))
            .groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c")))
    stages["rep/3_full"] = lambda: _force(
        repetition_signals(docs).orderBy("doc_id"))

    def best_of(run) -> float:
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return best

    for name, fn in stages.items():
        if only and not any(name.startswith(o) for o in only):
            continue
        spark.sparkContext.setJobDescription(name)
        t = best_of(fn)
        print(f"{name:28s} {t:7.3f} s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
