"""Benchmark harness (driver contract: ONE JSON line on stdout).

Runs the headline queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship transcript-extraction
pipeline over a cached deterministic synthetic transcripts table, and
prints:

    {"metric": "bench_total", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, "trials": <n>,
     "extraction_turns_per_sec": <throughput>}

Each query is forced with a noop-format write (full computation, no
driver collect cost). Timings exclude session startup.

Per-query times are BEST-OF-N (``$BENCH_TRIALS``, default 3) within one
warm session: this host's steal-time noise reaches 3x between identical
runs (BENCH/BASELINE.md records 74-197 s for back-to-back full suites),
so a single-run figure routinely masquerades noise as regression
(VERDICT r3 adjudicated three such phantoms). Best-of-N in-session is
the documented measurement protocol for this box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_TRANSCRIPT_CONVS = int(os.environ.get("BENCH_CONVS", "400"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:  # path's last 'sf' not followed by a number
        sf = 0.0

    import __spark_entry__ as entry
    from documentai_spark.plans.pipeline import extraction_pipeline
    from documentai_spark.sources.session import build_session, warm_workers
    from documentai_spark.sources.transcripts import write_transcripts_parquet

    # cached deterministic transcripts table for the throughput headline
    tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".benchcache",
                        f"transcripts_c{BENCH_TRANSCRIPT_CONVS}")
    marker = os.path.join(tdir, "_DONE")
    if not os.path.exists(marker):
        n = write_transcripts_parquet(tdir, seed=42,
                                      n_convs=BENCH_TRANSCRIPT_CONVS,
                                      mega_every=100, mega_turns=5000)
        with open(marker, "w") as f:
            f.write(str(n))
    n_turns = int(open(marker).read())

    spark = build_session("bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark, cpus)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    def best_of(run) -> float:
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return best

    # Host-noise canaries (VERDICT r5 #2): two FIXED kernels, one per
    # noise class this box exhibits (CLAUDE.md): pure-JVM codegen work
    # and Arrow/pandas python-worker work. They never change between
    # rounds, so a round-over-round delta in any query can be normalized
    # against the matching canary's delta instead of re-adjudicated —
    # if canary_udf_sec doubled too, the window was slow, not the code.
    def run_canary_jvm():
        # pmod keeps the 20M-term sum inside a long (ANSI mode throws
        # on overflow — the documented Spark-4 trap)
        _force(spark.range(0, 20_000_000, 1, cpus).selectExpr(
            "sum(pmod(xxhash64(id, id + 1), 1000000)) as h"))

    @pandas_udf("double")
    def _canary_udf(v):
        import numpy as np
        a = v.to_numpy()
        return type(v)(np.sqrt(a * 1.0001 + 3.0) * np.log1p(a % 97 + 1.0))

    def run_canary_udf():
        _force(spark.range(0, 2_000_000, 1, cpus * 2)
               .select(_canary_udf(F.col("id").cast("double")).alias("x"))
               .selectExpr("sum(x) as s"))

    canary_jvm = round(best_of(run_canary_jvm), 3)
    canary_udf = round(best_of(run_canary_udf), 3)

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        timings[name] = round(
            best_of(lambda fn=fn: _force(fn(spark, sf_dir))), 3)

    def run_extraction():
        df = extraction_pipeline(
            spark.read.parquet(tdir), salt_buckets=16, ordered_output=True)
        _force(df)

    t_extract = best_of(run_extraction)
    timings["transcript_extraction"] = round(t_extract, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total", "value": total, "unit": "sec",
        "queries": timings, "sf": sf, "trials": trials,
        "extraction_turns": n_turns,
        "extraction_turns_per_sec": round(n_turns / t_extract, 1),
        "canary_jvm_sec": canary_jvm,
        "canary_udf_sec": canary_udf,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
