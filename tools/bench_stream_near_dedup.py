"""Scale + parallelism evidence for the STREAMING near-dedup operator.

The batch near-dedup's sf1-shape numbers are on record
(bench_prepare_sf1); this harness puts the streaming form on the same
record. It reuses bench_prepare_sf1's perturbed-copies corpus recipe
(per-copy internal near-dup structure scales with copies; long docs
form cross-copy clusters), lays the table out as many files so the
drain runs MANY micro-batches (cross-batch state is what's being
exercised — a one-batch drain never touches the state store across
commits), and drains it through ``streaming_near_dup_verdicts`` +
``start_near_dedup_to_parquet`` (no ``finish`` — the dedup operator
itself is the thing timed), recording:

- wall seconds, docs/s, micro-batch count per scale;
- the flagged near-dup count vs the BATCH ``near_dedup`` drop count on
  the identical table at the same threshold (the estimator-vs-true-
  Jaccard and single-link-vs-closure deltas, reported honestly);
- the same drain at two parallelism levels (N and 4N cores) on the
  same input — throughput at both plus scaling efficiency, the
  north-rule two-cluster-size criterion applied to the streaming leg —
  and a determinism check: the flag count must be IDENTICAL across
  parallelism levels (per-bucket processing is id-sorted, so the
  verdict set is a pure function of the batch sequence).

Appends a markdown section to BENCH/SF1.md.

Usage: STREAM_COPIES=12 python tools/bench_stream_near_dedup.py
  (STREAM_CPUS_SMALL=8 STREAM_CPUS_BIG=32 to override the ladder)
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_MD = os.path.join(REPO, "BENCH", "SF1.md")
WORK = os.path.join(REPO, ".benchcache", "stream_near")
COPIES = int(os.environ.get("STREAM_COPIES", "12"))
CPUS_SMALL = int(os.environ.get("STREAM_CPUS_SMALL", "8"))
CPUS_BIG = int(os.environ.get("STREAM_CPUS_BIG", "32"))
N_FILES = int(os.environ.get("STREAM_FILES", "32"))
FILES_PER_TRIGGER = int(os.environ.get("STREAM_FPT", "4"))
THRESHOLD = 0.7


def _session(cpus: int):
    from documentai_spark.sources.session import build_session
    return build_session("bench-stream-near", master=f"local[{cpus}]",
                         shuffle_partitions=max(cpus, 32),
                         extra_conf={"spark.driver.memory": "8g"})


def _drain(spark, in_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from documentai_spark.streaming.near_dedup import (
        start_near_dedup_to_parquet, streaming_near_dup_verdicts,
    )

    out = os.path.join(WORK, f"out_{tag}")
    ck = os.path.join(WORK, f"ck_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    schema = spark.read.parquet(in_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
              .parquet(in_dir))
    t0 = time.time()
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=THRESHOLD),
        out, ck)
    q.awaitTermination()
    wall = time.time() - t0
    # count COMMITTED batches from the checkpoint, not recentProgress —
    # Spark retains only the last ~100 progress updates, so a large
    # drain (STREAM_FILES=1000 STREAM_FPT=2 -> ~500 batches) would be
    # silently undercounted in the scale evidence
    try:
        n_batches = len([f for f in os.listdir(os.path.join(ck, "commits"))
                         if f.isdigit()]) or None
    except OSError:
        n_batches = None
    res = spark.read.parquet(out)
    acc = res.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("is_near_dup").cast("int")).alias("near_dup")).first()
    return {"wall_sec": round(wall, 1), "rows": acc["rows"],
            "near_dup": acc["near_dup"],
            "docs_per_sec": round(acc["rows"] / wall, 1),
            "n_batches": n_batches}


def _leg(cpus: int, in_dir: str) -> None:
    """One drain in a FRESH process (fresh JVM — driver memory and
    master are launch-time-fixed, the bench_scaling leg protocol)."""
    spark = _session(cpus)
    print("LEG_RESULT " + json.dumps(_drain(spark, in_dir, f"leg{cpus}")))
    spark.stop()


def _run_leg(cpus: int, in_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", str(cpus),
         in_dir],
        capture_output=True, text=True, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise RuntimeError(f"leg {cpus} failed:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    os.makedirs(WORK, exist_ok=True)

    # ---- build the corpus once (bench_prepare_sf1's recipe) ----
    os.environ.setdefault("PREP_CPUS", str(CPUS_BIG))
    import tools.bench_prepare_sf1 as prep

    spark = _session(CPUS_BIG)
    src = prep._build_big_docs(spark, COPIES)
    docs = spark.read.parquet(src).select("doc_id", "text")
    n_docs = docs.count()
    # many small files -> many micro-batches (cross-batch state)
    in_dir = os.path.join(WORK, f"in_{COPIES}x")
    marker = in_dir + "._DONE"
    if not os.path.exists(marker):
        shutil.rmtree(in_dir, ignore_errors=True)
        docs.repartition(N_FILES).write.parquet(in_dir)
        open(marker, "w").write(str(n_docs))

    # ---- batch reference on the identical table ----
    from documentai_spark.operators.dedup import near_dedup
    t0 = time.time()
    batch_kept = near_dedup(spark.read.parquet(in_dir),
                            jaccard_threshold=THRESHOLD).count()
    batch_wall = time.time() - t0
    batch_dropped = n_docs - batch_kept
    spark.stop()

    # ---- streaming drains, each in a fresh process/JVM ----
    big = _run_leg(CPUS_BIG, in_dir)
    small = _run_leg(CPUS_SMALL, in_dir)

    assert big["rows"] == small["rows"] == n_docs
    det = "IDENTICAL" if big["near_dup"] == small["near_dup"] else \
        f"DIFFER ({small['near_dup']} vs {big['near_dup']})"
    eff = round(big["docs_per_sec"]
                / (small["docs_per_sec"] * (CPUS_BIG / CPUS_SMALL)), 3)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## Streaming near-dedup at scale {stamp} "
        f"(tools/bench_stream_near_dedup.py)",
        "",
        f"{n_docs:,} docs ({COPIES}x sf0.1 perturbed copies), "
        f"{N_FILES} files drained {FILES_PER_TRIGGER}/trigger "
        f"(~{N_FILES // FILES_PER_TRIGGER} micro-batches, cross-batch "
        f"band-bucket state), threshold {THRESHOLD}.",
        "",
        "| leg | cores | wall s | docs/s | near_dup flagged |",
        "|---|---|---|---|---|",
        f"| streaming N | {CPUS_SMALL} | {small['wall_sec']} | "
        f"{small['docs_per_sec']} | {small['near_dup']:,} |",
        f"| streaming 4N | {CPUS_BIG} | {big['wall_sec']} | "
        f"{big['docs_per_sec']} | {big['near_dup']:,} |",
        f"| batch near_dedup (reference) | {CPUS_BIG} | "
        f"{round(batch_wall, 1)} | {round(n_docs / batch_wall, 1)} | "
        f"{batch_dropped:,} |",
        "",
        f"N->4N scaling efficiency (docs/s per core): **{eff}**. "
        f"Verdict determinism across parallelism: **{det}**. "
        f"Streaming flags vs batch drops: "
        f"{big['near_dup']:,} vs {batch_dropped:,} "
        f"({round(100 * big['near_dup'] / max(batch_dropped, 1), 1)}% — "
        "signature-estimator verify and arrival-order single-link vs "
        "true-Jaccard verify and global closure; the deltas are the "
        "documented online-dedup tradeoff, not noise).",
    ]
    with open(OUT_MD, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), sys.argv[3])
    else:
        main()
