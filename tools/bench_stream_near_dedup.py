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
- the same drain at a LADDER of parallelism levels (default 2 / 8 /
  32 cores, best-of-STREAM_TRIALS each — this VM's steal-time noise is
  up to 3x on single runs) — the north-rule N->4N criterion is scored
  on the 2->8 leg, inside the host's linear region, exactly like the
  batch pipeline's scaling evidence (BENCH/BASELINE.md "Why N=2": the
  host itself only delivers ~0.45 efficiency for 4->16 on
  memory-touching work, so 8->32 measures the HOST ceiling, not the
  operator; the 8->32 leg is still reported as the saturation
  disclosure) — and a determinism check: the flag count must be
  IDENTICAL across parallelism levels (per-bucket processing is
  id-sorted, so the verdict set is a pure function of the batch
  sequence).

Appends a markdown section to BENCH/SF1.md.

Usage: STREAM_COPIES=12 python tools/bench_stream_near_dedup.py
  (STREAM_CPUS="2,8,32" STREAM_TRIALS=2 to override the ladder)
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
CPUS_LADDER = [int(c) for c in
               os.environ.get("STREAM_CPUS", "2,8,32").split(",")]
TRIALS = int(os.environ.get("STREAM_TRIALS", "2"))
CPUS_BIG = max(CPUS_LADDER)
N_FILES = int(os.environ.get("STREAM_FILES", "256"))
FILES_PER_TRIGGER = int(os.environ.get("STREAM_FPT", "32"))
# r8: files-per-trigger BOUNDS the map-side parallelism of every
# micro-batch (the shingle+MinHash pandas UDF runs on one task per
# file) — the r7 geometry (32 files, 4/trigger) capped the most
# CPU-heavy stage at 4 tasks, so legs beyond 4 cores idled through it
# and the measured "poor scaling" was the bench layout, not the
# operator. 256 files at 32/trigger keeps the same ~8 micro-batches
# (cross-batch state still exercised) with 32-way map parallelism.
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

    # ---- streaming drains: ladder x trials, each a fresh JVM ----
    best: dict[int, dict] = {}
    for cpus in sorted(CPUS_LADDER):
        for t in range(TRIALS):
            r = _run_leg(cpus, in_dir)
            assert r["rows"] == n_docs
            if cpus not in best or r["wall_sec"] < best[cpus]["wall_sec"]:
                best[cpus] = r
            print(f"leg {cpus} trial {t}: {r['wall_sec']}s")

    flags = {r["near_dup"] for r in best.values()}
    det = "IDENTICAL" if len(flags) == 1 else f"DIFFER ({sorted(flags)})"

    def eff(lo: int, hi: int) -> float | None:
        if lo not in best or hi not in best:
            return None
        return round(best[hi]["docs_per_sec"]
                     / (best[lo]["docs_per_sec"] * (hi / lo)), 3)

    eff_linear = eff(2, 8)
    eff_sat = eff(8, 32)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## Streaming near-dedup at scale {stamp} "
        f"(tools/bench_stream_near_dedup.py)",
        "",
        f"{n_docs:,} docs ({COPIES}x sf0.1 perturbed copies), "
        f"{N_FILES} files drained {FILES_PER_TRIGGER}/trigger "
        f"(~{N_FILES // FILES_PER_TRIGGER} micro-batches, cross-batch "
        f"band-bucket state), threshold {THRESHOLD}, best of "
        f"{TRIALS} trials per leg (sharded-state operator, r8).",
        "",
        "| leg | cores | wall s | docs/s | near_dup flagged |",
        "|---|---|---|---|---|",
    ]
    for cpus in sorted(best):
        r = best[cpus]
        lines.append(f"| streaming | {cpus} | {r['wall_sec']} | "
                     f"{r['docs_per_sec']} | {r['near_dup']:,} |")
    lines += [
        f"| batch near_dedup (reference) | {CPUS_BIG} | "
        f"{round(batch_wall, 1)} | {round(n_docs / batch_wall, 1)} | "
        f"{batch_dropped:,} |",
        "",
        f"N->4N scaling efficiency (docs/s per core), 2->8 cores — the "
        f"host's linear region, the batch pipeline's protocol "
        f"(BENCH/BASELINE.md 'Why N=2'): **{eff_linear}**. "
        f"8->32 (host-saturated region, disclosure): **{eff_sat}**. "
        f"Verdict determinism across parallelism: **{det}**. "
        f"Streaming flags vs batch drops: "
        f"{best[CPUS_BIG]['near_dup']:,} vs {batch_dropped:,} "
        f"({round(100 * best[CPUS_BIG]['near_dup'] / max(batch_dropped, 1), 1)}% — "
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
