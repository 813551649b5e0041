"""Decompose the streaming near-dedup drain's wall clock (r8, VERDICT
item 1: the 0.527 N->4N scaling number needs a profile before a fix).

Runs the bench_stream_near_dedup corpus recipe at a configurable scale
and captures Spark's own per-micro-batch ``durationMs`` breakdown
(addBatch = the parallel work; triggerExecution - addBatch = planning +
offset/commit WAL + state-store commit, the per-batch serial tax), plus
the state-operator metrics (rows updated, state memory) and the Python
update function's own in-worker time (accumulated via an Accumulator).

Usage: PROF_COPIES=4 PROF_CPUS=8 python tools/profile_stream_near_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, ".benchcache", "stream_near")
COPIES = int(os.environ.get("PROF_COPIES", "4"))
CPUS = int(os.environ.get("PROF_CPUS", "8"))
N_FILES = int(os.environ.get("PROF_FILES", "16"))
FPT = int(os.environ.get("PROF_FPT", "4"))
THRESHOLD = 0.7


def main() -> None:
    from documentai_spark.sources.session import build_session
    os.makedirs(WORK, exist_ok=True)
    os.environ.setdefault("PREP_CPUS", str(CPUS))

    import tools.bench_prepare_sf1 as prep
    spark = build_session("prof-stream-near", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 32),
                          extra_conf={"spark.driver.memory": "8g"})
    src = prep._build_big_docs(spark, COPIES)
    docs = spark.read.parquet(src).select("doc_id", "text")
    n_docs = docs.count()
    in_dir = os.path.join(WORK, f"prof_in_{COPIES}x_{N_FILES}")
    if not os.path.exists(in_dir + "._DONE"):
        shutil.rmtree(in_dir, ignore_errors=True)
        docs.repartition(N_FILES).write.parquet(in_dir)
        open(in_dir + "._DONE", "w").write(str(n_docs))

    from documentai_spark.streaming.near_dedup import (
        start_near_dedup_to_parquet, streaming_near_dup_verdicts,
    )
    out = os.path.join(WORK, f"prof_out_{CPUS}")
    ck = os.path.join(WORK, f"prof_ck_{CPUS}")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)

    schema = spark.read.parquet(in_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", FPT).parquet(in_dir))
    t0 = time.time()
    q = start_near_dedup_to_parquet(
        streaming_near_dup_verdicts(stream, threshold=THRESHOLD),
        out, ck)
    q.awaitTermination()
    wall = time.time() - t0

    progress = [json.loads(p) if isinstance(p, str) else p
                for p in q.recentProgress]
    rows_total = 0
    agg: dict[str, float] = {}
    state_mem = 0
    for p in progress:
        d = p.get("durationMs", {})
        for k, v in d.items():
            agg[k] = agg.get(k, 0) + v / 1000.0
        rows_total += p.get("numInputRows", 0)
        for op in p.get("stateOperators", []):
            state_mem = max(state_mem, op.get("memoryUsedBytes", 0))
    add_batch = agg.get("addBatch", 0.0)
    trigger = agg.get("triggerExecution", 0.0)

    # per-stage totals from the UI REST API: which stage eats the time,
    # and is total CPU work constant across core counts (parallelization
    # loss) or inflated (contention)?
    import urllib.request
    url = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
           f"{spark.sparkContext.applicationId}/stages?status=complete")
    stages = json.load(urllib.request.urlopen(url))
    by_name: dict[str, dict] = {}
    for s in stages:
        key = s["name"].split("+")[0][:60]
        b = by_name.setdefault(key, {"n": 0, "run_s": 0.0, "wall_s": 0.0,
                                     "gc_s": 0.0, "in_mb": 0.0,
                                     "sw_mb": 0.0, "tasks": 0})
        b["n"] += 1
        b["run_s"] += s["executorRunTime"] / 1000.0
        b["gc_s"] += s["jvmGcTime"] / 1000.0
        b["in_mb"] += s["inputBytes"] / 1e6
        b["sw_mb"] += s["shuffleWriteBytes"] / 1e6
        b["tasks"] += s["numTasks"]
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            pass
    for k, b in sorted(by_name.items(), key=lambda kv: -kv[1]["run_s"]):
        print(f"STAGE {b['run_s']:8.1f}s run {b['gc_s']:6.1f}s gc "
              f"{b['n']:3d} stages {b['tasks']:4d} tasks "
              f"{b['in_mb']:8.1f}MB in {b['sw_mb']:8.1f}MB shufw  {k}",
              file=sys.stderr)
    total_run = sum(b["run_s"] for b in by_name.values())
    print(f"STAGE_TOTAL run={total_run:.1f}s over {CPUS} cores -> "
          f"ideal {total_run / CPUS:.1f}s", file=sys.stderr)
    print(json.dumps({
        "cpus": CPUS, "docs": n_docs, "batches": len(progress),
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "addBatch_sec": round(add_batch, 1),
        "serial_tax_sec": round(trigger - add_batch, 1),
        "durationMs_sums_sec": {k: round(v, 1) for k, v in
                                sorted(agg.items())},
        "outside_trigger_sec": round(wall - trigger, 1),
        "state_mem_mb": round(state_mem / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
