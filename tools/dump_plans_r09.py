"""Dump .explain("formatted") for the r9-touched queries to
plans/r09/<query>_{before,after}.txt.

Run from a tree (HEAD or a round-start worktree) with the suffix arg:

    python tools/dump_plans_r09.py after  [out_dir]
    python tools/dump_plans_r09.py before [out_dir]   # from the r8 worktree

Explain-only: no query executes except the eager localCheckpoints some
operators take at plan-build time (tiny tables by design).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "simhash_dups", "ml_scores", "classify_vote", "minhash_dedup",
    "rep_signals", "decontaminate", "stream_band_keys", "top_customers",
    "preprocess_route", "redact_entities", "corpus_filter", "ivf_ann",
    "cosine_topk", "embedding_near_dups", "lsh_ann", "extract_quality",
    "t_plain_quality", "text_tables", "doc_lang_quality",
    "pricing_summary", "order_priority", "lm_perplexity",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, "plans", "r09")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from documentai_spark.sources.session import build_session
    spark = build_session("plans_r09", master="local[4]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    qs = entry.queries()
    for name in QUERIES:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
