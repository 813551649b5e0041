"""Train the curation bigram LM offline and freeze it to
data/lm_frozen/ — the data/ml_frozen pattern: the artifact is committed
so (a) the lm_perplexity gate query SCORES under a fixed model instead
of refitting per run, and (b) the DuckDB oracle replays the integer
LUTs exactly (the parquet LUTs + meta.json are the single source for
both engines).

Training corpus: the deterministic sf0.001 documents table (seed-fixed
driver testdata, 500 docs), rows ordered by doc_id. vocab_size=24 of
the corpus's 31 distinct tokens and min_bigram_count=30 are DELIBERATE
(the corpus is dense — every one of the 625 mapped pairs occurs >= 17
times, so a small min would freeze a COMPLETE bigram table): 7 tokens
score as <unk> and 237 of the 625 pairs take the stupid-backoff path, so
all three scoring paths (bigram LUT hit / unigram+backoff / <unk>) are
live on the sf0.01 gate data — a model that always hits the bigram LUT
would leave two of the three paths hash-unchecked.

Usage: python tools/freeze_lm_model.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from documentai_spark.core.lm import train_lm  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "lm_frozen")
TRAIN_SRC = "/root/testdata/sf0.001/documents.parquet"
VOCAB_SIZE = 24
MIN_BIGRAM = 30


def train() -> dict:
    """Deterministic retrain from the committed recipe (also the
    freshness test's regeneration path)."""
    tbl = pq.read_table(TRAIN_SRC, columns=["doc_id", "text"])
    rows = sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    return train_lm([t for _, t in rows], vocab_size=VOCAB_SIZE,
                    min_bigram_count=MIN_BIGRAM)


def main() -> None:
    model = train()
    os.makedirs(OUT, exist_ok=True)
    uni = sorted(model["unigram_cost"].items())
    bi = sorted(model["bigram_cost"].items())
    pq.write_table(pa.table({"w": [w for w, _ in uni],
                             "cost": [c for _, c in uni]}),
                   os.path.join(OUT, "unigrams.parquet"))
    pq.write_table(pa.table({"bigram": [b for b, _ in bi],
                             "cost": [c for _, c in bi]}),
                   os.path.join(OUT, "bigrams.parquet"))
    meta = {k: model[k] for k in ("vocab", "backoff_cost", "scale",
                                  "vocab_size", "min_bigram_count")}
    meta["train_source"] = TRAIN_SRC
    with open(os.path.join(OUT, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(f"frozen: vocab={len(model['vocab'])} "
          f"unigrams={len(uni)} bigrams={len(bi)} "
          f"backoff_cost={model['backoff_cost']} -> {OUT}")


if __name__ == "__main__":
    main()
