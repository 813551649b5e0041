"""Train the gate's document classifier offline and freeze the compiled
artifact to data/ml_frozen/ — the reference ships its classifier the same
way (an offline-trained pickle, document_classification_updated/model/;
model_info.json records the training run).

The artifact is committed so (a) the classify_vote gate query applies a
fixed model instead of refitting per run, matching the reference's
predict-on-pickle flow, and (b) the DuckDB oracle can replay the integer
scorer exactly (weights parquet + meta.json are the single source for
both engines).

Usage: python tools/freeze_ml_model.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from documentai_spark.operators.ml_classify import (  # noqa: E402
    synthesize_labeled_docs, train_frozen_classifier,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "ml_frozen")


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .appName("freeze-ml-model").getOrCreate())
    labeled = synthesize_labeled_docs(spark, n_per_class=60).coalesce(1)
    labeled = labeled.cache()
    model = train_frozen_classifier(labeled, max_iter=60)
    labeled.unpersist()
    model.save(OUT)
    n = model.weights.count()
    print(f"frozen: labels={model.labels} intercepts={model.intercepts} "
          f"vocab={n} -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
