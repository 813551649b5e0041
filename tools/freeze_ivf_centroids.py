"""Fit the IVF coarse quantizer offline and freeze the codebook.

Real IVF deployments train the quantizer once on a corpus sample and
apply the frozen codebook at scale; this pins that artifact so (a) the
ivf_ann gate query applies a fixed quantizer and (b) the DuckDB oracle
replays cell assignment from the same literal centroids.

Usage: python tools/freeze_ivf_centroids.py  [sample_parquet] [n_cells]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "ivf_centroids.json")


def main() -> None:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sample = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/testdata/sf0.01/embeddings.parquet"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .appName("freeze-ivf").getOrCreate())
    emb = spark.read.parquet(sample).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("_v"))
    feat = emb.withColumn("_feat", array_to_vector("_v"))
    km = KMeans(k=n_cells, seed=7, featuresCol="_feat",
                predictionCol="_cell").fit(feat)
    centers = [[float(x) for x in c] for c in km.clusterCenters()]
    with open(OUT, "w") as f:
        json.dump({"n_cells": n_cells, "dim": len(centers[0]),
                   "sample": sample, "seed": 7, "centroids": centers}, f)
    print(f"frozen {n_cells} centroids (dim {len(centers[0])}) -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
