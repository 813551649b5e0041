"""MLlib classifier tests: train/predict accuracy + top-k shape
(the reference's ML 4th vote rebuilt on pyspark.ml)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documentai_spark.operators.ml_classify import (
    predict_with_topk, synthesize_labeled_docs, train_classifier,
)


@pytest.fixture(scope="module")
def model_and_data(spark):
    data = synthesize_labeled_docs(spark, n_per_class=100)
    train = data.filter(F.col("doc_id") % 5 != 0)
    test = data.filter(F.col("doc_id") % 5 == 0)
    model = train_classifier(train)
    return model, test


def test_accuracy_beats_chance(model_and_data):
    model, test = model_and_data
    pred = predict_with_topk(model, test)
    stats = pred.select(
        F.avg((F.col("ml_category") == F.col("label_str")).cast("double"))
         .alias("acc")).collect()[0]
    # 4 balanced classes: chance = 0.25; distinct vocab -> near-perfect
    assert stats.acc > 0.9, stats.acc


def test_topk_shape_and_order(model_and_data):
    model, test = model_and_data
    row = predict_with_topk(model, test, k=3).first()
    assert len(row.ml_topk) == 3
    ps = [x.p for x in row.ml_topk]
    assert ps == sorted(ps, reverse=True)
    assert row.ml_topk[0].category == row.ml_category
    assert 0.0 <= row.ml_confidence <= 1.0


def test_prediction_deterministic(model_and_data):
    model, test = model_and_data
    a = {r.doc_id: r.ml_category
         for r in predict_with_topk(model, test).collect()}
    b = {r.doc_id: r.ml_category
         for r in predict_with_topk(model, test.repartition(7)).collect()}
    assert a == b
