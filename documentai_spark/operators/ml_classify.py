"""ML classification vote: the reference's 4th technique, Spark-native.

The reference trains scikit-learn TF-IDF (1-4gram, 15k features,
sublinear) + LogisticRegression(balanced) offline and broadcasts the
pickle into the per-page vote (document_classification_updated/
train_model_auto.py:28-51; documentClassifier.py:162-205 predict;
model/model_info.json records CV accuracy 0.9212 on 18 classes).

Spark-first rebuild: the SAME model family via pyspark.ml — Tokenizer ->
NGram-augmented HashingTF -> IDF -> LogisticRegression — trained
distributed, applied as a fitted PipelineModel (no pickle, no python in
the scoring hot path: MLlib transforms are JVM columnar).

Top-3 predictions (documentClassifier.py:199-203 argsort()[-3:]) come
from the probability vector via vector_to_array + sorted slice (W3).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import (
    IDF, HashingTF, NGram, StringIndexer, Tokenizer,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_pipeline(num_features: int = 1 << 14,
                            reg_param: float = 0.01,
                            max_iter: int = 50) -> Pipeline:
    """TF-IDF (unigram+bigram hashed) + logistic regression.

    HashingTF replaces the reference's 15k-feature CountVectorizer — at
    corpus scale a hash-trick featurizer needs no vocabulary broadcast
    and no driver-side fit pass."""
    tok = Tokenizer(inputCol="text", outputCol="_words")
    bigrams = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(inputCol="_words", outputCol="_tf1",
                    numFeatures=num_features)
    tf2 = HashingTF(inputCol="_bigrams", outputCol="_tf2",
                    numFeatures=num_features)
    from pyspark.ml.feature import VectorAssembler
    assemble = VectorAssembler(inputCols=["_tf1", "_tf2"],
                               outputCol="_tf")
    idf = IDF(inputCol="_tf", outputCol="features")
    indexer = StringIndexer(inputCol="label_str", outputCol="label",
                            stringOrderType="alphabetAsc")
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            family="multinomial")
    return Pipeline(stages=[tok, bigrams, tf1, tf2, assemble, idf,
                            indexer, lr])


def train_classifier(labeled: DataFrame, **pipeline_kw) -> PipelineModel:
    """labeled: (text string, label_str string) -> fitted PipelineModel.

    Training sets that fit in one partition should be coalesced by the
    caller: LBFGS pays a full task-scheduling round per iteration, so 32
    shuffle partitions on a few hundred rows is pure overhead (measured
    ~2x end-to-end on the gate's synthetic trainer)."""
    return build_training_pipeline(**pipeline_kw).fit(labeled)


def predict_with_topk(model: PipelineModel, df: DataFrame,
                      text_col: str = "text", k: int = 3) -> DataFrame:
    """Adds ml_category + ml_confidence + ml_topk (W3 top-k classes).

    Labels are recovered from the StringIndexer stage; probability vector
    -> array -> sorted (desc, label asc) slice — all JVM columnar."""
    indexer = next(s for s in model.stages
                   if s.__class__.__name__ == "StringIndexerModel")
    labels = list(indexer.labels)
    scored = model.transform(df.withColumnRenamed(text_col, "text")
                             if text_col != "text" else df)
    probs = vector_to_array(F.col("probability"))
    label_arr = F.array(*[F.lit(lb) for lb in labels])
    ranked = F.reverse(F.array_sort(F.zip_with(
        probs, label_arr,
        lambda p, lb: F.struct(p.alias("p"), lb.alias("category")))))
    out = (scored
           .withColumn("_ranked", ranked)
           .withColumn("ml_category",
                       F.element_at("_ranked", 1)["category"])
           .withColumn("ml_confidence", F.element_at("_ranked", 1)["p"])
           .withColumn("ml_topk", F.slice("_ranked", 1, k)))
    drop = ["_words", "_bigrams", "_tf1", "_tf2", "_tf", "features",
            "rawPrediction", "probability", "prediction", "_ranked"]
    return out.drop(*[c for c in drop if c in out.columns])


def classify_with_ml_vote(df: DataFrame, cfg, model: PipelineModel,
                          text_col: str = "extracted_text",
                          default: str = "unclassified") -> DataFrame:
    """The full 4-technique ensemble: 3 rule techniques + this ML model
    as the 4th vote with k/4 confidence (documentClassifier.py:898-948 —
    'Add ML classifier as 4th technique' + 4/4 final classification).

    MLlib scoring is JVM columnar and the rule techniques are generated
    expressions, so the whole 4-way vote stays out of Python."""
    from documentai_spark.operators.classify import classify_with_vote
    scored = predict_with_topk(model, df, text_col=text_col)
    if text_col != "text" and "text" in scored.columns:
        scored = scored.withColumnRenamed("text", text_col)
    return classify_with_vote(scored, cfg, text_col=text_col,
                              default=default,
                              ml_category_col="ml_category")


def synthesize_labeled_docs(spark, n_per_class: int = 120,
                            seed: int = 42) -> DataFrame:
    """Deterministic labeled corpus: class-specific vocabulary + shared
    noise words (mirrors the fixture style; hash-driven, seed-fixed)."""
    import hashlib

    vocab = {
        "invoice": "invoice amount total unit price payment due tax".split(),
        "purchase_order": "purchase order po number supplier delivery".split(),
        "letter_of_credit": ("letter credit beneficiary applicant swift "
                             "documentary").split(),
        "shipping": "vessel port lading freight container bill".split(),
    }
    noise = "the of and to for with this that from under".split()
    rows = []
    i = 0
    for label, words in vocab.items():
        for j in range(n_per_class):
            h = int.from_bytes(hashlib.md5(
                f"{seed}|{label}|{j}".encode()).digest()[:8], "big")
            toks = []
            for t in range(12 + h % 8):
                src = words if (h >> t) % 3 else noise
                toks.append(src[(h >> (t % 13)) % len(src)])
            rows.append((i, " ".join(toks), label))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "label_str"])
