"""fastText-style document quality classifier (the LLM-corpus X5 twin).

CCNet/GPT-3-style pipelines train a linear classifier to separate
reference-quality text from crawl text and keep documents the model
scores high (Brown et al. 2020 §A; Wenzek et al. 2020 §4.3 use an LM, the
classifier variant is the common alternative). Here the same shape on
Spark: the engineered features are the already-oracled JVM-side quality
signals (``functions.text.quality_features`` — length, token, stopword
and uniqueness stats — plus punctuation/digit density), the estimator is
spark.ml ``LogisticRegression``, and scoring is a model.transform — a
map-only plan with no Python in the loop at any corpus size.

Labels: in production these come from a curated positive set (e.g. a
reference corpus) vs random crawl negatives. ``weak_label_frame`` builds
the standard weak-supervision stand-in — heuristic rules mark clearly
good / clearly bad documents and leave the rest unlabeled — so the
pipeline is trainable and testable without shipping a corpus.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame, functions as F

from ..functions.text import quality_features

FEATURES = [
    "n_chars",
    "n_tokens",
    "n_unique_tokens",
    "stopword_ratio",
    "unique_ratio",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
]


def quality_feature_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All quality signals as plain double columns (JVM expressions only —
    the shared definitions the `doc_quality` oracle verifies, plus
    punctuation/digit density)."""
    t = F.col(text_col)
    feats = quality_features(t)
    n_chars = F.greatest(F.length(t), F.lit(1))
    derived = {
        "punct_ratio": F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", "")) / n_chars,
        "digit_ratio": F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars,
    }
    cols = [feats[k].cast("double").alias(k) for k in FEATURES if k in feats]
    cols += [v.cast("double").alias(k) for k, v in derived.items()]
    return df.select("*", *cols)


def weak_label_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic weak labels: 1.0 = clearly keep (well-formed prose
    proportions), 0.0 = clearly drop (too short / digit- or
    punctuation-heavy / hyper-repetitive); unlabeled rows are dropped from
    training (the classifier generalizes to them at scoring time)."""
    f = quality_feature_frame(df, text_col)
    good = (
        (F.col("n_tokens") >= 20)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("punct_ratio") <= 0.2)
        & (F.col("digit_ratio") <= 0.2)
        & (F.col("unique_ratio") >= 0.3)
    )
    bad = (
        (F.col("n_tokens") < 5)
        | (F.col("digit_ratio") > 0.4)
        | (F.col("punct_ratio") > 0.4)
        | (F.col("unique_ratio") < 0.1)
    )
    return f.withColumn(
        "label",
        F.when(bad, F.lit(0.0)).when(good, F.lit(1.0)).otherwise(F.lit(None)),
    ).filter(F.col("label").isNotNull())


def quality_pipeline() -> Pipeline:
    assembler = VectorAssembler(inputCols=FEATURES, outputCol="__raw")
    scaler = StandardScaler(inputCol="__raw", outputCol="features", withMean=True)
    lr = LogisticRegression(featuresCol="features", labelCol="label", maxIter=50)
    return Pipeline(stages=[assembler, scaler, lr])


def score_documents(
    model: PipelineModel, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach ``quality_prob`` (P(keep)) to every document — map-only:
    feature expressions + a broadcast linear model, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_feature_frame(df, text_col))
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    keep = [F.col(c) for c in df.columns] + [p1.alias("quality_prob")]
    return scored.select(*keep)
