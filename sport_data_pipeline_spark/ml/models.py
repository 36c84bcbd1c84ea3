"""spark.ml pipelines for the reference's two model surfaces (X5):

- PlayerPerformanceModel (src/analytics/engine.py:29-96): engineered
  features (age, goals/assists per match, label-encoded position) →
  scaler → GBT regressor predicting market value / performance score.
- Match-outcome classifier (engine.py:99-135, 356-422 — the reference
  *declares* this and returns a placeholder, engine.py:391-397; here the
  real path): team form + H2H features → RandomForest 3-class
  (home/draw/away).

Feature engineering stays DataFrame-native (the engine's form/H2H
builders); only the estimator is spark.ml. Models persist via
``Pipeline.save`` (reference: joblib dump, engine.py:424-439 → S16).
"""

from __future__ import annotations

import datetime as dt

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame, functions as F

from ..engine import SportsAnalyticsEngine
from ..plans._util import safe_div


def player_feature_frame(
    tables: dict[str, DataFrame], as_of_date: dt.date | None = None
) -> DataFrame:
    """Engineered player features (engine.py:38-56): age, per-match rates,
    position; label = market value. min_matches mirrors
    ``min_matches_for_prediction`` (config.py:85)."""
    eng = SportsAnalyticsEngine(tables, as_of_date)
    base = eng._player_season_base()
    return (
        base.filter(F.col("matches_played") >= 10)
        .select(
            "player_id",
            eng._age(F.col("birth_date")).cast("double").alias("age"),
            safe_div(F.col("goals").cast("double"), F.col("matches_played")).alias(
                "goals_per_match"
            ),
            safe_div(F.col("assists").cast("double"), F.col("matches_played")).alias(
                "assists_per_match"
            ),
            F.col("matches_played").cast("double").alias("matches_played"),
            F.coalesce(F.col("position"), F.lit("UNK")).alias("position"),
            F.col("market_value").cast("double").alias("label"),
        )
        .filter(F.col("label").isNotNull())
    )


def player_value_pipeline() -> Pipeline:
    """StringIndexer(position) + assembler + scaler + GBTRegressor — the
    spark.ml twin of LabelEncoder + StandardScaler + GradientBoostingRegressor
    (engine.py:58-96)."""
    indexer = StringIndexer(
        inputCol="position", outputCol="position_idx", handleInvalid="keep"
    )
    assembler = VectorAssembler(
        inputCols=["age", "goals_per_match", "assists_per_match", "matches_played", "position_idx"],
        outputCol="features_raw",
    )
    scaler = StandardScaler(inputCol="features_raw", outputCol="features")
    gbt = GBTRegressor(featuresCol="features", labelCol="label", maxIter=20, seed=42)
    return Pipeline(stages=[indexer, assembler, scaler, gbt])


def match_outcome_frame(
    tables: dict[str, DataFrame], as_of_date: dt.date | None = None
) -> DataFrame:
    """Match-outcome training frame: per-match home/away form + H2H share
    (the J4 role-playing double join + J5 features, engine.py:99-135)."""
    eng = SportsAnalyticsEngine(tables, as_of_date)
    m = tables["matches"].filter(F.col("status") == "finished")
    form = eng.team_form()
    h2h = eng.head_to_head()

    hf = form.select(
        F.col("team_id").alias("home_team_id"),
        F.col("form_points").alias("home_form"),
        F.col("avg_goals_for").alias("home_avg_gf"),
        F.col("avg_goals_against").alias("home_avg_ga"),
    )
    af = form.select(
        F.col("team_id").alias("away_team_id"),
        F.col("form_points").alias("away_form"),
        F.col("avg_goals_for").alias("away_avg_gf"),
        F.col("avg_goals_against").alias("away_avg_ga"),
    )
    label = (
        F.when(F.col("home_score") > F.col("away_score"), 0.0)
        .when(F.col("home_score") == F.col("away_score"), 1.0)
        .otherwise(2.0)
    )
    pair_a = F.least("home_team_id", "away_team_id")
    with_pair = m.withColumn("team_a", pair_a).withColumn(
        "team_b", F.greatest("home_team_id", "away_team_id")
    )
    return (
        with_pair.join(F.broadcast(hf), "home_team_id", "left")
        .join(F.broadcast(af), "away_team_id", "left")
        .join(F.broadcast(h2h.select("team_a", "team_b", "a_win_share")), ["team_a", "team_b"], "left")
        .select(
            "match_id",
            F.coalesce("home_form", F.lit(0)).cast("double").alias("home_form"),
            F.coalesce("away_form", F.lit(0)).cast("double").alias("away_form"),
            F.coalesce("home_avg_gf", F.lit(0.0)).alias("home_avg_gf"),
            F.coalesce("home_avg_ga", F.lit(0.0)).alias("home_avg_ga"),
            F.coalesce("away_avg_gf", F.lit(0.0)).alias("away_avg_gf"),
            F.coalesce("away_avg_ga", F.lit(0.0)).alias("away_avg_ga"),
            F.coalesce("a_win_share", F.lit(0.5)).alias("h2h_a_share"),
            label.alias("label"),
        )
    )


def match_outcome_pipeline() -> Pipeline:
    assembler = VectorAssembler(
        inputCols=[
            "home_form", "away_form", "home_avg_gf", "home_avg_ga",
            "away_avg_gf", "away_avg_ga", "h2h_a_share",
        ],
        outputCol="features",
    )
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="label", numTrees=50, seed=42
    )
    return Pipeline(stages=[assembler, rf])


def train_and_save(pipeline: Pipeline, df: DataFrame, path: str) -> PipelineModel:
    """Fit + persist (S16: model store — Pipeline.save replaces joblib)."""
    model = pipeline.fit(df)
    model.write().overwrite().save(path)
    return model


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)
