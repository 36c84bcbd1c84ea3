"""spark.ml pipelines (X5): train, predict, persist round-trip."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from sport_data_pipeline_spark.ml.models import (
    load_model,
    match_outcome_frame,
    match_outcome_pipeline,
    player_feature_frame,
    player_value_pipeline,
    train_and_save,
)


@pytest.fixture()
def tables(spark):
    import random

    rng = random.Random(42)
    players = spark.createDataFrame(
        [
            (i, f"P{i}", f"S{i}", dt.date(1990 + i % 15, 1, 1),
             ["GK", "DF", "MF", "FW"][i % 4],
             Decimal(str(1_000_000 + i * 137_000) + ".00"))
            for i in range(40)
        ],
        "player_id long, first_name string, last_name string, birth_date date, "
        "position string, market_value decimal(14,2)",
    )
    teams = spark.createDataFrame([(t, f"T{t}") for t in range(8)], "team_id long, name string")
    sps = spark.createDataFrame(
        [
            (i, i % 8, "2024", 10 + i % 20, rng.randint(0, 20), rng.randint(0, 10))
            for i in range(40)
        ],
        "player_id long, team_id long, season string, matches_played int, goals int, assists int",
    )
    matches = spark.createDataFrame(
        [
            (m, m % 8, (m + 3) % 8, rng.randint(0, 4), rng.randint(0, 4),
             dt.datetime(2024, 1, 1) + dt.timedelta(days=m), "finished")
            for m in range(60)
            if m % 8 != (m + 3) % 8
        ],
        "match_id long, home_team_id long, away_team_id long, home_score int, "
        "away_score int, match_date timestamp, status string",
    )
    return {"players": players, "teams": teams, "season_player_stats": sps, "matches": matches}


def test_player_value_model_trains_and_persists(spark, tables, tmp_path):
    df = player_feature_frame(tables, dt.date(2025, 1, 1))
    assert df.count() > 10
    model = train_and_save(player_value_pipeline(), df, str(tmp_path / "pvm"))
    preds = model.transform(df)
    assert preds.filter(preds.prediction.isNotNull()).count() == df.count()
    reloaded = load_model(str(tmp_path / "pvm"))
    p1 = {r["player_id"]: r["prediction"] for r in preds.collect()}
    p2 = {r["player_id"]: r["prediction"] for r in reloaded.transform(df).collect()}
    assert p1 == p2


def test_match_outcome_model(spark, tables):
    df = match_outcome_frame(tables, dt.date(2025, 1, 1))
    n = df.count()
    assert n > 20
    model = match_outcome_pipeline().fit(df)
    preds = model.transform(df)
    assert preds.select("prediction").distinct().count() <= 3
    assert preds.count() == n


def test_quality_classifier_separates_planted_docs(spark, tmp_path):
    """Train on weak labels over the corpus + planted extremes; the scored
    probabilities must rank clean prose above junk, and the model must
    round-trip through save/load (S16)."""
    from sport_data_pipeline_spark.catalog import load_table
    from sport_data_pipeline_spark.ml.quality import (
        quality_pipeline,
        score_documents,
        weak_label_frame,
    )

    from pyspark.sql import functions as F

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clean = (
        "the match was a fine display of passing and movement with the home side "
        "taking the lead before half time and the visitors equalising late on "
        "after sustained pressure from both teams in a balanced game"
    )
    junk = "3141592653 5897932384 6264338327 9502884197 1693993751 0582097494"
    planted = spark.createDataFrame(
        [(900001, clean), (900002, junk), (900003, "ok"), (900004, junk + " 99 77")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)

    train = weak_label_frame(corpus)
    # the weak rules must label both planted extremes (sanity of the rules)
    got_labels = {r["doc_id"]: r["label"] for r in train.filter(F.col("doc_id") > 900000).collect()}
    assert got_labels[900001] == 1.0 and got_labels[900002] == 0.0

    model = quality_pipeline().fit(train)
    path = str(tmp_path / "quality_model")
    model.save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_documents(reloaded, planted).collect()
    }
    assert scored[900001] > 0.5 > scored[900002]
    assert scored[900004] < scored[900001]
    # scoring is map-only: no exchange in the plan
    plan = score_documents(reloaded, planted)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
