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


@pytest.fixture(scope="module")
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
