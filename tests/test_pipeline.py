"""End-to-end pipeline: bronze batches → silver merges → daily analytics
report. Exercises the reference's full §3.3 lifecycle including idempotent
re-ingestion."""

from __future__ import annotations

import datetime as dt
import json

from sport_data_pipeline_spark.pipeline import SilverStore, ingest_bronze_batch, run_daily_analytics
from sport_data_pipeline_spark.sources.bronze import land_records

T0 = dt.datetime(2024, 8, 1, 12, 0)


def bronze_rows(spark, at):
    players = [
        {"player_id": 1, "first_name": "Leo", "last_name": "Star", "position": "Striker"},
        {"player_id": 2, "first_name": "Max", "last_name": "Wall", "position": "centre back"},
    ]
    matches = [
        {"match_id": 100, "home_team_id": 10, "away_team_id": 20, "home_score": 2,
         "away_score": 0, "status": "finished", "match_date": "2024-07-30T15:00:00"},
    ]
    recs = [("squad_scraper", json.dumps(p)) for p in players]
    recs += [("match_scraper", json.dumps(m)) for m in matches]
    return land_records(spark, recs, at)


def test_full_pipeline(spark, tmp_path):
    store = SilverStore(spark, str(tmp_path / "silver"))

    silver = ingest_bronze_batch(store, bronze_rows(spark, T0))
    players = {r["player_id"]: r for r in silver["players"].collect()}
    assert players[1]["position"] == "FW"  # term-mapped
    assert players[2]["position"] == "DF"
    assert silver["matches"].count() == 1

    # re-ingest the same batch: silver state unchanged (idempotent)
    silver2 = ingest_bronze_batch(store, bronze_rows(spark, T0))
    assert silver2["players"].count() == 2
    assert silver2["matches"].count() == 1

    out = run_daily_analytics(store, as_of_date=dt.date(2025, 1, 1))
    assert "<html>" in out["html"]
    standings = {r["team_id"]: r for r in out["sections"]["standings"].collect()}
    assert standings[10]["points"] == 3 and standings[20]["points"] == 0


def test_e2e_pipeline_part_order_insensitive(spark):
    """The e2e pipeline writes snapshots with the scan's natural
    partitioning (r16): one part locally, many parts at scale. Its result
    must be identical whichever layout lands — every consumer of the
    bronze read is keyed (latest-wins merge, equi-join routing, final
    orderBy), so part count/order cannot reach the output. Forced here by
    re-running with every snapshot write repartitioned 8 ways."""
    from conftest import SF_DIR
    from sport_data_pipeline_spark.plans import corpusops
    from sport_data_pipeline_spark.sources import sinks

    natural = corpusops.e2e_daily_pipeline(spark, SF_DIR).collect()
    orig = sinks.write_snapshot

    def multi_part(df, *args, **kwargs):
        return orig(df.repartition(8), *args, **kwargs)

    sinks.write_snapshot = multi_part
    try:
        multi = corpusops.e2e_daily_pipeline(spark, SF_DIR).collect()
    finally:
        sinks.write_snapshot = orig
    assert natural == multi and len(natural) > 0
