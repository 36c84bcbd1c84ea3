"""Bronze → silver ingestion path: landing, refinement, term mapping,
external-id resolution, idempotent merge (SURVEY.md §3.2 steps 4-6)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from sport_data_pipeline_spark.schemas import PLAYERS, SILVER_TABLES
from sport_data_pipeline_spark.sources.bronze import (
    DEFAULT_TERM_MAP,
    apply_term_mapping,
    ingest_to_silver,
    land_records,
    refine,
    resolve_external_ids,
    term_map_df,
)

T0 = dt.datetime(2024, 8, 1, 12, 0)


def player_json(pid, name, position=None):
    return json.dumps(
        {"player_id": pid, "full_name": name, "position": position}
    )


def test_refine_parses_and_validates(spark):
    bronze = land_records(
        spark,
        [
            ("squad_scraper", player_json(1, "Leo Star", "Striker")),
            ("squad_scraper", json.dumps({"full_name": "No Id"})),  # fails required
            ("squad_scraper", "not json at all"),                    # malformed → nulls
            ("other_scraper", player_json(9, "Other Source")),
        ],
        T0,
    )
    refined = refine(bronze, PLAYERS, scraper_name="squad_scraper", required=["player_id"])
    rows = refined.collect()
    assert [r["player_id"] for r in rows] == [1]
    assert rows[0]["full_name"] == "Leo Star"


def test_term_mapping_broadcast_join(spark):
    df = spark.createDataFrame(
        [(1, "Torwart"), (2, "centre back"), (3, "Striker"), (4, "???")],
        "id long, position string",
    )
    mapping = term_map_df(spark, DEFAULT_TERM_MAP["position"], "position")
    out = {r["id"]: r["position"] for r in apply_term_mapping(df, "position", mapping).collect()}
    assert out == {1: "GK", 2: "DF", 3: "FW", 4: "???"}


def test_external_id_resolution_deterministic(spark):
    id_map = spark.createDataFrame(
        [("player", "tm", "111", 1, T0)], SILVER_TABLES["external_id_map"]
    )
    incoming = spark.createDataFrame(
        [("tm", "111"), ("tm", "222"), ("fbref", "abc")],
        "source string, external_id string",
    )
    resolved, new_maps = resolve_external_ids(incoming, id_map, "player")
    got = {(r["source"], r["external_id"]): r["internal_id"] for r in resolved.collect()}
    assert got[("tm", "111")] == 1  # existing mapping reused
    assert got[("tm", "222")] > 0 and got[("fbref", "abc")] > 0
    # determinism: resolving again yields identical generated ids
    resolved2, _ = resolve_external_ids(incoming, id_map, "player")
    got2 = {(r["source"], r["external_id"]): r["internal_id"] for r in resolved2.collect()}
    assert got == got2
    assert new_maps.count() == 2


def test_ingest_to_silver_idempotent_upsert(spark):
    b1 = land_records(spark, [("s", player_json(1, "Old Name"))], T0)
    silver1 = ingest_to_silver(b1, None, PLAYERS, ["player_id"], required=["player_id"])
    b2 = land_records(
        spark, [("s", player_json(1, "New Name")), ("s", player_json(2, "Second"))],
        T0 + dt.timedelta(hours=1),
    )
    silver2 = ingest_to_silver(b2, silver1, PLAYERS, ["player_id"], required=["player_id"])
    got = {r["player_id"]: r["full_name"] for r in silver2.collect()}
    assert got == {1: "New Name", 2: "Second"}
    # replay the same batch → unchanged (idempotent)
    silver3 = ingest_to_silver(b2, silver2, PLAYERS, ["player_id"], required=["player_id"])
    got3 = {r["player_id"]: r["full_name"] for r in silver3.collect()}
    assert got3 == got
