"""Unified sports-domain catalog: canonical StructTypes for the silver layer.

The reference maintains two divergent schemas (SURVEY.md §1.1: the rich
singular-name DDL in database/schema.sql and the simpler plural-name
SQLAlchemy models in src/database/schema.py:25-237 that the analytics SQL
targets). This catalog unifies them: one StructType per logical table,
plural analytics-style names, the scraper-side extras folded in as nullable
columns / map columns.

Type discipline (SURVEY.md §1.2): money and odds stay DecimalType so merge
and hash-compare semantics are exact (schema.sql:263 NUMERIC(14,2) market
values, :736 NUMERIC(10,4) odds); xg/coords are double (schema.sql:819
NUMERIC(6,3)); JSONB catch-alls are MapType(string,string).

Storage layout at scale: facts (matches, match_events, player_match_stats,
odds_ticks) partitioned by season / event date and bucketed by match_id;
dims broadcast. Enum domains are data, not types: ``ENUM_DOMAINS`` carries
the allowed values (schema.sql:25-67) for validation joins.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


LONG = T.LongType()
STR = T.StringType()
DBL = T.DoubleType()
DATE = T.DateType()
TS = T.TimestampType()
BOOL = T.BooleanType()
MONEY = T.DecimalType(14, 2)
ODDS = T.DecimalType(10, 4)
JSON_MAP = T.MapType(T.StringType(), T.StringType())

#: Enum domains (reference: 20 ENUM types, database/schema.sql:25-67) —
#: lookup data for validation joins, not engine types.
ENUM_DOMAINS: dict[str, tuple[str, ...]] = {
    "sport": ("football", "basketball", "american_football"),
    "team_type": ("club", "national"),
    "match_status": ("scheduled", "live", "finished", "postponed", "cancelled"),
    "price_type": ("open", "close", "live"),
    "odd_type": ("home", "draw", "away", "over", "under"),
    "injury_type": ("muscle", "ligament", "fracture", "illness", "other"),
    "transfer_type": ("permanent", "loan", "free", "end_of_loan"),
    "preferred_foot": ("left", "right", "both"),
}

TEAMS = T.StructType([
    _s("team_id", LONG, False),
    _s("name", STR, False),
    _s("short_name", STR),
    _s("country", STR),
    _s("sport", STR),
    _s("team_type", STR),
    _s("founded_year", T.IntegerType()),
    _s("venue_id", LONG),
    _s("external_ids", JSON_MAP),
])

PLAYERS = T.StructType([
    _s("player_id", LONG, False),
    _s("first_name", STR),
    _s("last_name", STR),
    _s("full_name", STR),
    _s("birth_date", DATE),
    _s("nationality", STR),
    _s("position", STR),          # canonical GK/DF/MF/FW (term-mapped)
    _s("preferred_foot", STR),
    _s("height_cm", T.IntegerType()),
    _s("market_value", MONEY),
    _s("current_team_id", LONG),
    _s("external_ids", JSON_MAP),
])

MATCHES = T.StructType([
    _s("match_id", LONG, False),
    _s("competition_id", LONG),
    _s("season", STR),
    _s("matchday", T.IntegerType()),
    _s("match_date", TS),
    _s("home_team_id", LONG, False),
    _s("away_team_id", LONG, False),
    _s("venue_id", LONG),
    _s("referee_id", LONG),
    _s("status", STR),            # match_status enum domain
    _s("home_score", T.IntegerType()),
    _s("away_score", T.IntegerType()),
    _s("scraped_at", TS),         # audit column driving latest-wins merges
])

SEASON_PLAYER_STATS = T.StructType([
    _s("player_id", LONG, False),
    _s("team_id", LONG, False),
    _s("season", STR, False),
    _s("matches_played", T.IntegerType()),
    _s("goals", T.IntegerType()),
    _s("assists", T.IntegerType()),
    _s("minutes_played", T.IntegerType()),
    _s("yellow_cards", T.IntegerType()),
    _s("red_cards", T.IntegerType()),
    _s("xg", DBL),
    _s("scraped_at", TS),
])

PLAYER_MATCH_STATS = T.StructType([
    _s("match_id", LONG, False),
    _s("player_id", LONG, False),
    _s("team_id", LONG),
    _s("provider", STR),
    _s("minutes", T.IntegerType()),
    _s("goals", T.IntegerType()),
    _s("assists", T.IntegerType()),
    _s("shots", T.IntegerType()),
    _s("xg", DBL),
    _s("passes_completed", T.IntegerType()),
    _s("metrics_extra", JSON_MAP),  # JSONB catch-all (fbref_match_scraper.py:718-795)
    _s("scraped_at", TS),
])

MATCH_EVENTS = T.StructType([
    _s("match_id", LONG, False),
    _s("event_idx", T.IntegerType(), False),
    _s("minute", T.IntegerType()),
    _s("second", T.IntegerType()),
    _s("event_type", STR),
    _s("player_id", LONG),
    _s("team_id", LONG),
    _s("x", DBL),
    _s("y", DBL),
    _s("detail", JSON_MAP),
])

ODDS_TICKS = T.StructType([
    _s("match_id", LONG, False),
    _s("bookmaker", STR, False),
    _s("market", STR, False),
    _s("outcome", STR, False),
    _s("price_type", STR),
    _s("price", ODDS, False),
    _s("ts", TS, False),
])

MARKET_VALUES = T.StructType([
    _s("player_id", LONG, False),
    _s("valuation_date", DATE, False),
    _s("market_value", MONEY, False),
    _s("source", STR),
])

STANDINGS = T.StructType([
    _s("competition_id", LONG, False),
    _s("season", STR, False),
    _s("matchday", T.IntegerType()),
    _s("team_id", LONG, False),
    _s("position", T.IntegerType()),
    _s("played", T.IntegerType()),
    _s("won", T.IntegerType()),
    _s("drawn", T.IntegerType()),
    _s("lost", T.IntegerType()),
    _s("goals_for", T.IntegerType()),
    _s("goals_against", T.IntegerType()),
    _s("points", T.IntegerType()),
])

INJURIES = T.StructType([
    _s("player_id", LONG, False),
    _s("injury_type", STR),
    _s("description", STR),
    _s("start_date", DATE),
    _s("expected_return", DATE),
    _s("source", STR),
])

TRANSFERS = T.StructType([
    _s("transfer_id", LONG, False),
    _s("player_id", LONG, False),
    _s("from_team_id", LONG),
    _s("to_team_id", LONG),
    _s("transfer_date", DATE),
    _s("fee", MONEY),
    _s("transfer_type", STR),
])

NAME_HISTORY = T.StructType([  # SCD2 dims: club/venue name history
    _s("entity_id", LONG, False),
    _s("name", STR, False),
    _s("valid_from", TS, False),
    _s("valid_to", TS),
    _s("is_current", BOOL),
])

EXTERNAL_ID_MAP = T.StructType([  # (source, external_id) → internal id (J7)
    _s("entity_type", STR, False),
    _s("source", STR, False),
    _s("external_id", STR, False),
    _s("internal_id", LONG, False),
    _s("created_at", TS),
])

SCRAPED_DATA = T.StructType([  # bronze landing zone (S14)
    _s("scraper_name", STR, False),
    _s("data", STR, False),       # raw JSON payload
    _s("ingested_at", TS, False),
])

#: name → schema for the whole silver catalog.
SILVER_TABLES: dict[str, T.StructType] = {
    "teams": TEAMS,
    "players": PLAYERS,
    "matches": MATCHES,
    "season_player_stats": SEASON_PLAYER_STATS,
    "player_match_stats": PLAYER_MATCH_STATS,
    "match_events": MATCH_EVENTS,
    "odds_ticks": ODDS_TICKS,
    "market_values": MARKET_VALUES,
    "standings": STANDINGS,
    "injuries": INJURIES,
    "transfers": TRANSFERS,
    "name_history": NAME_HISTORY,
    "external_id_map": EXTERNAL_ID_MAP,
    "scraped_data": SCRAPED_DATA,
}

#: Business keys for latest-wins merges (the ON CONFLICT targets, S10–S13).
MERGE_KEYS: dict[str, tuple[str, ...]] = {
    "teams": ("team_id",),
    "players": ("player_id",),
    "matches": ("match_id",),
    "season_player_stats": ("player_id", "team_id", "season"),
    "player_match_stats": ("match_id", "player_id", "provider"),
    "odds_ticks": ("match_id", "bookmaker", "market", "outcome", "price_type", "ts"),
    "market_values": ("player_id", "valuation_date"),
    "standings": ("competition_id", "season", "matchday", "team_id"),
    "external_id_map": ("entity_type", "source", "external_id"),
}
