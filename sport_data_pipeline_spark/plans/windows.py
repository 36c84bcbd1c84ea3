"""Window-function query pack (SURVEY.md §2.5, §2.3 J5/J10/J11, §2.9 T6).

These are the Spark rewrites of the reference's pandas/Python loops — each
one shuffle + one linear window pass instead of O(entities × rows) driver
loops (src/analytics/engine.py:137-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..operators.joins import asof_join, symmetric_pair_key
from ..operators.merge import merge_latest
from ..operators.sessionize import sessionize
from ..operators.windows import (
    first_last_value,
    global_percent_rank,
    global_quantiles,
    last_n_per_key,
    rank_standings,
    time_bucket_agg,
)
from ._util import dsum
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# W1/A8: last-N form per entity (reference: engine.py:137-191 Python loop
# over team ids + iterrows → one window job).
# ---------------------------------------------------------------------------

LAST_N_FORM_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS recent_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS recent_value,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS recent_purchases
FROM ranked
WHERE rn <= 5
GROUP BY 1
"""


@query("last_n_form", survey="W1,A8,O4", oracle=LAST_N_FORM_ORACLE, headline=True)
def last_n_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    recent = last_n_per_key(e, ["user_id"], ["ts", "event_id"], 5)
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("recent_events"),
        dsum("value").alias("recent_value"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "recent_purchases"
        ),
    )


# ---------------------------------------------------------------------------
# J5/A9/J4: head-to-head via symmetric pair key — the O(n²) fixture loop
# (engine.py:193-229) rewritten as a groupable equi-key, plus role-playing
# dimension joins (nation joined twice under different aliases).
# ---------------------------------------------------------------------------

H2H_ORACLE = """
SELECT LEAST(cn.n_name, sn.n_name) AS pair_a,
       GREATEST(cn.n_name, sn.n_name) AS pair_b,
       CAST(COUNT(*) AS BIGINT) AS meetings,
       CAST(SUM(CASE WHEN cn.n_name <= sn.n_name THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
       CAST(SUM(CASE WHEN cn.n_name <= sn.n_name THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS a_win_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""


@query("h2h_symmetric", survey="J5,A9,J4", oracle=H2H_ORACLE, headline=True)
def h2h_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cn_name"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name"))

    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
    )
    a_won = F.when(F.col("cn_name") <= F.col("sn_name"), 1).otherwise(0)
    return (
        joined.groupBy(*symmetric_pair_key("cn_name", "sn_name"))
        .agg(
            F.count(F.lit(1)).alias("meetings"),
            F.sum(a_won).alias("a_wins"),
            (F.sum(a_won).cast("double") / F.count(F.lit(1))).alias("a_win_share"),
        )
    )


# ---------------------------------------------------------------------------
# W2: percentile rank vs peer group (reference contract:
# src/analytics/reports.py:80-85 — percentile_rank / peer_avg / above_average).
# ---------------------------------------------------------------------------

PERCENTILE_PEER_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS balance_pct_rank,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY c_mktsegment) AS peer_avg_balance
  FROM customer
)
SELECT c_custkey AS player_id,
       c_mktsegment AS peer_group,
       c_acctbal AS balance,
       balance_pct_rank,
       peer_avg_balance,
       c_acctbal > peer_avg_balance AS above_average
FROM base
"""


@query("percentile_peer", survey="W2", oracle=PERCENTILE_PEER_ORACLE)
def percentile_peer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percentile rank + peer-group average, with NO unpartitioned
    window over the data: the rank is computed distributively by
    ``global_percent_rank`` (range-partition + broadcast offsets — every
    partition bounded at ~n/P), and the peer average is a grouped
    aggregate broadcast-joined back (segments are low-cardinality) instead
    of a full-table partitioned window pass. Bit-identical to
    ``percent_rank() OVER (ORDER BY ...)``: the order includes the unique
    key, so rank == row position and pct = (rank−1)/(n−1) exactly."""
    c = _t(spark, sf_dir, "customer")
    ranked = global_percent_rank(
        c.select("c_custkey", "c_mktsegment", "c_acctbal"),
        ["c_acctbal", "c_custkey"],
        out_col="balance_pct_rank",
    )
    peers = c.groupBy("c_mktsegment").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("peer_avg_balance")
    )
    return ranked.join(F.broadcast(peers), "c_mktsegment").select(
        F.col("c_custkey").alias("player_id"),
        F.col("c_mktsegment").alias("peer_group"),
        F.col("c_acctbal").alias("balance"),
        "balance_pct_rank",
        "peer_avg_balance",
        (F.col("c_acctbal") > F.col("peer_avg_balance")).alias("above_average"),
    )


# ---------------------------------------------------------------------------
# W3: per-entity trend across seasons via lag (reference contract:
# reports.py:71-77 goals_trend / improving / declining).
# ---------------------------------------------------------------------------

SEASON_TREND_ORACLE = """
WITH per_season AS (
  SELECT o_custkey AS player_id,
         CAST(YEAR(o_orderdate) AS INTEGER) AS season,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS season_value,
         CAST(COUNT(*) AS BIGINT) AS season_orders
  FROM orders GROUP BY 1, 2
)
SELECT player_id, season, season_value, season_orders,
       season_value - LAG(season_value) OVER (PARTITION BY player_id ORDER BY season) AS value_delta,
       CASE WHEN LAG(season_value) OVER (PARTITION BY player_id ORDER BY season) IS NULL THEN 'new'
            WHEN season_value > LAG(season_value) OVER (PARTITION BY player_id ORDER BY season) THEN 'improving'
            WHEN season_value < LAG(season_value) OVER (PARTITION BY player_id ORDER BY season) THEN 'declining'
            ELSE 'flat' END AS trend
FROM per_season
"""


@query("season_trend", survey="W3", oracle=SEASON_TREND_ORACLE)
def season_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_season = o.groupBy(
        F.col("o_custkey").alias("player_id"),
        F.year("o_orderdate").cast("int").alias("season"),
    ).agg(
        dsum("o_totalprice").alias("season_value"),
        F.count(F.lit(1)).alias("season_orders"),
    )
    w = Window.partitionBy("player_id").orderBy("season")
    prev = F.lag("season_value").over(w)
    return per_season.select(
        "player_id",
        "season",
        "season_value",
        "season_orders",
        (F.col("season_value") - prev).alias("value_delta"),
        F.when(prev.isNull(), "new")
        .when(F.col("season_value") > prev, "improving")
        .when(F.col("season_value") < prev, "declining")
        .otherwise("flat")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# W4/W7: latest record per key — merge_latest is the engine's upsert
# primitive (ON CONFLICT DO UPDATE latest-wins, services/bundesliga.py:151-178).
# ---------------------------------------------------------------------------

LATEST_PER_KEY_ORACLE = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_id AS latest_event_id,
       ts AS latest_ts,
       event_type AS latest_type,
       value AS latest_value
FROM ranked WHERE rn = 1
"""


@query("latest_per_key", survey="W4,W7,U3,S10,S11", oracle=LATEST_PER_KEY_ORACLE, headline=True)
def latest_per_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    latest = merge_latest(e, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("ts").alias("latest_ts"),
        F.col("event_type").alias("latest_type"),
        F.col("value").alias("latest_value"),
    )


# ---------------------------------------------------------------------------
# S13/U4: per-column COALESCE merge — the reference's partial-update sinks
# (COALESCE(%s, venue_id): only overwrite with non-null). The update batch
# is built deterministically from documents: every third doc gets a sparse
# update row that overwrites source, leaves lang untouched (NULL), and
# bumps n_chars only for every sixth doc — so the oracle only matches if
# each column independently takes its latest NON-NULL value.
# ---------------------------------------------------------------------------

COALESCE_MERGE_ORACLE = """
WITH e AS (SELECT doc_id, lang, source, n_chars, 0 AS ver FROM documents),
u AS (
  SELECT doc_id,
         CAST(NULL AS VARCHAR) AS lang,
         'recrawl' AS source,
         CASE WHEN doc_id % 6 = 0 THEN n_chars + 1 ELSE NULL END AS n_chars,
         1 AS ver
  FROM documents WHERE doc_id % 3 = 0
),
all_rows AS (SELECT * FROM e UNION ALL SELECT * FROM u),
merged AS (
  SELECT DISTINCT doc_id,
         last_value(lang IGNORE NULLS) OVER w AS lang,
         last_value(source IGNORE NULLS) OVER w AS source,
         last_value(n_chars IGNORE NULLS) OVER w AS n_chars,
         last_value(ver IGNORE NULLS) OVER w AS ver
  FROM all_rows
  WINDOW w AS (PARTITION BY doc_id ORDER BY ver
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT doc_id,
       lang,
       source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(ver AS INTEGER) AS ver
FROM merged ORDER BY doc_id
"""


@query("coalesce_merge_updates", survey="S13,U3", oracle=COALESCE_MERGE_ORACLE)
def coalesce_merge_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_coalesce over a deterministic sparse-update batch: per key
    and PER COLUMN the latest non-null value wins (the reference's
    partial-update ON CONFLICT sinks, where an update row only carries
    the fields the scraper actually saw). One key exchange for the
    window, value columns folded with last(ignorenulls) — same
    one-shuffle shape as merge_latest at any scale. The fixture updates
    every third doc (source overwritten, lang deliberately NULL = keep,
    n_chars bumped only for every sixth doc), so a merge that treats
    NULL as a value, or that takes whole-row latest instead of
    per-column latest, hash-mismatches."""
    from ..operators.merge import merge_coalesce

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    existing = d.withColumn("ver", F.lit(0))
    updates = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(
            "doc_id",
            F.lit(None).cast("string").alias("lang"),
            F.lit("recrawl").alias("source"),
            F.when(F.col("doc_id") % 6 == 0, F.col("n_chars") + 1).alias("n_chars"),
            F.lit(1).alias("ver"),
        )
    )
    return merge_coalesce(existing, updates, ["doc_id"], ["ver"]).orderBy("doc_id")


# ---------------------------------------------------------------------------
# W5/J11: open vs close value per key over a tick stream (odds open/close,
# database/schema.sql:729-745).
# ---------------------------------------------------------------------------

OPEN_CLOSE_ORACLE = """
WITH w AS (
  SELECT user_id, event_type,
         first_value(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open_value,
         last_value(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type, open_value, close_value FROM w WHERE rn = 1
"""


@query("open_close", survey="W5,J11", oracle=OPEN_CLOSE_ORACLE)
def open_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return first_last_value(
        e, ["user_id", "event_type"], ["ts", "event_id"], "value",
        open_name="open_value", close_name="close_value",
    )


# ---------------------------------------------------------------------------
# W6/A13/A12: standings computation + position assignment
# (database/schema.sql:491-507; league analytics contract §2.11).
# ---------------------------------------------------------------------------

STANDINGS_ORACLE = """
WITH points AS (
  SELECT n.n_name AS team_name,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS draws,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 3
                       WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS points,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS value_for
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT team_name, wins, draws, losses, points, value_for,
       CAST(row_number() OVER (ORDER BY points DESC, value_for DESC, team_name) AS INTEGER) AS position
FROM points
"""


@query("standings", survey="W6,A12,A13", oracle=STANDINGS_ORACLE)
def standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("team_name"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("wins"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("draws"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("losses"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 3)
                .when(F.col("o_orderstatus") == "O", 1)
                .otherwise(0)
            ).alias("points"),
            dsum("o_totalprice").alias("value_for"),
        )
    )
    return rank_standings(
        pts, [F.desc("points"), F.desc("value_for"), F.asc("team_name")]
    )


STANDINGS_BY_SEASON_ORACLE = """
WITH points AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS season,
         n.n_name AS team_name,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS draws,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 3
                       WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS points,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS value_for
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT season, team_name, wins, draws, losses, points, value_for,
       CAST(row_number() OVER (
         PARTITION BY season
         ORDER BY points DESC, value_for DESC, team_name) AS INTEGER) AS position
FROM points
"""


@query("standings_by_season", survey="W6,A13", oracle=STANDINGS_BY_SEASON_ORACLE)
def standings_by_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-season standings table — W6/A13 on the SCALE path: one
    window PARTITIONED by season (``rank_standings(partition_cols=...)``,
    r15), bounded by teams-per-season regardless of how many seasons the
    table holds, where the single-table ``standings`` query's global
    ordering would funnel every row through one sort partition. Same
    points/tiebreak contract (reference database/schema.sql:491-507),
    seasons derived from the order year so every season ranks
    independently under the oracle hash."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.year("o_orderdate").alias("season"),
            n.n_name.alias("team_name"),
        )
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("wins"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("draws"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("losses"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 3)
                .when(F.col("o_orderstatus") == "O", 1)
                .otherwise(0)
            ).alias("points"),
            dsum("o_totalprice").alias("value_for"),
        )
    )
    return rank_standings(
        pts,
        [F.desc("points"), F.desc("value_for"), F.asc("team_name")],
        partition_cols=["season"],
    )


# ---------------------------------------------------------------------------
# T6 (stateful grouping, batch twin of streaming session windows).
# ---------------------------------------------------------------------------

SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, value, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM s GROUP BY 1, 2
"""


@query("sessionize_events", survey="T6,W1", oracle=SESSIONIZE_ORACLE, headline=True)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    s = sessionize(e, ["user_id"], "ts", gap_seconds=1800, tie_break=["event_id"])
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("session_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# J10-adjacent: as-of join — for each purchase, the latest prior click of
# the same user (point-in-time feature join; odds-at-kickoff shape).
# ---------------------------------------------------------------------------

ASOF_ORACLE = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
         c.ts AS click_ts, c.value AS click_value,
         row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, purchase_ts, purchase_value,
       click_ts AS asof_ts, click_value AS asof_value
FROM j WHERE rn = 1
"""


@query("asof_clicks", survey="J10,J11,W5", oracle=ASOF_ORACLE, headline=True)
def asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union+window as-of join: one shuffle on user_id, no theta-join blowup
    (the oracle's LEFT JOIN .. ts<=ts is quadratic per key; this is linear).
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["ts", "value", "event_id"],
        right_tiebreak=["event_id"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        F.col("asof_ts"),
        F.col("asof_value"),
    )


ASOF_NEAREST_ORACLE = """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts,
                  value AS purchase_value
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value, event_id FROM events
      WHERE event_type = 'click'),
cand AS (
  SELECT p.purchase_id, c.ts AS click_ts, c.value AS click_value,
         c.event_id AS click_id,
         abs(epoch_us(p.ts) - epoch_us(c.ts)) AS dist,
         CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END AS is_fwd
  FROM p JOIN c ON c.user_id = p.user_id
  WHERE abs(epoch_us(p.ts) - epoch_us(c.ts)) <= CAST(3600 AS BIGINT) * 1000000
),
pick AS (
  SELECT purchase_id, click_ts, click_value, click_id,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY dist ASC, is_fwd ASC, click_id DESC)
           AS rn
  FROM cand
)
SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts, p.purchase_value,
       k.click_ts AS near_ts, k.click_value AS near_value,
       k.click_id AS near_click
FROM p LEFT JOIN pick k ON k.purchase_id = p.purchase_id AND k.rn = 1
"""


@query("asof_nearest_clicks", survey="J10,J11,W5", oracle=ASOF_NEAREST_ORACLE, headline=True)
def asof_nearest_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``merge_asof``-parity as-of join: NEAREST direction with a 1-hour
    tolerance (new in r7 — backward/forward/nearest + tolerance cover the
    full pandas/kdb as-of surface). Each purchase attaches the closest
    click within ±1 h, equal distance preferring the prior click, equal
    timestamps the greatest click id. Still one hash exchange on user_id
    (two Sort+Window passes, plan-asserted); the oracle's quadratic
    per-key LEFT JOIN is the exact twin, with integer-microsecond
    distances on both engines so tie decisions are bit-portable.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["ts", "value", "event_id"],
        right_tiebreak=["event_id"],
        direction="nearest",
        tolerance=3600,
        prefix="near_",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        F.col("near_ts"),
        F.col("near_value"),
        F.col("near_event_id").alias("near_click"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style time-bucket rollups (TimescaleDB continuous-aggregate
# pattern): epoch-aligned tumbling buckets, and a coarser granularity that
# re-aggregates the finer rollup instead of rescanning raw events. Decimal
# partial sums keep the cascade exact and order-insensitive.
# ---------------------------------------------------------------------------

TIME_BUCKET_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("time_bucket_rollup", survey="hypertable-rollup,A5", oracle=TIME_BUCKET_ORACLE)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup per type: count, distinct users, exact value sum."""
    e = _t(spark, sf_dir, "events")
    return time_bucket_agg(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        ],
    )


TIME_BUCKET_CASCADE_ORACLE = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS h,
         event_type,
         count(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS sv
  FROM events GROUP BY 1, 2
)
SELECT time_bucket(INTERVAL '1 day', h) AS bucket_start,
       event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(sv) AS DOUBLE) AS sum_value
FROM hourly GROUP BY 1, 2
"""


@query("time_bucket_cascade", survey="hypertable-rollup", oracle=TIME_BUCKET_CASCADE_ORACLE)
def time_bucket_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup computed FROM the hourly rollup (cascade), not raw rows.

    At 100 TB this is the whole point of continuous aggregates: the day
    level reads |hour buckets| rows, not |events|. Counts and decimal sums
    re-aggregate exactly; non-decomposable stats (distinct users) belong to
    the granularity where they're computed.
    """
    e = _t(spark, sf_dir, "events")
    hourly = time_bucket_agg(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        ],
    )
    return time_bucket_agg(
        hourly,
        "bucket_start",
        "1 day",
        ["event_type"],
        [
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        ],
    )


# ---------------------------------------------------------------------------
# §2.11 predictions: closed-form OLS next-step forecast with a 95%
# prediction interval (operators/forecast.py). The sufficient statistics
# are exact integer sums, so both engines evaluate the identical double
# expression tree — the forecast hash-matches bit-for-bit.
# ---------------------------------------------------------------------------

from ..operators.forecast import T_CRIT_95, linear_trend_forecast  # noqa: E402

_T_TABLE_SQL = "[" + ", ".join(str(t) for t in T_CRIT_95) + "]"

TREND_FORECAST_ORACLE = f"""
WITH per AS (
  SELECT o_custkey, year(o_orderdate) AS yr, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY yr) AS x, y
  FROM per
),
agg AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ranked GROUP BY 1 HAVING COUNT(*) >= 3
),
fit AS (
  SELECT o_custkey, n_points,
         CAST(n_points AS DOUBLE) AS n,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(syy AS DOUBLE) AS syyd
  FROM agg
),
calc AS (
  SELECT o_custkey, n_points, n,
         sxxd - sxd * sxd / n AS cxx,
         sxyd - sxd * syd / n AS cxy,
         syyd - syd * syd / n AS cyy,
         (sxyd - sxd * syd / n) / (sxxd - sxd * sxd / n) AS slope,
         syd / n - ((sxyd - sxd * syd / n) / (sxxd - sxd * sxd / n)) * sxd / n AS intercept,
         sxd, syd, sxyd
  FROM fit
),
pred AS (
  SELECT o_custkey, n_points, slope, intercept,
         intercept + slope * (n + 1) AS prediction,
         (CASE WHEN n_points - 2 > 30 THEN 1.96
               ELSE {_T_TABLE_SQL}[n_points - 2] END)
         * sqrt(greatest(cyy - slope * cxy, 0.0) / (n - 2)
                * (1 + 1 / n + ((n + 1) - sxd / n) * ((n + 1) - sxd / n) / cxx)) AS half
  FROM calc
)
SELECT o_custkey, n_points, slope, intercept, prediction,
       prediction - half AS ci_lower,
       prediction + half AS ci_upper
FROM pred
"""


@query("trend_forecast", survey="X5,2.11-predictions", oracle=TREND_FORECAST_ORACLE)
def trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer next-year order-count forecast with 95% PI — the same
    operator that powers analyze_player_performance()['predictions']."""
    o = load_table(spark, sf_dir, "orders")
    per_year = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return linear_trend_forecast(per_year, ["o_custkey"], "yr", "n_orders")


# ---------------------------------------------------------------------------
# Exact global quantiles via the distributed-rank machinery (r8): the exact
# sibling of approx_percentile for when the quantile IS the product
# (split thresholds, calibration cuts). No single-partition sort — see
# operators/windows.global_quantiles.
# ---------------------------------------------------------------------------

_QUANTILE_PS = (0.25, 0.5, 0.75, 0.9, 0.99)

GLOBAL_QUANTILES_ORACLE = "\nUNION ALL\n".join(
    f"SELECT CAST({p} AS DOUBLE) AS p,"
    f" quantile_disc(l_extendedprice, {p}) AS value FROM lineitem"
    for p in _QUANTILE_PS
) + "\nORDER BY p"


@query("global_exact_quantiles", survey="A7,W2", oracle=GLOBAL_QUANTILES_ORACLE)
def global_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p90/p99 of lineitem prices, computed
    distributively: range exchange + broadcast offsets + per-partition
    row_number, then filter to the ceil(p*n) target positions —
    percentile_disc semantics with every partition bounded at ~n/P
    (operators/windows.global_quantiles). The DuckDB twin is
    quantile_disc, pinned to the same 1-based ceil(p*n) position rule."""
    l = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_orderkey")
    return global_quantiles(l, "l_extendedprice", "l_orderkey", list(_QUANTILE_PS))
