"""Relational query pack: scans, joins, aggregations, sorts, set ops.

Each query re-expresses an operator family from SURVEY.md §2 (reference
file:line cited per query) against the driver's star-schema test tables.
The sports-domain roles map as: customer→player, nation→team,
region→league, orders→matches/season stats, lineitem→match events.

Scale notes: nation/region are broadcast (≤ a few hundred rows at any SF);
customer/orders/lineitem shuffle on their join keys and Catalyst/AQE picks
the physical join. Every aggregate that feeds the oracle hash uses exact
decimal sums (see _util.dsum) so partial-agg order can't change the bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ._util import DEC, dsum, safe_div
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: top performers (reference: src/analytics/engine.py:336-352 —
# players ⋈ season_player_stats ⋈ teams, computed cols, safe div, top-K).
# ---------------------------------------------------------------------------

TOP_PERFORMERS_ORACLE = """
SELECT c.c_custkey AS player_id,
       c.c_name AS player_name,
       n.n_name AS team_name,
       r.r_name AS region_name,
       CAST(COUNT(*) AS BIGINT) AS matches_played,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CASE WHEN COUNT(*) > 0
            THEN CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            ELSE 0.0 END AS value_per_match
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2, 3, 4
ORDER BY total_value DESC, player_id
LIMIT 20
"""


@query("top_performers", survey="J1,P1,P4,A1,A4,O1,F12", oracle=TOP_PERFORMERS_ORACLE, headline=True)
def top_performers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way dim join + grouped sum + safe division + deterministic top-K.

    Catalyst plan: broadcast-hash-join the dims, shuffle orders on
    o_custkey once, TakeOrderedAndProject for the limit (no full sort).
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")

    cnt = F.count(F.lit(1))
    tot = dsum("o_totalprice")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            c.c_custkey.alias("player_id"),
            c.c_name.alias("player_name"),
            n.n_name.alias("team_name"),
            r.r_name.alias("region_name"),
        )
        .agg(
            cnt.alias("matches_played"),
            tot.alias("total_value"),
            F.when(cnt > 0, tot / cnt).otherwise(F.lit(0.0)).alias("value_per_match"),
        )
        .orderBy(F.desc("total_value"), F.asc("player_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Pricing summary — the canonical grouped-agg suite (reference A1/A3 grouped
# sums, src/analytics/reports.py:520-533; shape of TPC-H Q1).
# ---------------------------------------------------------------------------

PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY 1, 2
"""


@query("pricing_summary", survey="A1,A2,A3,P3", oracle=PRICING_SUMMARY_ORACLE, headline=True)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate with exact decimal arithmetic.

    Whole plan is one scan + one partial/final hash aggregate; the shipdate
    predicate pushes down to the parquet scan.
    """
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    cnt = F.count(F.lit(1))
    return (
        l.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        ).agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / cnt).alias("avg_qty"),
            (dsum("l_extendedprice") / cnt).alias("avg_price"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 4-way join with a date-range filter (reference J2:
# match_stats ⋈ players ⋈ teams ⋈ matches, src/analytics/reports.py:520-533).
# ---------------------------------------------------------------------------

MULTI_JOIN_ORACLE = """
SELECT n.n_name AS nation_name,
       CAST(COUNT(*) AS BIGINT) AS line_count,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS net_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1
"""


@query("multi_join_daterange", survey="J2,P3,F7", oracle=MULTI_JOIN_ORACLE, headline=True)
def multi_join_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join narrowed by a pushed-down date range.

    Orders is filtered *before* the join (Catalyst pushes the range to the
    scan), so the lineitem⋈orders shuffle only carries matching keys; the
    dim joins broadcast.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            dsum("l_extendedprice").alias("gross_revenue"),
            F.sum(price * (1 - disc)).cast("double").alias("net_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Projection with computed columns + CASE (reference P1/P4:
# src/analytics/engine.py:336-352, 405-409).
# ---------------------------------------------------------------------------

PROJECTION_CASE_ORACLE = """
SELECT o_orderkey AS order_id,
       concat(o_orderpriority, ' ', o_orderstatus) AS prio_status,
       CASE WHEN o_orderstatus = 'F' THEN 'finished'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'pending' END AS status_label,
       CASE WHEN o_totalprice > 0 THEN 100000.0 / o_totalprice ELSE 0.0 END AS inv_price,
       CAST(YEAR(o_orderdate) AS INTEGER) AS order_year
FROM orders
"""


@query("projection_case", survey="P1,P4,F1,F12,F6", oracle=PROJECTION_CASE_ORACLE)
def projection_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure narrow projection: no shuffle, whole-stage codegen end to end."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.concat_ws(" ", "o_orderpriority", "o_orderstatus").alias("prio_status"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        safe_div(F.lit(100000.0), F.col("o_totalprice")).alias("inv_price"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    )


# ---------------------------------------------------------------------------
# Global scalar aggregates over a window of time (reference A2:
# src/analytics/reports.py:505-511 weekly match count / avg goals).
# ---------------------------------------------------------------------------

GLOBAL_AGG_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS order_count,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


@query("global_aggregates", survey="A2,F7", oracle=GLOBAL_AGG_ORACLE)
def global_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return o.agg(
        F.count(F.lit(1)).alias("order_count"),
        F.countDistinct("o_custkey").alias("active_customers"),
        (dsum("o_totalprice") / F.count(F.lit(1))).alias("avg_order_value"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# ---------------------------------------------------------------------------
# Ratio of sums (reference A3: goals.sum()/matches.sum(),
# src/analytics/engine.py:322-323).
# ---------------------------------------------------------------------------

RATIO_OF_SUMS_ORACLE = """
SELECT l_returnflag AS returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS price_per_unit
FROM lineitem
GROUP BY 1
"""


@query("ratio_of_sums", survey="A3,F12", oracle=RATIO_OF_SUMS_ORACLE)
def ratio_of_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        (dsum("l_extendedprice") / dsum("l_quantity")).alias("price_per_unit")
    )


# ---------------------------------------------------------------------------
# Frequency count (reference A5: position value_counts,
# src/analytics/reports.py:393-395).
# ---------------------------------------------------------------------------

FREQUENCY_COUNT_ORACLE = """
SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
"""


@query("frequency_count", survey="A5", oracle=FREQUENCY_COUNT_ORACLE)
def frequency_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Bucketed histogram (reference A6: pd.cut age bands,
# src/analytics/reports.py:397-404).
# ---------------------------------------------------------------------------

HISTOGRAM_ORACLE = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 2500 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            WHEN c_acctbal < 7500 THEN 'high'
            ELSE 'top' END AS balance_band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY 1
"""


@query("histogram_bucket", survey="A6,P4", oracle=HISTOGRAM_ORACLE)
def histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 2500, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .when(F.col("c_acctbal") < 7500, "high")
        .otherwise("top")
    )
    return c.groupBy(band.alias("balance_band")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_balance"),
    )


# ---------------------------------------------------------------------------
# Segment stats: mean / exact median / sum (reference A7:
# src/analytics/reports.py:406-413), plus argmax as its own query.
# ---------------------------------------------------------------------------

SEGMENT_STATS_ORACLE = """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_balance,
       median(c_acctbal) AS median_balance,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       MIN(c_acctbal) AS min_balance,
       MAX(c_acctbal) AS max_balance
FROM customer
GROUP BY 1
"""


@query("segment_stats", survey="A7", oracle=SEGMENT_STATS_ORACLE)
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via `percentile` (not approx) to hash-match the oracle."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_balance"),
        F.expr("percentile(c_acctbal, 0.5)").alias("median_balance"),
        dsum("c_acctbal").alias("total_balance"),
        F.min("c_acctbal").alias("min_balance"),
        F.max("c_acctbal").alias("max_balance"),
    )


SEGMENT_ARGMAX_ORACLE = """
SELECT c_mktsegment AS segment
FROM customer
GROUP BY 1
ORDER BY CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) DESC, c_mktsegment
LIMIT 1
"""


@query("segment_argmax", survey="A7", oracle=SEGMENT_ARGMAX_ORACLE)
def segment_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """idxmax rewrite: agg → order → limit 1 (reference reports.py:413)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg((dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_balance"))
        .orderBy(F.desc("avg_balance"), F.asc("segment"))
        .limit(1)
        .select("segment")
    )


# ---------------------------------------------------------------------------
# Set ops: distinct union of two key columns (reference U2:
# pd.concat([home, away]).unique(), src/analytics/engine.py:143).
# ---------------------------------------------------------------------------

UNION_DISTINCT_ORACLE = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


@query("union_distinct_keys", survey="U1,U2", oracle=UNION_DISTINCT_ORACLE)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# Per-table freshness stats (reference A10: COUNT(*), MAX(created_at) per
# table UNION ALL, scraping_orchestrator.py:236-261).
# ---------------------------------------------------------------------------

FRESHNESS_ORACLE = """
SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_count, MAX(o_orderdate) AS latest_ts FROM orders
UNION ALL
SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_count, MAX(ts) AS latest_ts FROM events
UNION ALL
SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_count, MAX(l_shipdate) AS latest_ts FROM lineitem
"""


@query("freshness_stats", survey="A10,U1", oracle=FRESHNESS_ORACLE)
def freshness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str, ts_col: str) -> DataFrame:
        return (
            _t(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("row_count"), F.max(ts_col).cast("timestamp").alias("latest_ts"))
            .select(F.lit(name).alias("table_name"), "row_count", "latest_ts")
        )

    return (
        one("orders", "o_orderdate")
        .unionByName(one("events", "ts"))
        .unionByName(one("lineitem", "l_shipdate"))
    )


# ---------------------------------------------------------------------------
# Field-coverage profile (reference A11: % non-null per column,
# scripts/analysis/club_field_coverage.py:36-44).
# ---------------------------------------------------------------------------

COVERAGE_ORACLE = """
SELECT CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS text_coverage,
       CAST(SUM(CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS lang_coverage,
       CAST(SUM(CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS source_coverage,
       CAST(SUM(CASE WHEN n_chars > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS nonempty_share
FROM documents
"""


@query("field_coverage", survey="A11", oracle=COVERAGE_ORACLE)
def field_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")

    def cov(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("double") / F.count(F.lit(1))

    return d.agg(
        cov(F.col("text").isNotNull()).alias("text_coverage"),
        cov(F.col("lang").isNotNull()).alias("lang_coverage"),
        cov(F.col("source").isNotNull()).alias("source_coverage"),
        cov(F.col("n_chars") > 0).alias("nonempty_share"),
    )


# ---------------------------------------------------------------------------
# CUBE over (status, priority): all four grouping sets in one pass.
# Spark plans CUBE as a single Expand + one partial-agg-friendly exchange —
# at 100 TB that is 4× the input rows through ONE shuffle, versus four
# separate scans+shuffles for the UNION-of-groupbys formulation. The
# grouping id distinguishes the rollup rows from any genuine 'ALL' value.
# (rollup_pricing covers the linear ROLLUP variant; this is the full
# grouping-sets lattice.)
# ---------------------------------------------------------------------------

CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_order_stats", survey="A1(cube),A5", oracle=CUBE_ORACLE)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts and exact-decimal totals over the full
    (status, priority) grouping-sets lattice, with a grouping id."""
    o = _t(spark, sf_dir, "orders")
    g = o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )
    return g.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "gid",
        "n_orders",
        "total_price",
    )
