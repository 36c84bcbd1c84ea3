"""Domain-operator queries: league analytics composite, term-map
normalization, external-ID resolution (SURVEY.md §2 A12, F3, J7).

These use literal VALUES inputs where the driver tables lack the domain
shape, so the operators stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..sources.bronze import DEFAULT_TERM_MAP, apply_term_mapping, resolve_external_ids, term_map_df
from .registry import query
from ._util import dsum


# ---------------------------------------------------------------------------
# A12: league analytics composite — match count, participant count,
# conditional rates, high-scoring share (the dashboard contract
# reports.py:158-213; orders stand in for matches: F=home win, O=draw).
# ---------------------------------------------------------------------------

LEAGUE_SUMMARY_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS matches_played,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS total_teams,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value_per_match,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS home_win_rate,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS draw_rate,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS away_win_rate,
       CAST(SUM(CASE WHEN o_totalprice >= 300000 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS high_scoring_share
FROM orders
"""


@query("league_summary", survey="A12,A2,P4", oracle=LEAGUE_SUMMARY_ORACLE)
def league_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))

    def rate(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("double") / cnt

    return o.agg(
        cnt.alias("matches_played"),
        F.countDistinct("o_custkey").alias("total_teams"),
        dsum("o_totalprice").alias("total_value"),
        (dsum("o_totalprice") / cnt).alias("avg_value_per_match"),
        rate(F.col("o_orderstatus") == "F").alias("home_win_rate"),
        rate(F.col("o_orderstatus") == "O").alias("draw_rate"),
        rate(F.col("o_orderstatus") == "P").alias("away_win_rate"),
        rate(F.col("o_totalprice") >= 300000).alias("high_scoring_share"),
    )


# ---------------------------------------------------------------------------
# F3: synonym → canonical term mapping via broadcast map join
# (term_mapper.py:96-152; positions GK/DF/MF/FW).
# ---------------------------------------------------------------------------

_RAW_TERMS = [
    (1, "Torwart"), (2, "centre back"), (3, "STRIKER"), (4, "Mittelfeld"),
    (5, "Left Back"), (6, "unknown role"), (7, " keeper "),
]

_POS = DEFAULT_TERM_MAP["position"]
_MAP_VALUES = ",\n         ".join(f"('{k}', '{v}')" for k, v in sorted(_POS.items()))
_RAW_VALUES = ",\n       ".join(f"({i}, '{t}')" for i, t in _RAW_TERMS)

TERM_MAPPING_ORACLE = f"""
WITH raw(id, term) AS (
  VALUES {_RAW_VALUES}
),
map(synonym, canonical) AS (
  VALUES {_MAP_VALUES}
)
SELECT r.id, COALESCE(m.canonical, r.term) AS position
FROM raw r
LEFT JOIN map m
  ON trim(regexp_replace(regexp_replace(lower(r.term), '[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g')) = m.synonym
"""


@query("term_mapping", survey="F3,X4", oracle=TERM_MAPPING_ORACLE)
def term_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame(_RAW_TERMS, "id long, term string")
    mapping = term_map_df(spark, _POS, "position")
    mapped = apply_term_mapping(
        raw.withColumnRenamed("term", "position"), "position", mapping
    )
    return mapped.select("id", "position")


# ---------------------------------------------------------------------------
# J7: external-ID mapping join — (source, external_id) → internal id with
# existing/new routing (external_id_mapping_service_async.py:40-200).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# U5: mixed-shape record unification via coalesce projection
# (src/common/scraper_utils.py:113-156 — different scrapers emit different
# field names for the same fixture concept).
# ---------------------------------------------------------------------------

RECORD_UNIFICATION_ORACLE = """
WITH raw(id, home_team, heim, away_team, gast, score_text, ergebnis) AS (
  VALUES (1, 'Reds', NULL, 'Blues', NULL, '2-1', NULL),
         (2, NULL, 'Greens', NULL, 'Reds', NULL, '0:0'),
         (3, 'Blues', 'IGNORED', 'Greens', NULL, '3-2', '9:9')
)
SELECT id,
       COALESCE(home_team, heim) AS home,
       COALESCE(away_team, gast) AS away,
       CASE WHEN regexp_extract(regexp_replace(COALESCE(score_text, ergebnis), ':', '-', 'g'),
                                '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 1) <> ''
            THEN CAST(regexp_extract(regexp_replace(COALESCE(score_text, ergebnis), ':', '-', 'g'),
                                     '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 1) AS INTEGER) END AS home_goals,
       CASE WHEN regexp_extract(regexp_replace(COALESCE(score_text, ergebnis), ':', '-', 'g'),
                                '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 2) <> ''
            THEN CAST(regexp_extract(regexp_replace(COALESCE(score_text, ergebnis), ':', '-', 'g'),
                                     '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 2) AS INTEGER) END AS away_goals
FROM raw
"""


@query("record_unification", survey="U5,F8,F16", oracle=RECORD_UNIFICATION_ORACLE)
def record_unification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.parsing import parse_score

    raw = spark.createDataFrame(
        [
            (1, "Reds", None, "Blues", None, "2-1", None),
            (2, None, "Greens", None, "Reds", None, "0:0"),
            (3, "Blues", "IGNORED", "Greens", None, "3-2", "9:9"),
        ],
        "id long, home_team string, heim string, away_team string, gast string, "
        "score_text string, ergebnis string",
    )
    score = F.coalesce("score_text", "ergebnis")
    home_goals, away_goals = parse_score(score)
    return raw.select(
        "id",
        F.coalesce("home_team", "heim").alias("home"),
        F.coalesce("away_team", "gast").alias("away"),
        home_goals.alias("home_goals"),
        away_goals.alias("away_goals"),
    )


# ---------------------------------------------------------------------------
# Rollup + pivot — free Catalyst capabilities the reference never had
# (SURVEY §2.4 closing note); included so the coverage is explicit.
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_pricing", survey="A1(rollup)", oracle=ROLLUP_ORACLE)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .withColumnRenamed("l_returnflag", "returnflag")
        .withColumnRenamed("l_linestatus", "linestatus")
    )


PIVOT_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY 1
"""


@query("pivot_status_matrix", survey="A5(pivot)", oracle=PIVOT_ORACLE)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "priority",
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


EXTERNAL_ID_ORACLE = """
WITH idmap(entity_type, source, external_id, internal_id) AS (
  VALUES ('player', 'tm', '111', 1), ('player', 'tm', '112', 2),
         ('player', 'fbref', 'abc', 3), ('team', 'tm', '111', 77)
),
inc(source, external_id) AS (
  VALUES ('tm', '111'), ('tm', '112'), ('tm', '999'), ('fbref', 'abc'), ('fbref', 'zzz')
)
SELECT i.source, i.external_id, m.internal_id,
       CASE WHEN m.internal_id IS NULL THEN 'new' ELSE 'existing' END AS status
FROM inc i
LEFT JOIN (SELECT source, external_id, internal_id FROM idmap WHERE entity_type = 'player') m
  ON i.source = m.source AND i.external_id = m.external_id
"""


@query("external_id_lookup", survey="J7,J9", oracle=EXTERNAL_ID_ORACLE)
def external_id_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    id_map = spark.createDataFrame(
        [
            ("player", "tm", "111", 1), ("player", "tm", "112", 2),
            ("player", "fbref", "abc", 3), ("team", "tm", "111", 77),
        ],
        "entity_type string, source string, external_id string, internal_id long",
    )
    incoming = spark.createDataFrame(
        [("tm", "111"), ("tm", "112"), ("tm", "999"), ("fbref", "abc"), ("fbref", "zzz")],
        "source string, external_id string",
    )
    resolved, _new = resolve_external_ids(
        incoming, id_map, "player", generate_missing=False
    )
    return resolved.select(
        "source",
        "external_id",
        "internal_id",
        F.when(F.col("internal_id").isNull(), "new").otherwise("existing").alias("status"),
    )


# ---------------------------------------------------------------------------
# Sketch aggregates: the 100 TB substitutes for exact distinct/percentile.
# HLL++ and the Greenwald-Khanna quantile sketch are mergeable partial
# aggregates — one map-side pass, tiny shuffle — where exact distinct
# counts shuffle every key. Algorithms differ from DuckDB's approx
# implementations, so the oracle checks error-bound BOOLEANS the Spark side
# computes against its own exact aggregates (sketch within bound ⇔ column is
# TRUE ⇔ hash-match): a real cross-engine assertion of the sketch contract.
# Tighter error-bound units live in tests/test_operators.py.
# ---------------------------------------------------------------------------

SKETCH_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_within_rsd,
       TRUE AS p50_within_eps,
       TRUE AS p95_within_eps,
       TRUE AS p99_within_eps
FROM events
GROUP BY event_type
"""


@query("sketch_profile", survey="A2(approx),A7(approx)", oracle=SKETCH_ORACLE)
def sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate profile: HLL distinct users + GK quantiles,
    each asserted against the exact aggregate inside the query.

    HLL rsd=0.02 is checked at 5σ (±10%); each GK quantile (accuracy 10⁴ ⇒
    rank error 10⁻⁴) is checked against the exact quantiles at q ± 0.005 —
    generous bounds so the row is deterministic, tight enough that a broken
    sketch fails the hash-match.
    """
    e = load_table(spark, sf_dir, "events")
    eps = 0.005
    qs = [0.5, 0.95, 0.99]
    bracket = [q + d for q in qs for d in (-eps, eps)]
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__hll"),
        F.percentile_approx("value", qs, 10_000).alias("__aq"),
        F.percentile("value", bracket).alias("__xq"),
    )
    def _q_ok(i: int) -> Column:
        a = F.element_at("__aq", i + 1)
        return (a >= F.element_at("__xq", 2 * i + 1)) & (a <= F.element_at("__xq", 2 * i + 2))

    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (F.abs(F.col("__hll") - F.col("exact_users"))
         <= 0.1 * F.col("exact_users")).alias("users_within_rsd"),
        _q_ok(0).alias("p50_within_eps"),
        _q_ok(1).alias("p95_within_eps"),
        _q_ok(2).alias("p99_within_eps"),
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff (operators/merge.table_diff): what changed between two
# versions of a keyed table — the audit companion of the upsert sinks
# (S10: the reference's ON CONFLICT logging, done as ONE full-outer
# equi-join instead of per-row sink callbacks). Versions are derived
# deterministically from the customer table: the "old" snapshot is
# missing every 11th-ish key (→ inserted), the "new" one drops every 7th
# (→ deleted) and bumps every 5th balance (→ updated); everything else is
# unchanged.
# ---------------------------------------------------------------------------

TABLE_DIFF_ORACLE = """
WITH old AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 <> 3
),
new AS (
  SELECT c_custkey,
         c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 10.0 ELSE 0.0 END AS c_acctbal
  FROM customer WHERE c_custkey % 7 <> 0
)
SELECT COALESCE(old.c_custkey, new.c_custkey) AS c_custkey,
       CASE WHEN old.c_custkey IS NULL THEN 'inserted'
            WHEN new.c_custkey IS NULL THEN 'deleted'
            WHEN old.c_acctbal = new.c_acctbal THEN 'unchanged'
            ELSE 'updated' END AS change,
       old.c_acctbal AS old_bal,
       new.c_acctbal AS new_bal
FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
"""


@query("snapshot_table_diff", survey="cdc-diff,S10,U1,J1", oracle=TABLE_DIFF_ORACLE)
def snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff of two table versions: inserted/deleted/updated/unchanged.

    One full-outer shuffle join on the business key; the value comparison
    is a null-safe struct equality, so adding compared columns never adds
    plan stages. At 100 TB both sides shuffle once and AQE handles skew —
    there is no per-row logging pass.
    """
    from ..operators.merge import table_diff

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    old = c.filter(F.col("c_custkey") % 11 != 3)
    new = c.filter(F.col("c_custkey") % 7 != 0).withColumn(
        "c_acctbal",
        F.col("c_acctbal")
        + F.when(F.col("c_custkey") % 5 == 0, F.lit(10.0)).otherwise(F.lit(0.0)),
    )
    d = table_diff(old, new, ["c_custkey"], compare=["c_acctbal"])
    return d.select(
        "c_custkey",
        "change",
        F.col("old_row.c_acctbal").alias("old_bal"),
        F.col("new_row.c_acctbal").alias("new_bal"),
    )


# ---------------------------------------------------------------------------
# Deterministic mergeable sketches (operators/sketches.py): unlike
# sketch_profile's built-in HLL++/GK (whose registers are implementation-
# private, so the oracle can only check error-bound booleans), these
# sketches are built from md5-derived hashes with integer-only arithmetic,
# so the REGISTER TABLES themselves hash-compare bit-exactly against the
# DuckDB restatement — the strongest oracle a sketch can carry. The merge
# operator (elementwise max / cell-wise sum) is exercised inside each
# query and pinned by the same hash.
# ---------------------------------------------------------------------------

from ..operators.sketches import (  # noqa: E402  (plan modules import late)
    cms_cells,
    cms_point_estimates,
    hll_constants,
    hll_registers,
    hll_sketch_summary,
    merge_hll_registers,
)

_HLL_P = 8
_HLL_C, _HLL_SHIFT = hll_constants(_HLL_P)
_HLL_M = 1 << _HLL_P
#: 5 sigma at rsd = 1.04/sqrt(m): generous enough to be deterministic on
#: real data, tight enough that a broken register breaks the boolean too
#: (and the register CSV hash breaks first anyway).
_HLL_5SIGMA = 5 * 1.04 / 16

#: lineitem row keys (orderkey:linenumber) give every group a cardinality
#: safely inside the raw-estimator regime at EVERY test SF (~2k at
#: sf0.001 to ~200k at sf0.1 per return flag; raw HLL needs n >~ 2.5m =
#: 640) — the events table's 150 distinct users would sit in the
#: linear-counting regime, whose ln() is not bit-portable across engines.
_HLL_REG_SQL = """
  SELECT l_returnflag,
         CAST(h % {m} AS INTEGER) AS reg,
         CAST(CASE WHEN (h // {m}) > 0
                   THEN {shift} - length(bin(h // {m}))
                   ELSE {shift} END AS INTEGER) AS rho
  FROM (SELECT l_returnflag,
               ('0x' || substr(md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR),
                               1, 15))::BIGINT AS h
        FROM lineitem{half})
"""

HLL_SKETCH_ORACLE = f"""
WITH regs AS (
  SELECT l_returnflag, reg, MAX(rho) AS rho
  FROM ({_HLL_REG_SQL.format(m=_HLL_M, shift=_HLL_SHIFT, half="")})
  GROUP BY 1, 2
),
regs_even AS (
  SELECT l_returnflag, reg, MAX(rho) AS rho
  FROM ({_HLL_REG_SQL.format(m=_HLL_M, shift=_HLL_SHIFT, half=" WHERE (l_orderkey + l_linenumber) % 2 = 0")})
  GROUP BY 1, 2
),
regs_odd AS (
  SELECT l_returnflag, reg, MAX(rho) AS rho
  FROM ({_HLL_REG_SQL.format(m=_HLL_M, shift=_HLL_SHIFT, half=" WHERE (l_orderkey + l_linenumber) % 2 = 1")})
  GROUP BY 1, 2
),
merged AS (
  SELECT l_returnflag, reg, MAX(rho) AS rho
  FROM (SELECT * FROM regs_even UNION ALL SELECT * FROM regs_odd)
  GROUP BY 1, 2
),
summ AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS INTEGER) AS n_registers,
         string_agg(reg || ':' || rho, ',' ORDER BY reg) AS csv,
         CAST(SUM(1::BIGINT << ({_HLL_SHIFT} - rho))
              + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_SHIFT}) AS BIGINT) AS s
  FROM regs GROUP BY 1
),
msumm AS (
  SELECT l_returnflag, string_agg(reg || ':' || rho, ',' ORDER BY reg) AS mcsv
  FROM merged GROUP BY 1
),
exact AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR) AS BIGINT)
           AS exact_keys
  FROM lineitem GROUP BY 1
)
SELECT s.l_returnflag,
       e.exact_keys,
       s.n_registers,
       md5(s.csv) AS sketch_md5,
       s.s AS hll_s,
       {_HLL_C!r} / CAST(s.s AS DOUBLE) AS est_keys,
       abs({_HLL_C!r} / CAST(s.s AS DOUBLE) - e.exact_keys)
         <= {_HLL_5SIGMA!r} * e.exact_keys AS within_5sigma,
       s.csv = m.mcsv AS merge_consistent
FROM summ s
JOIN exact e USING (l_returnflag)
JOIN msumm m USING (l_returnflag)
ORDER BY s.l_returnflag
"""


@query(
    "hll_distinct_sketch",
    survey="sketch-distinct,A2(approx)",
    oracle=HLL_SKETCH_ORACLE,
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-key sketch per lineitem return
    flag, the 100 TB substitute for COUNT(DISTINCT): one
    groupBy(group, register) max-aggregate — map-side combinable, the
    exchange carries at most groups x 256 rows however large the input —
    then the raw HLL estimator with the Sum(2^-rho) kept EXACT in an
    int64 and the bias constant folded into a single double literal, so
    the only floating-point operation is one division (bit-identical in
    any IEEE engine). Mergeability is exercised in-query: the input
    split by (orderkey+linenumber) parity, sketched per half, merged
    with elementwise max (operators/sketches.merge_hll_registers), and
    the merged register CSV must equal the whole-input CSV —
    hash-pinned, alongside the register table itself (canonical
    "reg:rho" CSV -> md5) and a 5-sigma error-contract boolean against
    the exact count (empirically <=16 percent error across sf0.001-0.1;
    the contract allows 32.5). No linear-counting branch: ln() is not
    bit-portable across engines, and lineitem row keys keep every group
    in the raw-estimator regime at every test SF. Reference parity: the
    distinct-entity dashboards (analytics_service.py player/team
    aggregate loops, SURVEY §2.4 A2) at a scale where exact distinct is
    a full shuffle of every key.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(":", "l_orderkey", "l_linenumber").alias("__k"),
    )
    regs = hll_registers(li, ["l_returnflag"], "__k", p=_HLL_P)
    summ = hll_sketch_summary(regs, ["l_returnflag"], p=_HLL_P)
    parity = (F.col("l_orderkey") + F.col("l_linenumber")) % 2
    even = hll_registers(li.filter(parity == 0), ["l_returnflag"], "__k", p=_HLL_P)
    odd = hll_registers(li.filter(parity == 1), ["l_returnflag"], "__k", p=_HLL_P)
    merged = merge_hll_registers(even, odd, ["l_returnflag"])
    msumm = hll_sketch_summary(merged, ["l_returnflag"], p=_HLL_P).select(
        "l_returnflag", F.col("sketch_csv").alias("__mcsv")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("__k").alias("exact_keys")
    )
    return (
        summ.join(exact, "l_returnflag")
        .join(msumm, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_keys",
            "n_registers",
            F.md5(F.col("sketch_csv").cast("binary")).alias("sketch_md5"),
            "hll_s",
            F.col("est").alias("est_keys"),
            (
                F.abs(F.col("est") - F.col("exact_keys"))
                <= F.lit(_HLL_5SIGMA) * F.col("exact_keys")
            ).alias("within_5sigma"),
            (F.col("sketch_csv") == F.col("__mcsv")).alias("merge_consistent"),
        )
        .orderBy("l_returnflag")
    )


#: w = 64 deliberately UNDERSIZES the table against the 150-user key
#: space so the sketch shows real collision behavior at the larger SFs
#: (est_err > 0 at sf0.01/0.1) while the Count-Min epsilon bound
#: est - exact <= (e/w)·N still holds at every SF (checked empirically;
#: the bound constant e/w is folded into one double literal).
_CMS_D, _CMS_W = 4, 64
_CMS_EPS = 2.718281828459045 / _CMS_W

CMS_ORACLE = f"""
WITH cells AS (
  SELECT i AS row,
         CAST(('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
              % {_CMS_W} AS INTEGER) AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events, range({_CMS_D}) t(i)
  GROUP BY 1, 2
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM events GROUP BY 1
),
probes AS (
  SELECT user_id, exact_cnt FROM exact ORDER BY exact_cnt DESC, user_id LIMIT 5
),
est AS (
  SELECT p.user_id, p.exact_cnt, MIN(c.cnt) AS cms_est
  FROM probes p
  CROSS JOIN range({_CMS_D}) t(i)
  JOIN cells c
    ON c.row = t.i
   AND c.cell = CAST(('0x' || substr(md5(t.i::VARCHAR || ':' || p.user_id::VARCHAR), 1, 15))::BIGINT
                     % {_CMS_W} AS INTEGER)
  GROUP BY 1, 2
)
SELECT user_id, exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       cms_est >= exact_cnt AS overestimate_ok,
       CAST(cms_est - exact_cnt AS BIGINT) AS est_err,
       CAST(cms_est - exact_cnt AS DOUBLE) <= {_CMS_EPS!r} * t.n AS within_eps_n
FROM est, total t ORDER BY user_id
"""


@query(
    "cms_event_frequency",
    survey="sketch-countmin,A5(approx)",
    oracle=CMS_ORACLE,
)
def cms_event_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over event user activity — the bounded-
    state substitute for exact per-key counts, complementing the
    in-window Misra-Gries heavy hitters (that one answers "which keys
    are big", this one answers "how big is key X" for ANY later probe
    without re-reading the corpus). Build: one pass exploding each event
    into d=4 (row, md5-derived cell) pairs, partial-count combined
    map-side to <= d*w = 256 cells before the only exchange; the cell
    table IS the sketch and merges by cell-wise sum (unit-pinned in
    tests/test_sketches.py). Probe: the top-5 users by exact count
    (total order: count desc, user_id) estimated as min-over-rows, all
    integers -> bit-exact oracle, plus the two CMS guarantees as REAL
    cross-engine properties: one-sided error (estimate >= exact) and the
    epsilon bound (overestimate <= (e/w)·N). w is deliberately small so
    both sides of the contract do work — collisions are real at the
    larger SFs. Reference parity: per-entity frequency dashboards
    (analytics_service.py user activity loops, SURVEY §2.4 A5) at 100 TB.
    """
    e = load_table(spark, sf_dir, "events")
    cells = cms_cells(e, "user_id", d=_CMS_D, w=_CMS_W)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    total = e.agg(F.count(F.lit(1)).alias("__n"))
    probes = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(5)
    est = cms_point_estimates(cells, probes, "user_id", d=_CMS_D, w=_CMS_W)
    return (
        probes.join(est, "user_id")
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("overestimate_ok"),
            (F.col("cms_est") - F.col("exact_cnt")).alias("est_err"),
            (
                (F.col("cms_est") - F.col("exact_cnt")).cast("double")
                <= F.lit(_CMS_EPS) * F.col("__n")
            ).alias("within_eps_n"),
        )
        .orderBy("user_id")
    )


from ..operators.sketches import (  # noqa: E402
    kmv_bottomk,
    kmv_estimate_literal,
    kmv_overlap,
)

_KMV_K = 256
_KMV_LIT = kmv_estimate_literal(_KMV_K)
#: 5 sigma at the KMV distinct rsd ~ 1/sqrt(k-2) — folded to a literal in
#: PYTHON (no engine sqrt in the compared expression).
_KMV_5SIGMA = 5.0 / (254.0**0.5)
#: 5 sigma worst-case for the Jaccard estimator: 5*sqrt(J(1-J)/k) <=
#: 5*sqrt(0.25/256) = 0.15625 exactly (a dyadic literal).
_KMV_J_BOUND = 0.15625

KMV_ORACLE = f"""
WITH a_keys AS (SELECT DISTINCT l_orderkey AS v FROM lineitem WHERE l_returnflag = 'A'),
b_keys AS (SELECT DISTINCT l_orderkey AS v FROM lineitem WHERE l_returnflag = 'R'),
ha AS (SELECT DISTINCT ('0x' || substr(md5(v::VARCHAR), 1, 15))::BIGINT AS h FROM a_keys),
hb AS (SELECT DISTINCT ('0x' || substr(md5(v::VARCHAR), 1, 15))::BIGINT AS h FROM b_keys),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT {_KMV_K}),
ov AS (SELECT CAST(COUNT(*) AS INTEGER) AS overlap_k
       FROM ku WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
ex AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a_keys) AS n_a,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM b_keys) AS n_b,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT v FROM a_keys INTERSECT SELECT v FROM b_keys)) AS n_inter,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT v FROM a_keys UNION SELECT v FROM b_keys)) AS n_union),
summ AS (SELECT (SELECT MAX(h) FROM ku) AS hk,
                (SELECT md5(string_agg(h::VARCHAR, ',' ORDER BY h)) FROM ku) AS sketch_md5,
                (SELECT overlap_k FROM ov) AS overlap_k)
SELECT CAST({_KMV_K} AS INTEGER) AS k,
       e.n_a, e.n_b, e.n_inter, e.n_union,
       s.sketch_md5,
       s.overlap_k,
       {_KMV_LIT!r} / CAST(s.hk AS DOUBLE) AS est_union,
       CAST(s.overlap_k AS DOUBLE) / {_KMV_K} AS jacc_est,
       CAST(e.n_inter AS DOUBLE) / e.n_union AS jacc_exact,
       (CAST(s.overlap_k AS DOUBLE) / {_KMV_K}) * ({_KMV_LIT!r} / CAST(s.hk AS DOUBLE))
         AS est_inter,
       abs({_KMV_LIT!r} / CAST(s.hk AS DOUBLE) - e.n_union)
         <= {_KMV_5SIGMA!r} * e.n_union AS union_within_5sigma,
       abs(CAST(s.overlap_k AS DOUBLE) / {_KMV_K}
           - CAST(e.n_inter AS DOUBLE) / e.n_union)
         <= {_KMV_J_BOUND!r} AS jacc_within_5sigma
FROM ex e, summ s
"""


@query(
    "kmv_corpus_overlap",
    survey="sketch-distinct,llm-decontam,A2(approx)",
    oracle=KMV_ORACLE,
)
def kmv_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) set-overlap sketch — how a 100 TB decontamination
    pass asks "how much does corpus A overlap corpus B" WITHOUT joining
    either corpus: each side reduces to its k=256 smallest distinct
    md5-derived hashes (distinct combines map-side; the global bottom-k
    plans as TakeOrderedAndProject — no full sort, no all-keys
    exchange), the union sketch is the bottom-k of the two sketches
    (the KMV merge), Jaccard ~ the fraction of union-sketch values
    present in both sides, and distinct/intersection estimates follow
    with one double division each ((k-1)·2^60/h_k folded to a literal;
    the 5-sigma literals are computed in PYTHON, so no engine
    transcendental touches a compared value). The union sketch itself
    is hash-pinned (canonical CSV -> md5) — register-level
    cross-engine agreement, not just bounds. Probe sets: orderkeys
    carrying return flag A vs R (genuinely overlapping real sets,
    J ~ 0.58; both error contracts hold at sf0.001/0.01/0.1 with >=3x
    margin). The exact n_a/n_b/inter/union ride along as the in-query
    ground truth. Complements the in-window token-level
    contamination_overlap (llm-decontam) with the set-level scale
    path."""
    li = load_table(spark, sf_dir, "lineitem")
    a_keys = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("v")
    )
    b_keys = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("v")
    )
    ka = kmv_bottomk(a_keys, "v", _KMV_K)
    kb = kmv_bottomk(b_keys, "v", _KMV_K)
    ku, ov = kmv_overlap(ka, kb, _KMV_K)
    summ = ku.agg(
        F.max("h").alias("hk"),
        F.md5(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list("h")), lambda x: x.cast("string"))
            ).cast("binary")
        ).alias("sketch_md5"),
    )
    da, db = a_keys.distinct(), b_keys.distinct()
    ex = (
        da.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(db.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            da.join(db, "v", "left_semi").agg(F.count(F.lit(1)).alias("n_inter"))
        )
        .crossJoin(
            da.unionByName(db).distinct().agg(F.count(F.lit(1)).alias("n_union"))
        )
    )
    est_union = F.lit(_KMV_LIT) / F.col("hk").cast("double")
    jacc_est = F.col("overlap_k").cast("double") / F.lit(_KMV_K)
    jacc_exact = F.col("n_inter").cast("double") / F.col("n_union")
    return (
        ex.crossJoin(F.broadcast(summ))
        .crossJoin(F.broadcast(ov))
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            "n_a",
            "n_b",
            "n_inter",
            "n_union",
            "sketch_md5",
            F.col("overlap_k").cast("int").alias("overlap_k"),
            est_union.alias("est_union"),
            jacc_est.alias("jacc_est"),
            jacc_exact.alias("jacc_exact"),
            (jacc_est * est_union).alias("est_inter"),
            (
                F.abs(est_union - F.col("n_union"))
                <= F.lit(_KMV_5SIGMA) * F.col("n_union")
            ).alias("union_within_5sigma"),
            (F.abs(jacc_est - jacc_exact) <= F.lit(_KMV_J_BOUND)).alias(
                "jacc_within_5sigma"
            ),
        )
    )


from ..operators.sketches import bloom_build, bloom_probe  # noqa: E402

_BLOOM_M, _BLOOM_J = 65536, 4
#: empirical fp ceiling for this probe at every test SF (observed max
#: 0.0015 at sf0.1; expected (1-e^(-jn/m))^j ~ 0.002 at n=3.5k keys).
_BLOOM_FP_BOUND = 0.01

BLOOM_ORACLE = f"""
WITH dim AS (SELECT DISTINCT p_partkey AS key FROM part WHERE p_size < 10),
bits AS (
  SELECT (('0x' || substr(md5(t.i::VARCHAR || ':' || d.key::VARCHAR), 1, 15))::BIGINT
          % {_BLOOM_M}) AS pos
  FROM dim d, range({_BLOOM_J}) t(i)
),
words AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS wbits
  FROM bits GROUP BY 1
),
fact AS (SELECT l_partkey AS key FROM lineitem),
probe AS (
  SELECT f.rid, f.key,
         bool_and(COALESCE(w.wbits, 0)
                  & (1::BIGINT << CAST(p.pos % 32 AS INTEGER)) <> 0) AS pass
  FROM (SELECT row_number() OVER () AS rid, key FROM fact) f,
       LATERAL (SELECT (('0x' || substr(md5(t.i::VARCHAR || ':' || f.key::VARCHAR),
                                        1, 15))::BIGINT % {_BLOOM_M}) AS pos
                FROM range({_BLOOM_J}) t(i)) p
  LEFT JOIN words w ON w.word = p.pos // 32
  GROUP BY 1, 2
),
x AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS n_dim,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM fact) AS n_fact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probe
            WHERE key IN (SELECT key FROM dim)) AS n_match,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probe WHERE pass) AS bloom_pass,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probe
            WHERE key IN (SELECT key FROM dim) AND NOT pass) AS false_neg,
         (SELECT md5(string_agg(word || ':' || wbits, ',' ORDER BY word))
            FROM words) AS bitmap_md5
)
SELECT n_dim, n_fact, n_match, bloom_pass, false_neg,
       bitmap_md5,
       CAST(bloom_pass - n_match AS BIGINT) AS false_pass,
       CAST(bloom_pass - n_match AS DOUBLE) / (n_fact - n_match) AS fp_rate,
       CAST(bloom_pass - n_match AS DOUBLE) / (n_fact - n_match)
         <= {_BLOOM_FP_BOUND!r} AS fp_rate_ok
FROM x
"""


@query(
    "bloom_semi_prune",
    survey="sketch-bloom,J1,A2(approx)",
    oracle=BLOOM_ORACLE,
)
def bloom_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN REDUCTION — the shuffle-avoidance move a
    100 TB fact-to-selective-dim join starts with: the dim side's
    distinct keys fold into a fixed-size md5-derived bitmap (j=4
    positions into m=65536 bits, 32-bit words, one map-side bit_or —
    <= 2048 rows whatever the key count), the bitmap collapses to ONE
    broadcast map literal, and the fact probe is a pure PROJECTION (no
    shuffle, no explode) that discards ~82 percent of rows before any
    real join would run. Contracts, all hash-pinned: ZERO false
    negatives (the Bloom guarantee, emitted as a count that must be 0),
    the false-positive count and rate (REAL collisions at sf0.1 —
    m deliberately sized so the filter does honest work), the rate
    bound, and the bitmap itself (canonical word:bits CSV -> md5 —
    register-level cross-engine agreement). Build mergeability is the
    same bit_or (unit-pinned). Probe: parts with p_size < 10 against
    lineitem. Spark ships this pattern internally as runtime filters;
    this operator is the EXPLICIT, engine-portable form a mixed-engine
    pipeline can hand across systems."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    dim = part.filter(F.col("p_size") < 10).select(
        F.col("p_partkey").alias("key")
    ).distinct()
    words = bloom_build(dim, "key", _BLOOM_M, _BLOOM_J)
    fact = li.select(F.col("l_partkey").alias("key"))
    probed = bloom_probe(fact, "key", words, _BLOOM_M, _BLOOM_J)
    bitmap = words.agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word", "wbits"))),
                    lambda s: F.concat_ws(
                        ":", s["word"].cast("string"), s["wbits"].cast("string")
                    ),
                ),
            ).cast("binary")
        ).alias("bitmap_md5")
    )
    in_dim = probed.join(F.broadcast(dim), "key", "left_semi")
    agg = (
        dim.agg(F.count(F.lit(1)).alias("n_dim"))
        .crossJoin(fact.agg(F.count(F.lit(1)).alias("n_fact")))
        .crossJoin(in_dim.agg(F.count(F.lit(1)).alias("n_match")))
        .crossJoin(
            probed.filter("bloom_pass").agg(F.count(F.lit(1)).alias("bloom_pass"))
        )
        .crossJoin(
            in_dim.filter(~F.col("bloom_pass")).agg(
                F.count(F.lit(1)).alias("false_neg")
            )
        )
        .crossJoin(F.broadcast(bitmap))
    )
    fp_rate = (F.col("bloom_pass") - F.col("n_match")).cast("double") / (
        F.col("n_fact") - F.col("n_match")
    )
    return agg.select(
        "n_dim",
        "n_fact",
        "n_match",
        "bloom_pass",
        "false_neg",
        "bitmap_md5",
        (F.col("bloom_pass") - F.col("n_match")).alias("false_pass"),
        fp_rate.alias("fp_rate"),
        (fp_rate <= F.lit(_BLOOM_FP_BOUND)).alias("fp_rate_ok"),
    )


from ..operators.sketches import dyadic_histogram, dyadic_quantile_picks  # noqa: E402

_DYQ_SHIFT = 12  # 4096-cent (~$41) buckets
_DYQ_QS = (0.5, 0.95, 0.99)

DYADIC_QUANTILE_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         l_orderkey + l_linenumber AS par
  FROM lineitem
),
hist AS (
  SELECT l_returnflag, cents // {1 << _DYQ_SHIFT} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM base GROUP BY 1, 2
),
merged AS (
  SELECT l_returnflag, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT l_returnflag, cents // {1 << _DYQ_SHIFT} AS bucket, COUNT(*) AS cnt
    FROM base WHERE par % 2 = 0 GROUP BY 1, 2
    UNION ALL
    SELECT l_returnflag, cents // {1 << _DYQ_SHIFT} AS bucket, COUNT(*) AS cnt
    FROM base WHERE par % 2 = 1 GROUP BY 1, 2
  ) GROUP BY 1, 2
),
sig AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS INTEGER) AS n_buckets,
         md5(string_agg(bucket || ':' || cnt, ',' ORDER BY bucket)) AS hist_md5
  FROM hist GROUP BY 1
),
msig AS (
  SELECT l_returnflag,
         md5(string_agg(bucket || ':' || cnt, ',' ORDER BY bucket)) AS mmd5
  FROM merged GROUP BY 1
),
cum AS (
  SELECT l_returnflag, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum
  FROM hist
),
totals AS (SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
qs AS (SELECT unnest([{", ".join(str(q) for q in _DYQ_QS)}]) AS q),
picks AS (
  SELECT c.l_returnflag, t.n, u.q,
         CAST(ceil(u.q * t.n) AS BIGINT) AS rank_r,
         MIN(c.bucket) AS bucket
  FROM totals t
  JOIN qs u ON TRUE
  JOIN cum c ON c.l_returnflag = t.l_returnflag
            AND c.cum >= CAST(ceil(u.q * t.n) AS BIGINT)
  GROUP BY 1, 2, 3, 4
)
SELECT p.l_returnflag, p.q, p.n, p.rank_r, p.bucket,
       CAST(p.bucket * {1 << _DYQ_SHIFT} + {1 << (_DYQ_SHIFT - 1)} AS BIGINT) AS est_cents,
       CAST(p.bucket * {1 << _DYQ_SHIFT} + {1 << (_DYQ_SHIFT - 1)} AS DOUBLE) / 100
         AS est_dollars,
       s.n_buckets, s.hist_md5,
       s.hist_md5 = m.mmd5 AS merge_consistent
FROM picks p
JOIN sig s USING (l_returnflag)
JOIN msig m USING (l_returnflag)
ORDER BY p.l_returnflag, p.q
"""


@query(
    "dyadic_quantile_sketch",
    survey="sketch-quantile,A7(approx)",
    oracle=DYADIC_QUANTILE_ORACLE,
)
def dyadic_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic-bucket QUANTILE histogram per return flag — the fixed-bin
    mergeable quantile structure (the Prometheus/OTel histogram shape)
    that completes the deterministic sketch family: distinct (HLL/KMV),
    frequency (Count-Min/Misra-Gries), membership (Bloom), QUANTILE
    (this). Prices collapse to 4096-cent buckets in one map-side-
    combinable groupBy (exchange bounded by groups x range/4096 rows);
    p50/p95/p99 reads walk the cumulative counts over the TINY bucket
    table (a window over ~2.5k rows per group, never over the data) and
    report the bucket midpoint — error <= half a bucket width BY
    CONSTRUCTION, the trade a fixed-bin histogram makes against GK/KLL
    (whose order-dependent compactions no SQL engine restates
    bit-exactly; this one is a plain integer aggregate, so the bucket
    TABLE hash-compares — canonical CSV -> md5 — and the in-query merge
    proof (parity halves -> cell-sum -> same md5) pins mergeability).
    Cents derive through the exact DECIMAL(18,2) route (_util
    discipline), so every number here is integer until one display
    division. Complements sketch_profile's GK built-in (bound booleans
    only) with register-level cross-engine agreement."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("l_orderkey") + F.col("l_linenumber")).alias("par"),
    )
    g = ["l_returnflag"]
    hist = dyadic_histogram(base, g, "cents", _DYQ_SHIFT)

    def csv_md5(h, out):
        return h.groupBy(*g).agg(
            F.count(F.lit(1)).cast("int").alias("n_buckets"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("bucket", "cnt"))),
                        lambda s: F.concat_ws(
                            ":", s["bucket"].cast("string"), s["cnt"].cast("string")
                        ),
                    ),
                ).cast("binary")
            ).alias(out),
        )

    sig = csv_md5(hist, "hist_md5")
    even = dyadic_histogram(base.filter(F.col("par") % 2 == 0), g, "cents", _DYQ_SHIFT)
    odd = dyadic_histogram(base.filter(F.col("par") % 2 == 1), g, "cents", _DYQ_SHIFT)
    merged = (
        even.unionByName(odd).groupBy(*g, "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    msig = csv_md5(merged, "mmd5").select(*g, "mmd5")
    picks = dyadic_quantile_picks(hist, g, list(_DYQ_QS), _DYQ_SHIFT)
    totals = hist.groupBy(*g).agg(F.sum("cnt").alias("n"))
    return (
        picks.join(totals, g)
        .join(sig, g)
        .join(msig, g)
        .select(
            "l_returnflag",
            "q",
            "n",
            "rank_r",
            "bucket",
            "est_cents",
            (F.col("est_cents").cast("double") / 100).alias("est_dollars"),
            "n_buckets",
            "hist_md5",
            (F.col("hist_md5") == F.col("mmd5")).alias("merge_consistent"),
        )
        .orderBy("l_returnflag", "q")
    )
