"""SportsAnalyticsEngine on small literal sports data — validates the
reference's analytics contract semantics (form points, H2H shares,
standings ordering, segmentation) against hand-computed expectations."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from sport_data_pipeline_spark.engine import SportsAnalyticsEngine


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def tables(spark):
    players = spark.createDataFrame(
        [
            (1, "Leo", "Star", dt.date(2000, 1, 1), "FW", Decimal("50000000.00")),
            (2, "Max", "Wall", dt.date(1994, 6, 1), "DF", Decimal("2000000.00")),
            (3, "Sam", "Mid", dt.date(1999, 3, 1), "MF", Decimal("8000000.00")),
        ],
        "player_id long, first_name string, last_name string, birth_date date, "
        "position string, market_value decimal(14,2)",
    )
    teams = spark.createDataFrame(
        [(10, "Reds"), (20, "Blues"), (30, "Greens")], "team_id long, name string"
    )
    sps = spark.createDataFrame(
        [
            (1, 10, "2024", 20, 18, 5),
            (1, 10, "2023", 20, 12, 3),
            (2, 20, "2024", 22, 1, 0),
            (3, 30, "2024", 15, 6, 9),
        ],
        "player_id long, team_id long, season string, matches_played int, goals int, assists int",
    )
    matches = spark.createDataFrame(
        [
            # match_id, home, away, home_score, away_score, date, status
            (100, 10, 20, 3, 1, ts("2024-08-01T15:00"), "finished"),
            (101, 20, 30, 2, 2, ts("2024-08-08T15:00"), "finished"),
            (102, 30, 10, 0, 1, ts("2024-08-15T15:00"), "finished"),
            (103, 10, 30, 2, 0, ts("2024-08-22T15:00"), "finished"),
            (104, 20, 10, 1, 1, ts("2024-08-29T15:00"), "finished"),
            (105, 10, 20, 0, 0, ts("2024-09-05T15:00"), "scheduled"),
        ],
        "match_id long, home_team_id long, away_team_id long, home_score int, "
        "away_score int, match_date timestamp, status string",
    ).withColumn("season", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("2024"))
    market_values = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), Decimal("40000000.00"), "tm"),
            (1, dt.date(2024, 7, 1), Decimal("50000000.00"), "tm"),
            (2, dt.date(2024, 7, 1), Decimal("2000000.00"), "tm"),
        ],
        "player_id long, valuation_date date, market_value decimal(14,2), source string",
    )
    odds = spark.createDataFrame(
        [
            (100, "bookie", "1x2", "home", "open", Decimal("2.1000"), ts("2024-07-30T10:00")),
            (100, "bookie", "1x2", "home", "live", Decimal("1.8000"), ts("2024-08-01T14:00")),
            (100, "bookie", "1x2", "home", "close", Decimal("1.6500"), ts("2024-08-01T14:55")),
        ],
        "match_id long, bookmaker string, market string, outcome string, "
        "price_type string, price decimal(10,4), ts timestamp",
    )
    pms = spark.createDataFrame(
        [(100, 1, 10, 2, 1), (101, 3, 30, 1, 0), (102, 1, 10, 1, 0)],
        "match_id long, player_id long, team_id long, goals int, assists int",
    )
    return {
        "players": players,
        "teams": teams,
        "season_player_stats": sps,
        "matches": matches,
        "market_values": market_values,
        "odds_ticks": odds,
        "player_match_stats": pms,
    }


@pytest.fixture()
def eng(tables):
    return SportsAnalyticsEngine(tables, as_of_date=dt.date(2025, 1, 1))


def test_top_performers_ordering_and_rates(eng):
    rows = eng.get_top_performers(season="2024").collect()
    assert [r["player_id"] for r in rows] == [1, 3, 2]
    top = rows[0]
    assert top["player_name"] == "Leo Star"
    assert top["goal_contributions"] == 23
    assert top["age"] == 25  # born 2000-01-01, as-of 2025-01-01
    assert abs(top["contributions_per_match"] - 23 / 20) < 1e-12


def test_player_analysis_pack(eng):
    packs = eng.analyze_player_performance(season="2024")
    s = packs["summary"].collect()[0]
    assert s["player_count"] == 3
    trends = {(r["player_id"], r["season"]): r["goals_trend"]
              for r in packs["trends"].collect()}
    assert trends[(1, "2023")] == "new"
    assert trends[(1, "2024")] == "improving"
    comp = {r["player_id"]: r for r in packs["comparisons"].collect()}
    # each player is the sole member of their position peer group → own
    # goals equal the peer average, so nobody is strictly above it
    assert not comp[1]["above_average"]
    assert comp[1]["peer_avg_goals"] == 18.0
    assert comp[2]["percentile_rank"] == 0.0  # lowest scoring rate


def test_team_form_points(eng):
    """Reds: W(100) W(102 away) W(103) D(104 away) = 3 finished in last 5 → 10 pts from 4."""
    form = {r["team_id"]: r for r in eng.team_form(last_n=5).collect()}
    assert form[10]["form_points"] == 10  # 3 wins + 1 draw
    assert form[10]["matches_counted"] == 4
    assert form[20]["form_points"] == 2  # D, L, D
    assert form[30]["form_points"] == 1  # D, L, L


def test_head_to_head_share(eng):
    h2h = {(r["team_a"], r["team_b"]): r for r in eng.head_to_head().collect()}
    p = h2h[(10, 20)]
    # meetings 100 (3-1 home win), 104 (1-1): a=10 wins 1, draws 1 → (1+0.5)/2
    assert p["meetings"] == 2 and p["a_wins"] == 1 and p["draws"] == 1
    assert abs(p["a_win_share"] - 0.75) < 1e-12


def test_standings_order(eng):
    rows = eng.standings("2024").collect()
    by_pos = sorted(rows, key=lambda r: r["position"])
    assert [r["team_id"] for r in by_pos] == [10, 20, 30]
    top = by_pos[0]
    assert (top["played"], top["won"], top["drawn"], top["points"]) == (4, 3, 1, 10)


def test_league_analytics_rates(eng):
    s = eng.generate_league_analytics("2024")["summary"].collect()[0]
    assert s["matches_played"] == 5
    assert abs(s["home_win_rate"] - 2 / 5) < 1e-12
    assert abs(s["draw_rate"] - 2 / 5) < 1e-12
    assert abs(s["avg_goals_per_match"] - 13 / 5) < 1e-12


def test_transfer_segmentation(eng):
    seg = eng.transfer_analysis()
    # Leo (25, €50M) and Sam (25, €8M) both satisfy age ≤ 25 ∧ value ≥ 5M
    assert sorted(r["player_id"] for r in seg["hot_prospects"].collect()) == [1, 3]
    assert [r["player_id"] for r in seg["bargains"].collect()] == [2]
    bands = {r["age_band"]: r["n_players"] for r in seg["age_bands"].collect()}
    assert bands == {"24-27": 2, "28-30": 1}


def test_weekly_summary(eng):
    pack = eng.weekly_summary("2024-08-01", "2024-08-16")
    o = pack["overview"].collect()[0]
    assert o["matches_played"] == 3
    top = pack["top_performers"].collect()
    assert top[0]["player_id"] == 1 and top[0]["goals"] == 3


def test_latest_market_values(eng):
    latest = {r["player_id"]: r["market_value"] for r in eng.latest_market_values().collect()}
    assert latest[1] == Decimal("50000000.00")


def test_odds_movement(eng):
    r = eng.odds_movement().collect()[0]
    assert r["open_price"] == 2.1 and r["close_price"] == 1.65
    assert abs(r["open_implied_prob"] - 1 / 2.1) < 1e-12
    assert abs(r["price_drift"] - (1.65 - 2.1)) < 1e-12


def test_player_performance_full_report_contract(spark):
    """The §2.11 consumer contract (reference reports.py:44-90): every field
    the player report renders must exist, and the predictions block must
    carry the OLS forecast. Player 1 scores a perfect line 2,4,6,8 → slope
    2, next-season prediction 10 with a zero-width interval."""
    players = spark.createDataFrame(
        [(1, "Leo", "Star", dt.date(2000, 1, 1), "FW"),
         (2, "Max", "Wall", dt.date(1994, 6, 1), "DF")],
        "player_id long, first_name string, last_name string, birth_date date, position string",
    )
    teams = spark.createDataFrame([(10, "Reds"), (20, "Blues")], "team_id long, name string")
    sps = spark.createDataFrame(
        [(1, 10, "2021", 10, 2, 1), (1, 10, "2022", 12, 4, 2),
         (1, 10, "2023", 14, 6, 2), (1, 10, "2024", 16, 8, 3),
         (2, 20, "2024", 20, 1, 0)],
        "player_id long, team_id long, season string, matches_played int, goals int, assists int",
    )
    eng2 = SportsAnalyticsEngine(
        {"players": players, "teams": teams, "season_player_stats": sps},
        as_of_date=dt.date(2025, 1, 1),
    )
    packs = eng2.analyze_player_performance()
    assert set(packs) == {"summary", "player_summary", "trends", "comparisons", "predictions"}

    ps = {r["player_id"]: r for r in packs["player_summary"].collect()}
    assert set(ps[1].asDict()) == {
        "player_id", "player_name", "team", "age", "seasons_analyzed",
        "total_matches", "total_goals", "total_assists", "goals_per_match",
        "performance_score",
    }
    assert ps[1]["player_name"] == "Leo Star"
    assert ps[1]["seasons_analyzed"] == 4
    assert ps[1]["total_goals"] == 20
    assert abs(ps[1]["performance_score"] - round((20 / 52) * 4 + (8 / 52) * 3, 2)) < 1e-9

    tr = {(r["player_id"], r["season"]): r for r in packs["trends"].collect()}
    assert tr[(1, "2022")]["goals_trend"] == "improving"
    assert tr[(1, "2022")]["assists_trend"] == "improving"
    assert tr[(1, "2023")]["assists_trend"] == "stable"
    assert tr[(1, "2024")]["trend_direction"] == "improving"
    assert tr[(2, "2024")]["trend_direction"] == "new"

    comp = {r["player_id"]: r for r in packs["comparisons"].collect()}
    assert comp[1]["peer_group_size"] == 4  # player 1 has four FW season rows
    assert comp[2]["peer_group_size"] == 1

    pred = {r["player_id"]: r for r in packs["predictions"].collect()}
    assert set(pred) == {1}  # player 2 lacks the 3-season minimum
    p1 = pred[1]
    assert p1["n_points"] == 4
    assert abs(p1["predicted_goals_next_season"] - 10.0) < 1e-9
    assert abs(p1["confidence_lower"] - 10.0) < 1e-9  # SSE = 0 → zero width
    assert abs(p1["confidence_upper"] - 10.0) < 1e-9


def test_comparisons_plan_distributed_rank(eng):
    # same shape requirement as percentile_peer (VERDICT r7 #1): the
    # engine's peer-comparison percentile must not use an unpartitioned
    # percent_rank window over the player table.
    plan = (
        eng.analyze_player_performance()["comparisons"]
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percent_rank" not in plan
    assert "Exchange rangepartitioning" in plan


def test_approx_distinct_paths_consume_sketches(eng):
    """approx_distinct=True swaps the pack summaries' exact distinct
    counts for the deterministic sketch estimates (HLL for league teams,
    KMV for player count) under the SAME column names. At unit scale
    both sketches are exact (cardinality far below 2^p registers / k
    hashes), so the swap is value-identical here; the error bounds at
    real cardinality are pinned by test_sketches + the driver rows."""
    exact = eng.generate_league_analytics("2024")["summary"].collect()[0]
    approx = eng.generate_league_analytics("2024", approx_distinct=True)[
        "summary"
    ].collect()[0]
    assert approx["total_teams"] == exact["total_teams"]
    # every non-distinct field stays exact, bit-for-bit
    for f in (
        "matches_played", "total_goals", "avg_goals_per_match",
        "home_win_rate", "draw_rate", "away_win_rate", "high_scoring_share",
    ):
        assert approx[f] == exact[f], f
    assert approx.__fields__ == exact.__fields__

    pe = eng.analyze_player_performance(season="2024")["summary"].collect()[0]
    pa = eng.analyze_player_performance(season="2024", approx_distinct=True)[
        "summary"
    ].collect()[0]
    assert pa["player_count"] == pe["player_count"] == 3
    assert pa["avg_goals_per_match"] == pe["avg_goals_per_match"]


def test_approx_distinct_bounded_at_cardinality(spark):
    """At cardinality where the estimators actually estimate, both stay
    inside their 5-sigma contracts (HLL p=8: 32.5%; KMV k=256: 31.3%)."""
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.operators.sketches import (
        hll_registers,
        hll_sketch_summary,
        kmv_bottomk,
        kmv_estimate_literal,
    )

    n = 20_000
    df = spark.range(n).select((F.col("id") * 2654435761 % 1000003).alias("v"))
    true = df.select("v").distinct().count()

    est_hll = hll_sketch_summary(hll_registers(df, [], "v"), []).collect()[0]["est"]
    assert abs(est_hll - true) / true < 0.325

    k = 256
    sk = kmv_bottomk(df, "v", k)
    row = sk.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")).collect()[0]
    est_kmv = (
        row["n"] if row["n"] < k else kmv_estimate_literal(k) / float(row["hk"])
    )
    assert abs(est_kmv - true) / true < 0.313


def test_transfer_value_stats_approx_quantiles_within_half_bucket(eng):
    """approx_quantiles=True swaps the exact per-position median for the
    dyadic-histogram pick under the same column names; avg/total stay
    exact and the median lands within half a bucket (2^11 cents) of the
    exact percentile."""
    exact = {r["position"]: r for r in eng.transfer_analysis()["value_stats"].collect()}
    approx = {
        r["position"]: r
        for r in eng.transfer_analysis(approx_quantiles=True)["value_stats"].collect()
    }
    assert set(approx) == set(exact)
    half_bucket_eur = (1 << 11) / 100
    for pos, e in exact.items():
        a = approx[pos]
        assert a["avg_value"] == e["avg_value"]
        assert a["total_value"] == e["total_value"]
        assert abs(a["median_value"] - e["median_value"]) <= half_bucket_eur, pos
        assert list(a.__fields__) == list(e.__fields__)


def test_transfer_approx_quantiles_ignores_null_values(spark, tables):
    """percentile() ignores NULL market_value (nullable per schema —
    parse_market_value yields NULL for 'n/a'); the dyadic-histogram path
    must apply the same NULL semantics or NULL rows enter the cumulative
    walk as a leading bucket and skew every pick (the r13 advice repro:
    5 real values + 4 NULLs gave approx 102.4 vs exact 300.0)."""
    from pyspark.sql import functions as F

    players = spark.createDataFrame(
        [(i, "P", str(i), dt.date(1998, 1, 1), "FW",
          Decimal(v) if v is not None else None)
         for i, v in enumerate(
             ["100.00", "200.00", "300.00", "400.00", "500.00",
              None, None, None, None])],
        "player_id long, first_name string, last_name string, "
        "birth_date date, position string, market_value decimal(14,2)",
    )
    eng = SportsAnalyticsEngine(
        {**tables, "players": players}, as_of_date=dt.date(2025, 1, 1)
    )
    exact = eng.transfer_analysis()["value_stats"].collect()[0]
    approx = eng.transfer_analysis(approx_quantiles=True)["value_stats"].collect()[0]
    assert exact["median_value"] == 300.0
    half_bucket_eur = (1 << 11) / 100
    assert abs(approx["median_value"] - exact["median_value"]) <= half_bucket_eur
    assert approx["avg_value"] == exact["avg_value"]


def test_hll_count_threads_precision_through(spark, tables):
    """_hll_count(p=...) must build its registers at the SAME precision it
    estimates with — a p=10 call that silently built p=8 registers mixes
    register width with estimator constants and drifts (the r13 advice's
    latent bug)."""
    from pyspark.sql import functions as F

    eng = SportsAnalyticsEngine(tables, as_of_date=dt.date(2025, 1, 1))
    df = spark.range(5000).select((F.col("id") * 2654435761 % 999983).alias("v"))
    true = df.select("v").distinct().count()
    for p in (8, 10, 12):
        est = eng._hll_count(df, "v", "n", p=p).collect()[0]["n"]
        # 5-sigma bound: 5 * 1.04 / sqrt(2^p)
        assert abs(est - true) / true < 5 * 1.04 / (1 << p) ** 0.5, p


def test_standings_per_season_partitioned_matches_filtered(spark, tables):
    """per_season=True ranks WITHIN each season through one PARTITIONED
    window (the scale path for a multi-season table) and must equal the
    per-season filtered global call season by season."""
    import pyspark.sql.functions as F

    m24 = tables["matches"]
    m23 = (
        m24.withColumn("season", F.lit("2023"))
        .withColumn("match_id", F.col("match_id") + 1000)
        # swap the scores (simultaneous, via withColumns) so the two
        # seasons' tables genuinely differ
        .withColumns({"home_score": F.col("away_score"), "away_score": F.col("home_score")})
    )
    t2 = dict(tables)
    t2["matches"] = m24.unionByName(m23)
    eng2 = SportsAnalyticsEngine(t2, as_of_date=dt.date(2025, 1, 1))

    per = eng2.standings(per_season=True)
    # the window is partitioned: no "No Partition Defined" single-sort
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan
    got = {
        (r["season"], r["team_id"]): (r["position"], r["points"], r["played"])
        for r in per.collect()
    }
    want = {}
    for s in ("2023", "2024"):
        for r in eng2.standings(season=s).collect():
            want[(s, r["team_id"])] = (r["position"], r["points"], r["played"])
    assert got == want
