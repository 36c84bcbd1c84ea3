"""SportsAnalyticsEngine — the reference's analytics contract, DataFrame-native.

Re-expresses the API surface of the reference's ``AnalyticsEngine``
(src/analytics/engine.py) and report producers (src/analytics/reports.py)
over the unified silver catalog (schemas.py). Every method returns a lazy
DataFrame — nothing collects inside the engine (the reference pulls rows
into pandas per query, engine.py:262-292; here Catalyst owns the whole
plan and only the serving edge collects).

The declared-but-unimplemented analytics (SURVEY.md §2.11 — player trends,
peer percentiles, league dashboard fields) are implemented from the
consumer contract in reports.py:44-90 and :158-213.

Determinism: ``as_of_date`` parameterizes every "today" computation
(reference uses datetime.now(), engine.py:43-44 — irreproducible).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window, functions as F

from .operators.joins import symmetric_pair_key
from .operators.windows import (
    global_percent_rank,
    last_n_per_key,
    latest_per_key,
    rank_standings,
)
from .plans._util import safe_div


class SportsAnalyticsEngine:
    """Analytics over a dict of silver-table DataFrames.

    ``tables`` must contain the silver tables a method touches (players,
    teams, matches, season_player_stats, market_values, odds_ticks,
    transfers); see schemas.SILVER_TABLES for shapes.
    """

    def __init__(self, tables: dict[str, DataFrame], as_of_date: dt.date | None = None):
        self.t = tables
        self.as_of = F.lit((as_of_date or dt.date(2026, 1, 1)).isoformat()).cast("date")

    # -- helpers ----------------------------------------------------------

    def _age(self, birth_date: F.Column) -> F.Column:
        """EXTRACT(YEAR FROM AGE(birth_date)) equivalent (engine.py:305)."""
        return F.floor(F.months_between(self.as_of, birth_date) / 12).cast("int")

    def _player_season_base(self, season: str | None = None) -> DataFrame:
        """The shared 3-way join behind player analytics (engine.py:299-312):
        players ⋈ season_player_stats ⋈ teams, null-tolerant season filter."""
        p, sps, teams = self.t["players"], self.t["season_player_stats"], self.t["teams"]
        if season is not None:  # P2 null-tolerant parameter filter
            sps = sps.filter(F.col("season") == season)
        return (
            p.join(sps, "player_id")
            .join(F.broadcast(teams.select("team_id", F.col("name").alias("team_name"))), "team_id")
        )

    # -- reference API surface -------------------------------------------

    def get_top_performers(self, season: str | None = None, limit: int = 20) -> DataFrame:
        """Top performers by goal contributions (engine.py:336-352): computed
        name, contributions = goals+assists, safe per-match rate, top-K."""
        base = self._player_season_base(season)
        contributions = (F.col("goals") + F.col("assists")).alias("goal_contributions")
        per_match = safe_div(
            (F.col("goals") + F.col("assists")).cast("double"), F.col("matches_played")
        ).alias("contributions_per_match")
        return (
            base.filter(F.col("matches_played") >= 1)
            .select(
                "player_id",
                F.concat_ws(" ", "first_name", "last_name").alias("player_name"),
                "team_name",
                "position",
                self._age(F.col("birth_date")).alias("age"),
                "matches_played",
                "goals",
                "assists",
                contributions,
                per_match,
            )
            .orderBy(F.desc("goal_contributions"), F.asc("player_id"))
            .limit(limit)
        )

    def _kmv_count(self, df: DataFrame, col: str, out: str, k: int = 256) -> DataFrame:
        """One-row KMV distinct-count estimate (column ``out``, long).

        Exact below k distinct values (the sketch holds every hash), the
        (k-1)·2^60/h_k estimator above — ~1/√k relative error (6% at
        k=256). The scan combines map-side and the bottom-k plans as
        TakeOrderedAndProject: at 100 TB this replaces countDistinct's
        all-keys exchange with a k-row merge."""
        from .operators.sketches import kmv_bottomk, kmv_estimate_literal

        sk = kmv_bottomk(df, col, k)
        return sk.agg(
            F.count(F.lit(1)).alias("__n"), F.max("h").alias("__hk")
        ).select(
            F.round(
                F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
                    F.lit(kmv_estimate_literal(k)) / F.col("__hk").cast("double")
                )
            )
            .cast("long")
            .alias(out)
        )

    def _hll_count(self, df: DataFrame, col: str, out: str, p: int = 8) -> DataFrame:
        """One-row HLL distinct-count estimate (column ``out``, long).

        The register build is the scale story: map-side max per (reg),
        ≤ 2^p rows ever shuffle — vs countDistinct's all-keys exchange.
        Unlike the cross-engine-oracled sketch queries (which pin the
        raw estimator because ln is not bit-portable), this ENGINE
        consumer applies Flajolet's small-range correction — linear
        counting m·ln(m/(m - n_registers)) when the raw estimate is
        ≤ 2.5m — so league-sized cardinalities (~20 teams) come back
        right, not raw-regime garbage."""
        from .operators.sketches import hll_registers, hll_sketch_summary

        m = 1 << p
        s = hll_sketch_summary(hll_registers(df, [], col, p), [], p)
        lc = F.lit(float(m)) * F.log(
            F.lit(float(m)) / (F.lit(m) - F.col("n_registers")).cast("double")
        )
        est = (
            F.when(F.col("n_registers") == 0, F.lit(0.0))
            .when((F.col("est") <= 2.5 * m) & (F.col("n_registers") < m), lc)
            .otherwise(F.col("est"))
        )
        return s.select(F.round(est).cast("long").alias(out))

    def analyze_player_performance(
        self, season: str | None = None, approx_distinct: bool = False
    ) -> dict[str, DataFrame]:
        """Player performance pack (engine.py:299-327 + the §2.11 declared
        contract): summary aggregates, per-player report fields, trends
        across seasons, peer-group percentile comparison, and next-season
        forecasts.

        The report consumer (reference reports.py:44-90) dictates the
        field set; the reference never computes performance_score,
        trend_direction, or the predictions block (declared-only), so
        their semantics are defined here: performance_score is the
        weighted contribution rate 4·goals/match + 3·assists/match,
        trend_direction is the sign of the mean season-over-season goals
        delta, and predictions come from the closed-form OLS forecast
        (operators/forecast.py) — deterministic, shuffle-once, no UDFs.

        ``approx_distinct=True`` swaps the summary's exact
        ``player_count`` for the KMV bottom-k estimate (same column
        name; ~6% relative error at k=256, exact under 256 players) —
        the 100 TB path where countDistinct's all-keys exchange is the
        bottleneck. All other summary fields stay exact."""
        from .operators.forecast import linear_trend_forecast

        base = self._player_season_base(season)
        if approx_distinct:
            rates = base.agg(
                (F.sum("goals").cast("double") / F.sum("matches_played")).alias("avg_goals_per_match"),
                (F.sum("assists").cast("double") / F.sum("matches_played")).alias("avg_assists_per_match"),
            )
            summary = self._kmv_count(base, "player_id", "player_count").crossJoin(rates)
        else:
            summary = base.agg(
                F.countDistinct("player_id").alias("player_count"),
                (F.sum("goals").cast("double") / F.sum("matches_played")).alias("avg_goals_per_match"),
                (F.sum("assists").cast("double") / F.sum("matches_played")).alias("avg_assists_per_match"),
            )

        gpm = safe_div(F.col("total_goals").cast("double"), F.col("total_matches"))
        apm = safe_div(F.col("total_assists").cast("double"), F.col("total_matches"))
        player_summary = (
            base.withColumn(
                "__pname", F.concat_ws(" ", "first_name", "last_name")
            )
            .groupBy("player_id", "__pname", "team_name", "birth_date")
            .agg(
                F.countDistinct("season").alias("seasons_analyzed"),
                F.sum("matches_played").alias("total_matches"),
                F.sum("goals").alias("total_goals"),
                F.sum("assists").alias("total_assists"),
            )
            .select(
                "player_id",
                F.col("__pname").alias("player_name"),
                F.col("team_name").alias("team"),
                self._age(F.col("birth_date")).alias("age"),
                "seasons_analyzed",
                "total_matches",
                "total_goals",
                "total_assists",
                gpm.alias("goals_per_match"),
                F.round(gpm * 4 + apm * 3, 2).alias("performance_score"),
            )
        )

        w_season = Window.partitionBy("player_id").orderBy("season")
        w_player = Window.partitionBy("player_id")
        prev_goals = F.lag("goals").over(w_season)
        prev_assists = F.lag("assists").over(w_season)
        mean_delta = F.avg(F.col("goals") - prev_goals).over(w_player)
        trends = self.t["season_player_stats"].select(
            "player_id",
            "season",
            "goals",
            (F.col("goals") - prev_goals).alias("goals_delta"),
            F.when(prev_goals.isNull(), "new")
            .when(F.col("goals") > prev_goals, "improving")
            .when(F.col("goals") < prev_goals, "declining")
            .otherwise("stable")
            .alias("goals_trend"),
            F.when(prev_assists.isNull(), "new")
            .when(F.col("assists") > prev_assists, "improving")
            .when(F.col("assists") < prev_assists, "declining")
            .otherwise("stable")
            .alias("assists_trend"),
            F.when(mean_delta.isNull(), "new")
            .when(mean_delta > 0, "improving")
            .when(mean_delta < 0, "declining")
            .otherwise("stable")
            .alias("trend_direction"),
            F.round(F.stddev_pop("goals").over(w_player), 4).alias("consistency"),
        )

        # Global percentile rank computed distributively (range-partition +
        # broadcast offsets, operators/windows.py:global_percent_rank) — the
        # naive percent_rank() OVER (ORDER BY ...) would single-partition
        # the whole player table. Peer stats are a grouped aggregate
        # broadcast-joined back (positions are low-cardinality), not a
        # second full-table window pass.
        rate = safe_div(F.col("goals").cast("double"), F.col("matches_played"))
        ranked = global_percent_rank(
            base.select("player_id", "position", "goals", rate.alias("goals_per_match")),
            ["goals_per_match", "player_id"],
            out_col="percentile_rank",
        )
        peers = base.groupBy("position").agg(
            F.avg(F.col("goals")).alias("peer_avg_goals"),
            F.count(F.lit(1)).alias("peer_group_size"),
        )
        comparisons = ranked.join(F.broadcast(peers), "position").select(
            "player_id",
            "position",
            "goals_per_match",
            "percentile_rank",
            "peer_avg_goals",
            (F.col("goals") > F.col("peer_avg_goals")).alias("above_average"),
            "peer_group_size",
        )

        predictions = linear_trend_forecast(
            self.t["season_player_stats"], ["player_id"], "season", "goals"
        ).select(
            "player_id",
            "n_points",
            F.col("prediction").alias("predicted_goals_next_season"),
            F.col("ci_lower").alias("confidence_lower"),
            F.col("ci_upper").alias("confidence_upper"),
        )
        return {
            "summary": summary,
            "player_summary": player_summary,
            "trends": trends,
            "comparisons": comparisons,
            "predictions": predictions,
        }

    def team_form(self, last_n: int = 5) -> DataFrame:
        """Per-team last-N form (engine.py:137-191 rewritten as one window
        job — W1/A8): union home/away perspectives, rank by date, aggregate
        points 3/1/0 and goal averages."""
        m = self.t["matches"].filter(F.col("status") == "finished")
        home = m.select(
            F.col("home_team_id").alias("team_id"),
            "match_id",
            "match_date",
            F.col("home_score").alias("gf"),
            F.col("away_score").alias("ga"),
        )
        away = m.select(
            F.col("away_team_id").alias("team_id"),
            "match_id",
            "match_date",
            F.col("away_score").alias("gf"),
            F.col("home_score").alias("ga"),
        )
        persp = home.unionByName(away)
        recent = last_n_per_key(persp, ["team_id"], ["match_date", "match_id"], last_n)
        points = (
            F.when(F.col("gf") > F.col("ga"), 3).when(F.col("gf") == F.col("ga"), 1).otherwise(0)
        )
        return recent.groupBy("team_id").agg(
            F.count(F.lit(1)).alias("matches_counted"),
            F.sum(points).alias("form_points"),
            F.avg(F.col("gf").cast("double")).alias("avg_goals_for"),
            F.avg(F.col("ga").cast("double")).alias("avg_goals_against"),
        )

    def head_to_head(self) -> DataFrame:
        """H2H win share per team pair (engine.py:193-229 — the O(n²)
        Python loop as a symmetric-key groupBy, J5/A9)."""
        m = self.t["matches"].filter(F.col("status") == "finished")
        pair = symmetric_pair_key("home_team_id", "away_team_id", ("team_a", "team_b"))
        a_is_home = F.col("home_team_id") == F.least("home_team_id", "away_team_id")
        a_score = F.when(a_is_home, F.col("home_score")).otherwise(F.col("away_score"))
        b_score = F.when(a_is_home, F.col("away_score")).otherwise(F.col("home_score"))
        a_win = F.when(a_score > b_score, 1).otherwise(0)
        draw = F.when(a_score == b_score, 1).otherwise(0)
        return m.groupBy(*pair).agg(
            F.count(F.lit(1)).alias("meetings"),
            F.sum(a_win).alias("a_wins"),
            F.sum(draw).alias("draws"),
            # 0.5 default when no decisive meetings (engine.py:226-229)
            F.coalesce(
                (F.sum(a_win) + 0.5 * F.sum(draw)) / F.count(F.lit(1)), F.lit(0.5)
            ).alias("a_win_share"),
        )

    def standings(
        self, season: str | None = None, per_season: bool = False
    ) -> DataFrame:
        """League table from finished matches (A13/W6, schema.sql:491-507).
        ``per_season=True`` keeps every season and ranks WITHIN each (one
        partitioned window — the scale path for a multi-season table);
        the default filters to one season (or pools all, the reference's
        all-time-table shape) and ranks the resulting single tiny table."""
        m = self.t["matches"].filter(F.col("status") == "finished")
        if season is not None:
            m = m.filter(F.col("season") == season)
        season_cols = [F.col("season")] if per_season else []
        home = m.select(
            *season_cols,
            F.col("home_team_id").alias("team_id"),
            F.col("home_score").alias("gf"),
            F.col("away_score").alias("ga"),
        )
        away = m.select(
            *season_cols,
            F.col("away_team_id").alias("team_id"),
            F.col("away_score").alias("gf"),
            F.col("home_score").alias("ga"),
        )
        persp = home.unionByName(away)
        won = F.when(F.col("gf") > F.col("ga"), 1).otherwise(0)
        drawn = F.when(F.col("gf") == F.col("ga"), 1).otherwise(0)
        lost = F.when(F.col("gf") < F.col("ga"), 1).otherwise(0)
        group = (["season"] if per_season else []) + ["team_id"]
        table = persp.groupBy(*group).agg(
            F.count(F.lit(1)).alias("played"),
            F.sum(won).alias("won"),
            F.sum(drawn).alias("drawn"),
            F.sum(lost).alias("lost"),
            F.sum("gf").alias("goals_for"),
            F.sum("ga").alias("goals_against"),
            (F.sum(won) * 3 + F.sum(drawn)).alias("points"),
        ).withColumn("goal_diff", F.col("goals_for") - F.col("goals_against"))
        return rank_standings(
            table,
            [F.desc("points"), F.desc("goal_diff"), F.desc("goals_for"), F.asc("team_id")],
            partition_cols=["season"] if per_season else None,
        )

    def generate_league_analytics(
        self, season: str | None = None, approx_distinct: bool = False
    ) -> dict[str, DataFrame]:
        """League dashboard pack (§2.11 contract from reports.py:111-215:
        summary, home/away/draw rates, high-scoring share, standings).

        ``approx_distinct=True`` swaps the summary's exact
        ``total_teams`` for the deterministic-HLL estimate (same column
        name; register table is at most 256 rows after the map-side max,
        vs countDistinct's all-keys exchange — the 100 TB path), with
        the small-range linear-counting correction so league-sized
        counts stay exact-ish (see ``_hll_count``). All other fields
        stay exact."""
        m = self.t["matches"].filter(F.col("status") == "finished")
        if season is not None:
            m = m.filter(F.col("season") == season)
        total_goals = F.col("home_score") + F.col("away_score")
        if approx_distinct:
            teams = self._hll_count(m, "home_team_id", "total_teams")
            rest = m.agg(
                F.count(F.lit(1)).alias("matches_played"),
                F.sum(total_goals).alias("total_goals"),
                F.avg(total_goals.cast("double")).alias("avg_goals_per_match"),
                (F.sum(F.when(F.col("home_score") > F.col("away_score"), 1).otherwise(0)).cast("double")
                 / F.count(F.lit(1))).alias("home_win_rate"),
                (F.sum(F.when(F.col("home_score") == F.col("away_score"), 1).otherwise(0)).cast("double")
                 / F.count(F.lit(1))).alias("draw_rate"),
                (F.sum(F.when(F.col("home_score") < F.col("away_score"), 1).otherwise(0)).cast("double")
                 / F.count(F.lit(1))).alias("away_win_rate"),
                (F.sum(F.when(total_goals >= 4, 1).otherwise(0)).cast("double")
                 / F.count(F.lit(1))).alias("high_scoring_share"),
            )
            summary = teams.crossJoin(rest).select(
                "total_teams", "matches_played", "total_goals",
                "avg_goals_per_match", "home_win_rate", "draw_rate",
                "away_win_rate", "high_scoring_share",
            )
            return {"summary": summary, "standings": self.standings(season)}
        summary = m.agg(
            F.countDistinct(F.col("home_team_id")).alias("total_teams"),
            F.count(F.lit(1)).alias("matches_played"),
            F.sum(total_goals).alias("total_goals"),
            F.avg(total_goals.cast("double")).alias("avg_goals_per_match"),
            (F.sum(F.when(F.col("home_score") > F.col("away_score"), 1).otherwise(0)).cast("double")
             / F.count(F.lit(1))).alias("home_win_rate"),
            (F.sum(F.when(F.col("home_score") == F.col("away_score"), 1).otherwise(0)).cast("double")
             / F.count(F.lit(1))).alias("draw_rate"),
            (F.sum(F.when(F.col("home_score") < F.col("away_score"), 1).otherwise(0)).cast("double")
             / F.count(F.lit(1))).alias("away_win_rate"),
            (F.sum(F.when(total_goals >= 4, 1).otherwise(0)).cast("double")
             / F.count(F.lit(1))).alias("high_scoring_share"),
        )
        return {"summary": summary, "standings": self.standings(season)}

    def transfer_analysis(self, approx_quantiles: bool = False) -> dict[str, DataFrame]:
        """Transfer segmentation (reports.py:323-495): hot prospects
        (age ≤ 25, value ≥ 5M), bargains (age ≥ 28, value ≤ 3M), position
        counts, age bands, value stats — all engine-side.

        ``approx_quantiles=True`` swaps value_stats' exact
        ``percentile(…, 0.5)`` — which buffers every group's values in
        one task — for the mergeable dyadic-histogram median
        (operators/sketches): per (position, bucket) counts shuffle at
        most |positions|·range/2^shift rows and combine map-side, and
        the error is ≤ half a bucket (2^11 cents ≈ 20 €) BY
        CONSTRUCTION. Same column names; the 100 TB path for a
        value distribution too wide to sort per group."""
        p = self.t["players"].select(
            "player_id",
            F.concat_ws(" ", "first_name", "last_name").alias("player_name"),
            "position",
            self._age(F.col("birth_date")).alias("age"),
            F.col("market_value").cast("double").alias("market_value"),
        )
        hot = p.filter((F.col("age") <= 25) & (F.col("market_value") >= 5e6))
        bargains = p.filter((F.col("age") >= 28) & (F.col("market_value") <= 3e6))
        positions = p.groupBy("position").count()
        band = (
            F.when(F.col("age") <= 23, "u23")
            .when(F.col("age") <= 27, "24-27")
            .when(F.col("age") <= 30, "28-30")
            .when(F.col("age") <= 35, "31-35")
            .otherwise("36+")
        )
        age_bands = p.groupBy(band.alias("age_band")).agg(
            F.count(F.lit(1)).alias("n_players"),
            F.avg("market_value").alias("avg_value"),
        )
        if approx_quantiles:
            from .operators.sketches import dyadic_histogram, dyadic_quantile_picks

            # NULL market_value (parse_market_value yields NULL for 'n/a')
            # must not enter the histogram: percentile() ignores NULLs, so
            # the sketch path filters them too or the cumulative walk
            # counts a NULL bucket and skews every pick.
            cents = p.filter(F.col("market_value").isNotNull()).select(
                "position",
                (F.col("market_value") * 100).cast("long").alias("__cents"),
            )
            hist = dyadic_histogram(cents, ["position"], "__cents")
            med = dyadic_quantile_picks(hist, ["position"], [0.5]).select(
                "position",
                (F.col("est_cents").cast("double") / 100).alias("median_value"),
            )
            value_stats = (
                p.groupBy("position")
                .agg(
                    F.avg("market_value").alias("avg_value"),
                    F.sum("market_value").alias("total_value"),
                )
                .join(med, "position")
                .select("position", "avg_value", "median_value", "total_value")
            )
        else:
            value_stats = p.groupBy("position").agg(
                F.avg("market_value").alias("avg_value"),
                F.expr("percentile(market_value, 0.5)").alias("median_value"),
                F.sum("market_value").alias("total_value"),
            )
        return {
            "hot_prospects": hot,
            "bargains": bargains,
            "positions": positions,
            "age_bands": age_bands,
            "value_stats": value_stats,
        }

    def weekly_summary(self, date_from: str, date_to: str) -> dict[str, DataFrame]:
        """Weekly report (reports.py:497-571): match count + avg total goals
        in range, top performers by per-match stats in range."""
        m = self.t["matches"].filter(
            (F.col("status") == "finished")
            & F.col("match_date").between(date_from, date_to)
        )
        overview = m.agg(
            F.count(F.lit(1)).alias("matches_played"),
            F.avg((F.col("home_score") + F.col("away_score")).cast("double")).alias(
                "avg_total_goals"
            ),
        )
        pms = self.t["player_match_stats"].join(m.select("match_id"), "match_id")
        top = (
            pms.groupBy("player_id")
            .agg(F.sum("goals").alias("goals"), F.sum("assists").alias("assists"))
            .orderBy(F.desc(F.col("goals") + F.col("assists")), F.asc("player_id"))
            .limit(10)
        )
        return {"overview": overview, "top_performers": top}

    def latest_market_values(self) -> DataFrame:
        """Latest valuation per player (W4, schema.sql:986-997).

        market_value breaks valuation_date ties so the surviving row is
        deterministic (the windows module's total-order contract)."""
        return latest_per_key(
            self.t["market_values"], ["player_id"], ["valuation_date", "market_value"]
        )

    def odds_movement(self) -> DataFrame:
        """Open vs close price + implied probabilities per odds key
        (W5/J11/F13, schema.sql:729-745)."""
        o = self.t["odds_ticks"]
        w = Window.partitionBy("match_id", "bookmaker", "market", "outcome").orderBy("ts")
        w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        price_d = F.col("price").cast("double")
        return (
            o.withColumn("open_price", F.first(price_d).over(w_full))
            .withColumn("close_price", F.last(price_d).over(w_full))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "match_id",
                "bookmaker",
                "market",
                "outcome",
                "open_price",
                "close_price",
                (F.lit(1.0) / F.col("open_price")).alias("open_implied_prob"),
                (F.lit(1.0) / F.col("close_price")).alias("close_implied_prob"),
                (F.col("close_price") - F.col("open_price")).alias("price_drift"),
            )
        )

    def contract_expiry_watch(self, months: int = 6) -> DataFrame:
        """Players whose contract ends within N months (reports.py:338:
        ``contract_end <= CURRENT_DATE + INTERVAL '6 months'``)."""
        p = self.t["players"]
        if "contract_end" not in p.columns:
            return p.limit(0).select("player_id")
        return p.filter(
            F.col("contract_end") <= F.add_months(self.as_of, months)
        ).select("player_id", "full_name", "contract_end")
