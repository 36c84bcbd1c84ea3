"""Per-key linear-trend forecasting with prediction intervals (SURVEY.md
§2.11: the reference's declared-but-placeholder `predictions` block —
src/analytics/reports.py:88-90 consumes `predicted_goals_next_season` +
`confidence_lower/upper`; nothing in the reference ever produces them).

Spark-first design: one groupBy per key computing the five OLS sufficient
statistics (n, Σx, Σy, Σxy, Σx², Σy²), then slope/intercept/interval as a
closed-form expression — no iteration, no UDF, one shuffle total. With an
integer metric the sufficient statistics are EXACT (long arithmetic), so
the forecast is bit-identical in any engine evaluating the same closed
form — which is what makes the operator oracle-checkable, unlike an
MLlib regressor whose fit depends on partitioning.

The interval is the standard OLS prediction interval for the next point:
    pred ± t_{0.975, n-2} · s · sqrt(1 + 1/n + (x0 - x̄)² / Sxx)
with s² = SSE/(n-2). At 100 TB this is one partial-aggregable shuffle on
the key — the same profile as any grouped sum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

#: two-sided 95% Student-t critical values for df = 1..30; df > 30 → 1.96.
#: Shared constants with the DuckDB oracle — both engines index this table.
T_CRIT_95 = [
    12.706, 4.303, 3.182, 2.776, 2.571, 2.447, 2.365, 2.306, 2.262, 2.228,
    2.201, 2.179, 2.160, 2.145, 2.131, 2.120, 2.110, 2.101, 2.093, 2.086,
    2.080, 2.074, 2.069, 2.064, 2.060, 2.056, 2.052, 2.048, 2.045, 2.042,
]


def _t_crit(df_col: Column) -> Column:
    table = F.array(*[F.lit(t) for t in T_CRIT_95])
    return F.when(df_col > 30, F.lit(1.96)).otherwise(
        F.element_at(table, df_col.cast("int"))
    )


def linear_trend_forecast(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    y_col: str,
    min_points: int = 3,
) -> DataFrame:
    """OLS forecast of ``y_col`` one step past the last observation, per key.

    ``order_col`` only needs a total order per key (season label, year);
    observations are ranked 1..n per key and the forecast targets x0 = n+1.
    Keys with fewer than ``min_points`` observations (df = n-2 < 1) are
    dropped — the reference's "insufficient data for predictions" branch.

    Returns one row per key: (key_cols..., n_points, slope, intercept,
    prediction, ci_lower, ci_upper).
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    ranked = df.select(
        *keys,
        F.row_number().over(w).alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    ).filter(F.col("n_points") >= max(min_points, 3))

    n = F.col("n_points").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")

    cxx = sxx - sx * sx / n          # Sxx (centered)
    cxy = sxy - sx * sy / n          # Sxy
    cyy = syy - sy * sy / n          # Syy
    slope = cxy / cxx                # x ranks are distinct ⇒ cxx > 0
    intercept = sy / n - slope * sx / n
    x0 = n + 1
    pred = intercept + slope * x0
    sse = F.greatest(cyy - slope * cxy, F.lit(0.0))  # clamp float jitter
    s2 = sse / (n - 2)
    half = _t_crit(F.col("n_points") - 2) * F.sqrt(
        s2 * (1 + 1 / n + (x0 - sx / n) * (x0 - sx / n) / cxx)
    )
    return agg.select(
        *key_cols,
        "n_points",
        slope.alias("slope"),
        intercept.alias("intercept"),
        pred.alias("prediction"),
        (pred - half).alias("ci_lower"),
        (pred + half).alias("ci_upper"),
    )
