"""Stream-stream interval join: live conversion attribution.

Reference behavior: the odds/live pollers correlate freshly-scraped events
against recent state imperatively (fetch recent rows, match in Python —
SURVEY.md §2.9). The Spark-native form is a watermarked stream-stream join:
each purchase joins every click by the same user in the trailing
attribution window, with both sides' state bounded by watermarks so the
join buffer cannot grow without bound.

Semantics and the scale contract:

- Both inputs MUST be watermarked; Spark then provably drops click state
  older than ``purchase watermark - window`` and purchase state past its
  own watermark. State size ≈ one attribution window of each stream per
  key — independent of total stream length.
- The join emits ALL (purchase, click) pairs inside the window — the
  streaming-legal output (no per-purchase "latest" aggregation here, which
  would stack a second stateful operator; Spark supports it but the
  batch as-of twin `asof_clicks` / `operators.joins.asof_join` is the
  better place for last-touch semantics, and downstream latest-wins merge
  (`merge_latest`) reduces pairs to last-touch incrementally).
- The interval condition keeps the join an equi-join on ``user_id`` with a
  range residual — a streaming symmetric hash join partitioned by user,
  never a broadcast or nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 3600,
    click_watermark: str = "2 hours",
    purchase_watermark: str = "1 hour",
) -> DataFrame:
    """Join each purchase to the clicks that preceded it within the window.

    ``clicks`` and ``purchases`` are streaming DataFrames with columns
    (user_id, ts, event_id, value); output one row per attributed
    (purchase, click) pair with the click→purchase latency in seconds.
    """
    c = (
        clicks.withWatermark("ts", click_watermark)
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
    )
    p = (
        purchases.withWatermark("ts", purchase_watermark)
        .select(
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (c["user_id"] == p["user_id"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return p.join(c, cond, "inner").select(
        p["user_id"],
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
        "click_value",
        (
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts")))
            / F.lit(1000000.0)
        ).alias("seconds_before_purchase"),
    )
