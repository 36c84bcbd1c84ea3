"""Salted skew join equivalence + streaming observability (T7)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from sport_data_pipeline_spark.operators.joins import salted_join, skew_aware_join
from sport_data_pipeline_spark.streaming.monitor import ProgressRecorder, observe_rates


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _sorted_rows_nullsafe(df):
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def test_salted_join_matches_plain_join(spark):
    # 10k facts, 90% on one hot key — the shape AQE skew-join targets.
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("fact_id"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    )
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], how="inner", salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_left_and_hot_keys(spark):
    left = spark.range(1_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("fact_id")
    )
    right = spark.createDataFrame([(0, "a"), (1, "b")], "k long, v string")
    hot = spark.createDataFrame([(0,)], "k long")
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], how="left", salt=4, hot_keys=hot)
    assert _sorted_rows(salted.select("k", "fact_id", "v")) == _sorted_rows(
        plain.select("k", "fact_id", "v")
    )


def test_skew_aware_join_routes_hot_keys_and_matches_plain(spark):
    """The profile-then-route helper: on a hot-keyed fixture it must
    detect the hot key, route it through the salted path, and still be
    row-identical to the plain join; on uniform data it must decide NOT
    to salt (the plan is the plain join — zero overhead)."""
    # 90% of 10k facts on key 7, 11 distinct keys -> ratio-to-mean 9.9x
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("fact_id"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    )
    plain = left.join(right, ["k"], "inner")
    routed = skew_aware_join(left, right, ["k"], threshold=8.0, salt=8)
    assert _sorted_rows(routed) == _sorted_rows(plain)
    # the hot key was actually salted: the plan carries the salt column
    assert "__salt" in routed._jdf.queryExecution().analyzed().toString()
    # left joins route too
    routed_l = skew_aware_join(left, right, ["k"], how="left", threshold=8.0)
    assert _sorted_rows(routed_l) == _sorted_rows(left.join(right, ["k"], "left"))


def test_skew_aware_join_skips_salting_on_uniform_keys(spark):
    left = spark.range(1_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("fact_id")
    )
    right = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    routed = skew_aware_join(left, right, ["k"], threshold=10.0)
    # no key above threshold -> the returned plan IS the plain join
    assert "__salt" not in routed._jdf.queryExecution().analyzed().toString()
    assert _sorted_rows(routed) == _sorted_rows(left.join(right, ["k"]))


def test_skew_aware_join_hot_null_key_bypasses_join(spark):
    """The commonest real skew shape: a mostly-NULL foreign key. NULL
    never equi-matches, so the hot null group must be routed AROUND the
    join (inner: filtered before the shuffle; left: appended map-only
    with null right columns), never through the salted machinery — and
    the result must stay row-identical to the plain join."""
    # 90% of 5k facts carry a NULL key; the rest spread over 50 keys
    left = spark.range(5_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    for how in ("inner", "left"):
        routed = skew_aware_join(left, right, ["k"], how=how, threshold=5.0, salt=4)
        assert _sorted_rows_nullsafe(routed) == _sorted_rows_nullsafe(left.join(right, ["k"], how)), how
        # only the null group is hot -> no salting machinery in the plan
        plan = routed._jdf.queryExecution().analyzed().toString()
        assert "__salt" not in plan, how
    # full joins cannot take the bypass: the helper must fall back to the
    # row-identical plain join rather than dropping null-keyed rows
    full = skew_aware_join(left, right, ["k"], how="full", threshold=5.0)
    assert _sorted_rows_nullsafe(full) == _sorted_rows_nullsafe(left.join(right, ["k"], "full"))


def test_skew_aware_join_mixed_null_and_real_hot_keys(spark):
    """Null group AND a real hot key above threshold together: the real
    key salts, the nulls bypass, the cold remainder joins plain — one
    result, row-identical to the plain join both ways."""
    left = spark.range(6_000).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("long"))
        .when(F.col("id") % 3 == 1, F.lit(7))
        .otherwise(F.col("id") % 60)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    right = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    for how in ("inner", "left"):
        routed = skew_aware_join(left, right, ["k"], how=how, threshold=5.0, salt=4)
        assert _sorted_rows_nullsafe(routed) == _sorted_rows_nullsafe(left.join(right, ["k"], how)), how
        # key 7 was actually salted
        plan = routed._jdf.queryExecution().analyzed().toString()
        assert "__salt" in plan, how


def test_observed_metrics_and_listener(spark, tmp_path):
    src = str(tmp_path / "ticks")
    rows = [(i, float(i), dt.datetime(2024, 1, 1, 10, 0, i)) for i in range(10)]
    spark.createDataFrame(rows, "tick_id long, value double, ts timestamp").coalesce(
        1
    ).write.parquet(src)

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        stream = spark.readStream.schema("tick_id long, value double, ts timestamp").parquet(src)
        observed = observe_rates(stream, "ticks", value_col="value")
        q = (
            observed.writeStream.format("memory")
            .queryName("obs_sink")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered async — wait for the progress event
        for _ in range(100):
            if rec.total_rows >= 10:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(rec)

    assert rec.total_rows == 10
    obs = {}
    for r in rec.records:
        obs.update(r.observed)
    assert "ticks" in obs
    assert obs["ticks"]["n_rows"] == 10
    assert abs(obs["ticks"]["sum_value"] - sum(float(i) for i in range(10))) < 1e-9
