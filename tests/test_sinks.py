"""Storage-layout writers: partition pruning and exchange-free bucketed
joins — the write-time halves of the 100 TB plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sport_data_pipeline_spark.sources.sinks import (
    write_bucketed_table,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "facts")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("season"),
        (F.col("id") * 2).alias("v"),
    )
    write_partitioned(df, path, ["season"])

    back = spark.read.parquet(path).filter(F.col("season") == "2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "season" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == 250


def test_partitioned_dynamic_overwrite_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "facts")
    df = spark.createDataFrame(
        [(1, "2023", 10.0), (2, "2024", 20.0)], "id long, season string, v double"
    )
    write_partitioned(df, path, ["season"])
    # re-run lands only season=2024; 2023 data must survive
    rerun = spark.createDataFrame([(2, "2024", 99.0)], "id long, season string, v double")
    write_partitioned(rerun, path, ["season"])
    # partition-column type inference reads season back as int — stringify
    got = {(str(r["season"]), r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("2023", 10.0), ("2024", 99.0)}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 7).alias("b"))
    write_bucketed_table(left, "t_sink_left", ["k"], 4, sort_by=["k"])
    write_bucketed_table(right, "t_sink_right", ["k"], 4, sort_by=["k"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_sink_left").join(spark.table("t_sink_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sink_left")
        spark.sql("DROP TABLE IF EXISTS t_sink_right")
