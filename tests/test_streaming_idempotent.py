"""Epoch-partitioned idempotent sinks: a replayed foreachBatch epoch must
leave byte-identical state (dynamic overwrite of its own partition only),
and state reads must never observe the current epoch's own output."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from sport_data_pipeline_spark.streaming.idempotent import (
    EPOCH_COL,
    epoch_read,
    epoch_write,
)


def test_epoch_write_replay_is_idempotent(spark):
    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        epoch_write(spark.range(0, 5).select(F.col("id")), tmp, 0)
        epoch_write(spark.range(10, 13).select(F.col("id")), tmp, 1)
        # replay of epoch 1 (the at-least-once case): same rows land again
        epoch_write(spark.range(10, 13).select(F.col("id")), tmp, 1)
        got = sorted(r["id"] for r in epoch_read(spark, tmp).collect())
        assert got == [0, 1, 2, 3, 4, 10, 11, 12]  # no duplicates
        # a replay that produces a corrected output REPLACES the epoch --
        # the failed attempt's partial rows cannot survive
        epoch_write(spark.range(20, 22).select(F.col("id")), tmp, 1)
        got = sorted(r["id"] for r in epoch_read(spark, tmp).collect())
        assert got == [0, 1, 2, 3, 4, 20, 21]
        # and other epochs' partitions were untouched throughout
        e0 = sorted(
            r["id"]
            for r in spark.read.parquet(tmp).filter(F.col(EPOCH_COL) == 0).collect()
        )
        assert e0 == [0, 1, 2, 3, 4]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_epoch_read_excludes_current_epoch(spark):
    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)  # preseed
        epoch_write(spark.range(100, 102).select(F.col("id")), tmp, 0)
        epoch_write(spark.range(200, 201).select(F.col("id")), tmp, 1)
        # what epoch 1 may observe mid-flight: preseed + epoch 0, never
        # its own (possibly partial) output
        vis = epoch_read(spark, tmp, before_epoch=1)
        assert sorted(r["id"] for r in vis.collect()) == [0, 1, 2, 100, 101]
        assert EPOCH_COL not in vis.columns
        # the exclusion is a PARTITION filter -- pruned at the listing,
        # the excluded epoch's files are never opened
        plan = vis._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and EPOCH_COL in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
