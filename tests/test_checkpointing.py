"""stage_checkpoint: the durability knob changes failure semantics only —
local-block mode (default) and reliable-directory mode produce identical
results, and reliable mode actually writes checkpoint files the cluster
could recover from."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from sport_data_pipeline_spark.checkpointing import (
    CHECKPOINT_DIR_CONF,
    stage_checkpoint,
)
from sport_data_pipeline_spark.operators.graph import connected_components


def _edges(spark):
    # two chains and a singleton-free triangle: {1-2-3}, {10-11}, {20-21-22}
    rows = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    return spark.createDataFrame(rows, "id_a bigint, id_b bigint")


def test_stage_checkpoint_modes_produce_identical_results(spark):
    df = spark.range(0, 1000).withColumn("g", F.col("id") % 7)
    agg = df.groupBy("g").agg(F.sum("id").alias("s"))
    local_rows = sorted(stage_checkpoint(agg).collect())

    ck = tempfile.mkdtemp(prefix="sdp_ck_")
    try:
        spark.conf.set(CHECKPOINT_DIR_CONF, ck)
        reliable_rows = sorted(stage_checkpoint(agg).collect())
        # reliable mode wrote real checkpoint files under the configured dir
        files = [
            os.path.join(r, f) for r, _, fs in os.walk(ck) for f in fs
        ]
        assert files, "reliable mode must materialize under the checkpoint dir"
        # and the iterative consumer (connected components) agrees between
        # modes — the multi-pass shape the knob exists for
        reliable_cc = sorted(
            connected_components(_edges(spark)).collect()
        )
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        shutil.rmtree(ck, ignore_errors=True)

    assert local_rows == reliable_rows
    local_cc = sorted(connected_components(_edges(spark)).collect())
    assert local_cc == reliable_cc
    comp = {r["id"]: r["component"] for r in local_cc}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_stage_checkpoint_default_is_local(spark):
    # without the conf, no directory is required and no files are written
    assert spark.conf.get(CHECKPOINT_DIR_CONF, None) is None
    out = stage_checkpoint(spark.range(5))
    assert out.count() == 5
