"""Epoch-partitioned idempotent sinks for foreachBatch ingest loops.

Structured Streaming's foreachBatch delivers each micro-batch AT LEAST
once: after a failure the same epoch is re-executed with the same batch
id. A plain ``mode("append")`` parquet write therefore double-appends on
replay — on a real cluster with preempted executors, a long-running
ingest loop would slowly poison both its routing table and its
incremental index with duplicate rows.

The fix is the standard epoch-partition discipline:

- WRITES go to an ``__epoch=<batch_id>`` partition with DYNAMIC partition
  overwrite, so a replayed epoch overwrites exactly its own partition and
  nothing else — the write is idempotent per epoch, regardless of how
  many times the batch re-runs.
- READS of loop-owned state filter to ``__epoch < current`` — a replayed
  epoch can never observe the partial output of its own failed attempt
  (which would make re-crawled docs match themselves), only the epochs
  that completed before it. Preseeded state lands at ``__epoch=-1``.

Together these give exactly-once OBSERVABLE semantics for the
append-only-fold ingest loops (stream_ingest_dedup and siblings) on top
of at-least-once batch delivery. Unit-pinned in
tests/test_streaming_idempotent.py (replayed epoch leaves byte-identical
state; reads never see the current epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EPOCH_COL = "__epoch"


def epoch_write(df: DataFrame, path: str, epoch: int) -> None:
    """Idempotently land ``df`` as the ``__epoch=epoch`` partition of
    ``path`` — dynamic overwrite replaces only this epoch's partition,
    so a foreachBatch replay of the same epoch is a no-op in effect."""
    (
        df.withColumn(EPOCH_COL, F.lit(int(epoch)))
        .write.partitionBy(EPOCH_COL)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def epoch_read(spark: SparkSession, path: str, before_epoch: int | None = None) -> DataFrame:
    """Read an epoch-partitioned table, optionally restricted to epochs
    STRICTLY before ``before_epoch`` (what a batch may observe of
    loop-owned state: completed predecessors only, never its own failed
    attempt). The partition filter prunes at the file listing — the
    excluded epoch's files are never opened. ``__epoch`` is dropped."""
    df = spark.read.parquet(path)
    if before_epoch is not None:
        df = df.filter(F.col(EPOCH_COL) < int(before_epoch))
    return df.drop(EPOCH_COL)
