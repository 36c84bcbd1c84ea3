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
of at-least-once batch delivery. ``compact_epochs`` is the matching
maintenance job: it rolls completed epochs into the base partition (one
small file per epoch otherwise accrues without bound) without changing
any future batch's visible state. Unit-pinned in
tests/test_streaming_idempotent.py (replayed epoch leaves byte-identical
state; reads never see the current epoch; compaction preserves
visibility).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

EPOCH_COL = "__epoch"


def epoch_write(df: DataFrame, path: str, epoch: int) -> None:
    """Idempotently land ``df`` as the ``__epoch=epoch`` partition of
    ``path`` — dynamic overwrite replaces only this epoch's partition,
    so a foreachBatch replay of the same epoch is a no-op in effect.

    The epoch's partition directory is dropped FIRST: dynamic overwrite
    only replaces partitions present in the written rows, so a replay
    whose recomputation legitimately produces ZERO rows would otherwise
    leave the failed attempt's stale partition in place. (Local-path
    delete; a DFS deployment swaps in the Hadoop FileSystem call.)"""
    part = os.path.join(path, f"{EPOCH_COL}={int(epoch)}")
    if os.path.isdir(part):
        shutil.rmtree(part, ignore_errors=True)
    (
        df.withColumn(EPOCH_COL, F.lit(int(epoch)))
        .write.partitionBy(EPOCH_COL)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def compact_epochs(spark: SparkSession, path: str, below_epoch: int) -> int:
    """Roll every ``__epoch < below_epoch`` partition into the base
    ``__epoch=-1`` partition — the maintenance job for a long-running
    ingest loop, whose state otherwise accrues one small file per epoch
    (a million 100 KB files is a scheduler problem before it is an IO
    problem).

    Correctness under the epoch-visibility rule: a future batch at epoch
    e >= ``below_epoch`` filters state to ``__epoch < e``, which
    includes the base partition, so merging completed epochs into -1 is
    invisible to it. ``below_epoch`` must cover only COMMITTED epochs:
    from inside a running foreachBatch at epoch e pass ``below_epoch=e``
    (never e+1 — the current epoch's commit is not recorded yet, and a
    crash-replay of it after a roll-up that swallowed its rows would
    double-count them against the base); from between stream runs, the
    next epoch to start. Never run concurrently with a reader — the
    partition swap, like ``compact_parquet``'s, is not atomic. Returns
    the number of epoch partitions rolled up."""
    from ..checkpointing import stage_checkpoint

    tmp_part = os.path.join(path, f"{EPOCH_COL}=-2")
    marker = os.path.join(path, "__epoch_compact_commit")

    def _finish(below: int) -> None:
        # the tmp partition holds the complete merged base: drop the
        # rolled-up sources + old base, promote tmp, clear the marker
        for d in os.listdir(path):
            if d.startswith(f"{EPOCH_COL}=") and -1 <= int(d.split("=", 1)[1]) < below:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        os.rename(tmp_part, os.path.join(path, f"{EPOCH_COL}=-1"))
        os.remove(marker)

    if os.path.exists(marker):
        # a previous run crashed AFTER committing its tmp (marker present
        # => the tmp write completed): the tmp may hold the only full
        # copy of partitions already removed, so finish THAT swap first
        if os.path.isdir(tmp_part):
            _finish(int(open(marker).read()))
        else:
            os.remove(marker)  # crashed after the rename, before cleanup
    else:
        # no marker => any tmp is an uncommitted partial write; sources
        # are all intact, so discarding it and redoing is safe
        shutil.rmtree(tmp_part, ignore_errors=True)

    roll = [
        d
        for d in os.listdir(path)
        if d.startswith(f"{EPOCH_COL}=")
        and d != f"{EPOCH_COL}=-1"
        and -1 <= int(d.split("=", 1)[1]) < below_epoch
    ]
    if not roll:
        return 0
    # materialize BEFORE touching directories (stage_checkpoint severs the
    # lineage from the files about to be replaced — Spark refuses to
    # overwrite a path its own plan still reads)
    merged = stage_checkpoint(
        spark.read.parquet(path)
        .filter((F.col(EPOCH_COL) >= -1) & (F.col(EPOCH_COL) < below_epoch))
        .drop(EPOCH_COL)
    )
    epoch_write(merged, path, -2)
    # an all-empty roll-up writes no files: materialize the tmp partition
    # dir anyway so the promote-rename below is unconditional (an empty
    # partition directory is invisible to readers)
    os.makedirs(tmp_part, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(str(below_epoch))
    _finish(below_epoch)
    return len(roll)


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
