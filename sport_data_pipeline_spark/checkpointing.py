"""Lineage-truncation with a configurable durability mode.

Multi-pass pipelines (the BPE trainer's per-merge iterations, connected
components' label-propagation rounds, the e2e pipelines' staged routing
tables) must sever lineage between passes or the logical plan grows with
the iteration count. Two Spark mechanisms exist, trading durability for
speed:

- ``DataFrame.localCheckpoint`` materializes to EXECUTOR-LOCAL block
  storage — no distributed filesystem round-trip, the right default for
  local mode and benchmarks. On a real cluster the blocks die with their
  executor: a lost or preempted executor makes the checkpointed partitions
  unrecoverable MID-JOB (Spark cannot recompute them — the lineage was
  severed), failing the job.
- ``DataFrame.checkpoint`` writes to the RELIABLE checkpoint directory
  (``SparkContext.setCheckpointDir`` — HDFS/object storage on a cluster).
  Partitions of a lost executor are re-read from the checkpoint files, so
  long multi-pass jobs survive executor churn at the cost of a
  write+read through the distributed filesystem per pass.

``stage_checkpoint`` picks per-session: set the
``spark.sport_data_pipeline.checkpoint.dir`` conf (runtime-settable:
``spark.conf.set(CHECKPOINT_DIR_CONF, "hdfs://.../ck")``) and every
pipeline stage checkpoints reliably there; leave it unset and stages use
executor-local blocks. Both modes produce identical results (unit-pinned
in tests/test_checkpointing.py) — the conf trades failure semantics only.

Reference shape: the reference's long ETL jobs restart from scratch on
worker loss (single-process: SURVEY.md §3); at 100 TB a restart is not a
strategy, so durability must be a first-class knob.

CLEANUP in reliable mode: ``DataFrame.checkpoint`` never deletes its
files by default (``spark.cleaner.referenceTracking.cleanCheckpoints``
is false), and the iterative consumers checkpoint EVERY pass (the BPE
trainer per merge, connected components per round) — a long session
with ``CHECKPOINT_DIR_CONF`` set accumulates files without bound. When
enabling the reliable dir, also set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (session conf,
must be set at session build) so checkpoints whose DataFrames are
garbage-collected are reaped, and point the dir at storage with a
retention policy as the backstop — orphans from a crashed driver outlive
any in-process cleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Runtime conf key: when set (to a Spark-reachable directory URI), every
#: ``stage_checkpoint`` call in the session checkpoints RELIABLY there
#: instead of to executor-local blocks.
CHECKPOINT_DIR_CONF = "spark.sport_data_pipeline.checkpoint.dir"


def stage_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage, durably iff the session opted in.

    Returns ``df.checkpoint(eager)`` against the configured
    ``CHECKPOINT_DIR_CONF`` directory when that conf is set, else
    ``df.localCheckpoint(eager)``. Call sites choose WHERE to sever
    lineage; the session chooses what an executor loss costs.
    """
    spark = df.sparkSession
    ck_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if ck_dir:
        sc = spark.sparkContext
        # setCheckpointDir is idempotent for a fixed path; resolve via the
        # raw conf (getCheckpointDir returns the scheme-qualified form, so
        # comparing against the user string would re-set spuriously).
        if getattr(sc, "_graft_ck_dir", None) != ck_dir:
            sc.setCheckpointDir(ck_dir)
            sc._graft_ck_dir = ck_dir
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
