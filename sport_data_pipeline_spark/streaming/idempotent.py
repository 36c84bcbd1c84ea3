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
- READS of loop-owned state filter to ``-1 <= __epoch < current`` — a
  replayed epoch can never observe the partial output of its own failed
  attempt (which would make re-crawled docs match themselves), only the
  epochs that completed before it; and the compactor's ``__epoch=-2``
  scratch partition is NEVER reader-visible, even to an unrestricted
  read, so a crash mid-compaction cannot double-count the merged rows.
  Preseeded state lands at ``__epoch=-1``.

Together these give exactly-once OBSERVABLE semantics for the
append-only-fold ingest loops (stream_ingest_dedup and siblings) on top
of at-least-once batch delivery. ``compact_epochs`` is the matching
maintenance job: it rolls completed epochs into the base partition (one
small file per epoch otherwise accrues without bound) without changing
any future batch's visible state.

All directory/marker manipulation goes through the Hadoop FileSystem
adapter (``fsio.HadoopFS``), so the discipline works unchanged when the
state path lives on HDFS/object storage, not only on the driver's local
disk. The compaction commit marker is published as a SINGLE small-object
write whose content is self-validating (below_epoch + sha256 of the
payload): a single PUT is atomic on object stores and a torn/truncated
write on any filesystem fails the checksum and reads as "no swap
committed" — so the protocol needs no atomic rename and holds on
S3A-class stores, where rename is a non-atomic copy. Crash recovery is
symmetric: a committed-but-unfinished swap (marker valid + scratch
present) is finished by ``recover_compaction`` / a re-run of
``compact_epochs`` with the recorded ``below_epoch``, and
``epoch_read`` REFUSES to read through that window rather than silently
returning state whose source partitions are partially deleted.
Unit-pinned in tests/test_streaming_idempotent.py (replayed epoch leaves
byte-identical state; reads never see the current epoch or the scratch
partition; compaction preserves visibility; corrupted/truncated markers
read as uncommitted; mid-``_finish`` crashes are detected by readers and
healed by recovery; a property test checks any write/replay/compact
interleaving against a pure dict model).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fsio import HadoopFS, join

EPOCH_COL = "__epoch"

#: Scratch partition used by ``compact_epochs`` while building the merged
#: base. ``epoch_read`` filters it out unconditionally.
_TMP_EPOCH = -2

#: Commit-marker file name (child of the state path).
_MARKER = "__epoch_compact_commit"


def marker_body(below_epoch: int) -> str:
    """Self-validating commit-marker content: the payload plus its own
    sha256. A single-object write of this body is an atomic publish on
    object stores (PUT is all-or-nothing) and a torn write anywhere else
    fails the checksum — no atomic rename required."""
    payload = f"v1 below_epoch={int(below_epoch)}"
    return f"{payload} sha256={hashlib.sha256(payload.encode('ascii')).hexdigest()}"


def _read_marker(fs: HadoopFS, marker: str) -> int | None:
    """The recorded ``below_epoch`` of a COMMITTED swap, or None when the
    marker is absent, truncated, or corrupt (checksum mismatch) — all of
    which mean no swap committed, because the marker is written in one
    object and validated by content."""
    if not fs.exists(marker):
        return None
    m = re.fullmatch(
        r"v1 below_epoch=(-?\d+) sha256=([0-9a-f]{64})", fs.read_text(marker).strip()
    )
    if m is None:
        return None
    payload = f"v1 below_epoch={m.group(1)}"
    if hashlib.sha256(payload.encode("ascii")).hexdigest() != m.group(2):
        return None
    return int(m.group(1))


def _finish_swap(fs: HadoopFS, path: str, below: int) -> None:
    """Complete a committed swap: the ``__epoch=-2`` scratch holds the full
    merged base, so drop the rolled-up sources + old base, promote the
    scratch, clear the marker. Every step is idempotent, so a crash at any
    point is healed by re-running (the marker survives until the end)."""
    for d in fs.listdir(path):
        if d.startswith(f"{EPOCH_COL}=") and -1 <= int(d.split("=", 1)[1]) < below:
            fs.delete(join(path, d))
    fs.rename(join(path, f"{EPOCH_COL}={_TMP_EPOCH}"), join(path, f"{EPOCH_COL}=-1"))
    fs.delete(join(path, _MARKER))


def epoch_write(df: DataFrame, path: str, epoch: int) -> None:
    """Idempotently land ``df`` as the ``__epoch=epoch`` partition of
    ``path`` — dynamic overwrite replaces only this epoch's partition,
    so a foreachBatch replay of the same epoch is a no-op in effect.

    The epoch's partition directory is dropped FIRST: dynamic overwrite
    only replaces partitions present in the written rows, so a replay
    whose recomputation legitimately produces ZERO rows would otherwise
    leave the failed attempt's stale partition in place."""
    fs = HadoopFS(df.sparkSession, path)
    fs.delete(join(path, f"{EPOCH_COL}={int(epoch)}"))
    (
        df.withColumn(EPOCH_COL, F.lit(int(epoch)))
        .write.partitionBy(EPOCH_COL)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def compact_epochs(spark: SparkSession, path: str, below_epoch: int) -> int:
    """Roll every ``-1 <= __epoch < below_epoch`` partition into the base
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
    double-count them against the base); from between stream runs pass
    the next epoch to start, as ``stream_crawl_ingest`` and the
    semantic/media ingest twins do (they compact after
    ``awaitTermination``, between runs — see plans/mediaops.py).

    MUST run inside the loop's serial schedule (from the foreachBatch
    body or between stream runs): the partition swap is not atomic, and
    a concurrent reader could observe the window between source-drop and
    base-promote. Three guards enforce the discipline's observable half:
    the ``__epoch=-2`` scratch partition is invisible to ``epoch_read``
    even mid-crash; a call that finds a commit marker recording a
    DIFFERENT ``below_epoch`` refuses loudly (either a concurrent
    compaction is mid-swap, or a crashed one must be finished by
    re-running with ITS below_epoch) rather than racing the swap; and
    ``epoch_read`` itself refuses while a committed swap is unfinished
    (marker + scratch both present), so a crash inside the swap can
    never be read through as silently-missing state. Returns the number
    of epoch partitions rolled up; a call that merely finishes a crashed
    swap returns 0 (the crashed run's sources are already partially
    dropped, so the count is unknowable)."""
    from ..checkpointing import stage_checkpoint

    fs = HadoopFS(spark, path)
    tmp_part = join(path, f"{EPOCH_COL}={_TMP_EPOCH}")
    marker = join(path, _MARKER)

    recorded = _read_marker(fs, marker)
    if recorded is not None:
        if fs.exists(tmp_part):
            # a previous run crashed AFTER committing its swap (valid
            # marker => the scratch write completed): the scratch may hold
            # the only full copy of partitions already removed, so THAT
            # swap must be finished first — and only a call re-running the
            # SAME roll-up may do it (a different below_epoch means either
            # a concurrent compaction is mid-swap right now, or the caller
            # skipped the serial schedule; racing the swap corrupts state)
            if recorded != below_epoch:
                raise RuntimeError(
                    f"compact_epochs({path!r}): a compaction at "
                    f"below_epoch={recorded} is mid-swap (crashed or "
                    f"concurrent); finish it by re-running with "
                    f"below_epoch={recorded} (or recover_compaction) "
                    f"before compacting further"
                )
            _finish_swap(fs, path, recorded)
            return 0  # this call's roll-up IS the recovered swap
        fs.delete(marker)  # crashed after the rename, before cleanup
    else:
        # no marker, or a torn/corrupt one (checksum failed => the swap
        # never committed): sources are all intact, so discarding the
        # marker remnant and any partial scratch and redoing is safe
        fs.delete(marker)
        fs.delete(tmp_part)

    roll = [
        d
        for d in fs.listdir(path)
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
    epoch_write(merged, path, _TMP_EPOCH)
    # an all-empty roll-up writes no files: materialize the tmp partition
    # dir anyway so the promote-rename in _finish_swap is unconditional
    # (an empty partition directory is invisible to readers)
    fs.mkdirs(tmp_part)
    # single-object, content-validated commit publish: atomic on object
    # stores (one PUT), and a torn write anywhere fails the checksum and
    # reads as uncommitted — no rename in the commit path
    fs.write_text(marker, marker_body(below_epoch))
    _finish_swap(fs, path, below_epoch)
    return len(roll)


def recover_compaction(spark: SparkSession, path: str) -> int | None:
    """Finish a committed-but-unfinished compaction swap at ``path``, if
    one is recorded — the loop-startup recovery step: call it before the
    first state read of a resumed ingest loop, so a crash inside a prior
    run's ``compact_epochs`` swap never surfaces as missing state. A
    torn/corrupt marker (checksum failure) means no swap committed and is
    simply cleared. Returns the recovered swap's ``below_epoch``, or
    None when there was nothing to recover.

    The no-marker fast path is ONE metadata call: callers run this
    per batch (the crawl loop) or per restart (the semantic loop), and
    on an object store every round-trip here is a HEAD/DELETE request."""
    fs = HadoopFS(spark, path)
    marker = join(path, _MARKER)
    if not fs.exists(marker):
        return None
    recorded = _read_marker(fs, marker)
    if recorded is None:
        fs.delete(marker)  # clear a torn remnant; no-op when absent
        return None
    if fs.exists(join(path, f"{EPOCH_COL}={_TMP_EPOCH}")):
        _finish_swap(fs, path, recorded)
        return recorded
    fs.delete(marker)  # crashed after the rename, before cleanup: complete
    return None


def epoch_read(spark: SparkSession, path: str, before_epoch: int | None = None) -> DataFrame:
    """Read an epoch-partitioned table, optionally restricted to epochs
    STRICTLY before ``before_epoch`` (what a batch may observe of
    loop-owned state: completed predecessors only, never its own failed
    attempt). The compactor's ``__epoch=-2`` scratch partition is
    excluded UNCONDITIONALLY — a crash between its write and the swap
    must not double-count the merged rows for any reader. Symmetrically,
    a COMMITTED swap left unfinished by a crash (valid marker + scratch
    both present — source partitions may be partially deleted) REFUSES
    the read instead of silently returning incomplete state; run
    ``recover_compaction`` (or re-run ``compact_epochs`` with the
    recorded below_epoch) to heal it. Partition filters prune at the
    file listing — excluded epochs' files are never opened. ``__epoch``
    is dropped."""
    fs = HadoopFS(spark, path)
    recorded = _read_marker(fs, join(path, _MARKER))
    if recorded is not None and fs.exists(join(path, f"{EPOCH_COL}={_TMP_EPOCH}")):
        raise RuntimeError(
            f"epoch_read({path!r}): a compaction at below_epoch={recorded} "
            f"is mid-swap (crashed or concurrent) — state would read "
            f"incomplete; run recover_compaction (or compact_epochs with "
            f"below_epoch={recorded}) first"
        )
    df = spark.read.parquet(path).filter(F.col(EPOCH_COL) >= -1)
    if before_epoch is not None:
        df = df.filter(F.col(EPOCH_COL) < int(before_epoch))
    return df.drop(EPOCH_COL)
