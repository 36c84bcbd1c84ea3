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


def test_compact_epochs_rolls_up_and_preserves_visibility(spark):
    from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        import os

        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)  # preseed
        for e in range(4):
            lo = 10 * (e + 1)
            epoch_write(spark.range(lo, lo + 2).select(F.col("id")), tmp, e)
        rolled = compact_epochs(spark, tmp, below_epoch=3)
        assert rolled == 3  # epochs 0,1,2 folded into the base
        # partition layout: only the base and epoch 3 remain
        parts = sorted(d for d in os.listdir(tmp) if d.startswith(EPOCH_COL))
        assert parts == [f"{EPOCH_COL}=-1", f"{EPOCH_COL}=3"]
        # full contents unchanged
        everything = [0, 1, 2, 10, 11, 20, 21, 30, 31, 40, 41]
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == everything
        # visibility for the NEXT batch (epoch 4) is unchanged: everything
        assert (
            sorted(r["id"] for r in epoch_read(spark, tmp, before_epoch=4).collect())
            == everything
        )
        # and epoch 3's own view (base + earlier epochs) is also unchanged
        assert sorted(
            r["id"] for r in epoch_read(spark, tmp, before_epoch=3).collect()
        ) == [0, 1, 2, 10, 11, 20, 21, 30, 31]
        # idempotent: nothing below 3 left to roll
        assert compact_epochs(spark, tmp, below_epoch=3) == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_epoch_write_zero_row_replay_clears_stale_partition(spark):
    """A replay whose recomputation produces ZERO rows must still erase
    the failed attempt's partition — dynamic overwrite alone would not
    (it only replaces partitions present in the written rows)."""
    import os

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, 0)
        epoch_write(spark.range(50, 53).select(F.col("id")), tmp, 1)  # "failed" attempt
        empty = spark.range(0, 0).select(F.col("id"))
        epoch_write(empty, tmp, 1)  # replay computes nothing
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [0, 1, 2]
        assert not os.path.isdir(os.path.join(tmp, f"{EPOCH_COL}=1"))
        # compaction over a mix that includes zero-row epochs still works
        from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

        assert compact_epochs(spark, tmp, below_epoch=2) == 1
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [0, 1, 2]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_crashed_compaction_tmp_partition_never_reader_visible(spark):
    """A crash between the compactor's __epoch=-2 scratch write and the
    swap leaves the merged copy on disk beside ALL source epochs; if any
    reader could see it, every merged row would double-count until the
    next maintenance run. epoch_read excludes -2 unconditionally."""
    import os

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)
        epoch_write(spark.range(10, 12).select(F.col("id")), tmp, 0)
        # fabricate the crash state: scratch partition written (the merged
        # base), marker NOT yet published
        epoch_write(
            spark.read.parquet(tmp).filter(F.col(EPOCH_COL) >= -1).drop(EPOCH_COL),
            tmp,
            -2,
        )
        assert os.path.isdir(os.path.join(tmp, f"{EPOCH_COL}=-2"))
        # neither the unrestricted read nor any epoch-bounded read sees -2
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
            0, 1, 2, 10, 11,
        ]
        assert sorted(
            r["id"] for r in epoch_read(spark, tmp, before_epoch=1).collect()
        ) == [0, 1, 2, 10, 11]
        # the next maintenance run discards the uncommitted scratch and
        # completes normally
        from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

        assert compact_epochs(spark, tmp, below_epoch=1) == 1  # epoch 0
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
            0, 1, 2, 10, 11,
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_epochs_refuses_foreign_midswap_marker(spark):
    """A commit marker recording a DIFFERENT below_epoch means a crashed
    or concurrent compaction is mid-swap; racing it would corrupt state,
    so the call must refuse loudly — and re-running with the RECORDED
    below_epoch must finish the swap correctly."""
    import os

    import pytest as _pytest

    from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)
        epoch_write(spark.range(10, 12).select(F.col("id")), tmp, 0)
        epoch_write(spark.range(20, 22).select(F.col("id")), tmp, 1)
        # fabricate a crash AFTER the marker publish, BEFORE the swap:
        # scratch holds the full merge of epochs < 2, marker records 2
        epoch_write(
            spark.read.parquet(tmp)
            .filter((F.col(EPOCH_COL) >= -1) & (F.col(EPOCH_COL) < 2))
            .drop(EPOCH_COL),
            tmp,
            -2,
        )
        from sport_data_pipeline_spark.streaming.idempotent import marker_body

        with open(os.path.join(tmp, "__epoch_compact_commit"), "w") as fh:
            fh.write(marker_body(2))
        with _pytest.raises(RuntimeError, match="below_epoch=2"):
            compact_epochs(spark, tmp, below_epoch=3)
        # re-running the RECORDED roll-up finishes the swap
        compact_epochs(spark, tmp, below_epoch=2)
        assert not os.path.exists(os.path.join(tmp, "__epoch_compact_commit"))
        parts = sorted(d for d in os.listdir(tmp) if d.startswith(EPOCH_COL))
        assert parts == [f"{EPOCH_COL}=-1"]
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
            0, 1, 2, 10, 11, 20, 21,
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_epoch_sink_fs_ops_route_through_hadoop_filesystem(spark):
    """The discipline's directory/marker manipulation must go through the
    Hadoop FileSystem adapter (scheme-resolved: DFS-capable), not python
    os/shutil — pin it by driving the sink through an explicit file: URI,
    which os.path would mishandle."""
    import os

    from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_uri_")
    try:
        uri = "file://" + tmp
        epoch_write(spark.range(0, 3).select(F.col("id")), uri, -1)
        epoch_write(spark.range(10, 12).select(F.col("id")), uri, 0)
        epoch_write(spark.range(10, 12).select(F.col("id")), uri, 0)  # replay
        assert compact_epochs(spark, uri, below_epoch=1) == 1  # epoch 0
        assert sorted(r["id"] for r in epoch_read(spark, uri).collect()) == [
            0, 1, 2, 10, 11,
        ]
        parts = sorted(d for d in os.listdir(tmp) if d.startswith(EPOCH_COL))
        assert parts == [f"{EPOCH_COL}=-1"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


from hypothesis import HealthCheck, given, settings, strategies as st


# op alphabet for the property below: (epoch, payload) writes where a
# repeated epoch models a foreachBatch REPLAY (possibly with different
# recomputed rows), interleaved with roll-ups of all committed epochs.
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.integers(min_value=0, max_value=5),           # epoch
            st.lists(st.integers(0, 99), max_size=4),        # recomputed rows
        ),
        st.just("compact"),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=15,
    deadline=None,
    # the spark fixture is function-scoped ONLY so the suite can recycle
    # the JVM between tests (conftest, r16); within one test function the
    # session is a stable cached singleton across generated examples —
    # exactly the "fixture intentionally shared across examples" case
    # this health check asks to be acknowledged.
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ops)
def test_epoch_discipline_matches_pure_model(spark, ops):
    """Any interleaving of epoch writes, replays (same epoch, possibly
    different rows), and committed-epoch roll-ups must leave exactly the
    last write per epoch visible — the pure-dict model of exactly-once."""
    tmp = tempfile.mkdtemp(prefix="sdp_epoch_prop_")
    try:
        from sport_data_pipeline_spark.streaming.idempotent import compact_epochs

        # non-empty preseed, like every real loop (an ALL-empty parquet
        # dir cannot infer a schema — loops always land seed state first)
        epoch_write(spark.createDataFrame([(1,)], "id bigint"), tmp, -1)
        model: dict[int, list[int]] = {-1: [1]}
        max_epoch = -1
        for op in ops:
            if op == "compact":
                # roll everything committed so far (all epochs written are
                # complete between ops in this model)
                compact_epochs(spark, tmp, below_epoch=max_epoch + 1)
                merged = sorted(v for rows in model.values() for v in rows)
                model = {-1: merged}
            else:
                epoch, rows = op
                vals = [10_000 * (epoch + 1) + r for r in rows]  # epoch-tagged
                epoch_write(
                    spark.createDataFrame([(v,) for v in vals], "id bigint")
                    if vals
                    else spark.range(0, 0).select(F.col("id")),
                    tmp,
                    epoch,
                )
                model[epoch] = vals  # replay REPLACES the epoch
                max_epoch = max(max_epoch, epoch)
        got = sorted(r["id"] for r in epoch_read(spark, tmp).collect())
        want = sorted(v for rows in model.values() for v in rows)
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_torn_commit_marker_reads_as_uncommitted(spark):
    """The commit marker is a single content-validated object: a torn or
    corrupt write (crash mid-PUT on a filesystem without atomic create)
    must read as NO swap committed — compact_epochs discards the remnant
    and redoes the roll-up, and epoch_read does not refuse (sources are
    all intact before the marker commits)."""
    import os

    from sport_data_pipeline_spark.streaming.idempotent import (
        compact_epochs,
        marker_body,
    )

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_torn_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)
        epoch_write(spark.range(10, 12).select(F.col("id")), tmp, 0)
        # partial scratch + a TRUNCATED marker (crash mid-write): the
        # checksum cannot match, so the swap never committed
        epoch_write(spark.range(0, 1).select(F.col("id")), tmp, -2)
        for torn in ("", "v1 below_epoch=1 sha2", marker_body(1)[:-1] + "0", "1"):
            with open(os.path.join(tmp, "__epoch_compact_commit"), "w") as fh:
                fh.write(torn)
            # reads stay available and complete
            assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
                0, 1, 2, 10, 11,
            ]
        # maintenance discards the remnant and completes the roll-up fresh
        assert compact_epochs(spark, tmp, below_epoch=1) == 1
        assert not os.path.exists(os.path.join(tmp, "__epoch_compact_commit"))
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
            0, 1, 2, 10, 11,
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_epoch_read_refuses_midswap_and_recovery_heals(spark):
    """Crash INSIDE the committed swap (marker valid, scratch present,
    some source partitions already deleted): a silent read would return
    incomplete state — duplicates would route as 'kept'. epoch_read must
    refuse loudly, and recover_compaction must finish the recorded swap,
    after which reads return the complete folded state."""
    import os

    import pytest as _pytest

    from sport_data_pipeline_spark.streaming.idempotent import (
        EPOCH_COL,
        marker_body,
        recover_compaction,
    )

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_midswap_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)
        epoch_write(spark.range(10, 12).select(F.col("id")), tmp, 0)
        epoch_write(spark.range(20, 22).select(F.col("id")), tmp, 1)
        # scratch = full merge of epochs < 2, marker committed for 2
        epoch_write(
            spark.read.parquet(tmp)
            .filter((F.col(EPOCH_COL) >= -1) & (F.col(EPOCH_COL) < 2))
            .drop(EPOCH_COL),
            tmp,
            -2,
        )
        with open(os.path.join(tmp, "__epoch_compact_commit"), "w") as fh:
            fh.write(marker_body(2))
        # crash mid-_finish: epoch 0's source partition already deleted
        shutil.rmtree(os.path.join(tmp, f"{EPOCH_COL}=0"))
        with _pytest.raises(RuntimeError, match="mid-swap"):
            epoch_read(spark, tmp)
        with _pytest.raises(RuntimeError, match="recover_compaction"):
            epoch_read(spark, tmp, before_epoch=2)
        # loop-startup recovery finishes the recorded swap
        assert recover_compaction(spark, tmp) == 2
        assert not os.path.exists(os.path.join(tmp, "__epoch_compact_commit"))
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [
            0, 1, 2, 10, 11, 20, 21,
        ]
        parts = sorted(d for d in os.listdir(tmp) if d.startswith(EPOCH_COL))
        assert parts == [f"{EPOCH_COL}=-1"]
        # idempotent: nothing left to recover
        assert recover_compaction(spark, tmp) is None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_recover_compaction_clears_post_rename_marker(spark):
    """Crash AFTER the scratch promote but BEFORE the marker cleanup:
    state is complete (the new base is in place), so reads need not
    refuse and recovery just clears the marker."""
    import os

    from sport_data_pipeline_spark.streaming.idempotent import (
        marker_body,
        recover_compaction,
    )

    tmp = tempfile.mkdtemp(prefix="sdp_epoch_postswap_")
    try:
        epoch_write(spark.range(0, 3).select(F.col("id")), tmp, -1)
        with open(os.path.join(tmp, "__epoch_compact_commit"), "w") as fh:
            fh.write(marker_body(1))  # scratch absent: rename completed
        assert sorted(r["id"] for r in epoch_read(spark, tmp).collect()) == [0, 1, 2]
        assert recover_compaction(spark, tmp) is None
        assert not os.path.exists(os.path.join(tmp, "__epoch_compact_commit"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
