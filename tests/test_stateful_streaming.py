"""applyInPandasWithState custom operator: status-transition tracking
across two micro-batches with persistent state."""

from __future__ import annotations

import datetime as dt

from sport_data_pipeline_spark.streaming.stateful import track_status_transitions

SCHEMA = "fixture_id long, status string, scraped_at timestamp"


def ts(s):
    return dt.datetime.fromisoformat(s)


def _run_batch(spark, src, ckpt, out):
    # parquet sink (not memory): supports checkpoint recovery, so the
    # second run resumes the same state store and only sees new files.
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    q = (
        track_status_transitions(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_transitions_across_batches(spark, tmp_path):
    src = str(tmp_path / "ticks")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "transitions")

    # batch 1: fixture 1 scheduled (+ a duplicate poll), fixture 2 live
    spark.createDataFrame(
        [
            (1, "scheduled", ts("2024-01-01T10:00")),
            (1, "scheduled", ts("2024-01-01T10:01")),
            (2, "live", ts("2024-01-01T10:00")),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)

    # batch 2: fixture 1 goes live then finished; stale 'scheduled' ignored
    spark.createDataFrame(
        [
            (1, "live", ts("2024-01-01T10:05")),
            (1, "scheduled", ts("2024-01-01T10:06")),
            (1, "finished", ts("2024-01-01T11:50")),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)

    rows = (
        spark.read.parquet(out)
        .orderBy("fixture_id", "transition_ts")
        .collect()
    )
    f1 = [(r["prev_status"], r["new_status"]) for r in rows if r["fixture_id"] == 1]
    f2 = [(r["prev_status"], r["new_status"]) for r in rows if r["fixture_id"] == 2]
    assert f1 == [(None, "scheduled"), ("scheduled", "live"), ("live", "finished")]
    assert f2 == [(None, "live")]


class _FakeState:
    """Minimal GroupState stand-in for driving _track's state machine
    without a streaming query."""

    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.updated = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        pass


def test_track_timeout_invocation_removes_state():
    """A ProcessingTimeTimeout invocation delivers NO batches; _track must
    drop the expired state and emit nothing instead of crashing on
    pd.concat of an empty iterator (the ~1h-after-finish crash)."""
    from sport_data_pipeline_spark.streaming.stateful import _track

    state = _FakeState(value=("finished",), has_timed_out=True)
    out = list(_track((1,), iter([]), state))
    assert out == []
    assert state.removed
    assert state.updated is None


def test_track_empty_batch_iterator_is_noop():
    from sport_data_pipeline_spark.streaming.stateful import _track

    state = _FakeState(value=("live",))
    out = list(_track((1,), iter([]), state))
    assert out == []
    assert not state.removed
