"""Custom stateful streaming operator: per-fixture status tracking.

The reference recomputes scheduled→live→finished per poll and overwrites
state (src/common/scraper_utils.py:48-60 + upsert sinks — SURVEY §2.9 T6).
The streaming-native version keeps per-fixture state in the state store and
emits a row only when the status actually transitions — the shape for any
custom per-key stateful operator Spark lacks (applyInPandasWithState:
Arrow-batched, grouped, with timeout-based state expiry).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: ordered lifecycle — transitions may only move forward (a late 'scheduled'
#: tick after 'live' is stale data, not a regression).
_STATUS_ORDER = {"scheduled": 0, "live": 1, "finished": 2}

TRANSITION_SCHEMA = StructType(
    [
        StructField("fixture_id", LongType(), False),
        StructField("prev_status", StringType(), True),
        StructField("new_status", StringType(), False),
        StructField("transition_ts", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType([StructField("status", StringType(), True)])


def _fold_transitions(
    fixture_id, ticks: pd.DataFrame, current: str | None
) -> tuple[list[dict], str | None]:
    """THE state-transition function, shared verbatim by the streaming
    operator and its batch twin: walk already-sorted ticks, emit a row
    whenever the lifecycle moves FORWARD (late/stale statuses are data
    noise, not regressions), return the advanced state."""
    rows: list[dict] = []
    for _, t in ticks.iterrows():
        status = t["status"]
        if status not in _STATUS_ORDER:
            continue
        if current is None or _STATUS_ORDER[status] > _STATUS_ORDER.get(current, -1):
            rows.append(
                {
                    "fixture_id": fixture_id,
                    "prev_status": current,
                    "new_status": status,
                    "transition_ts": t["scraped_at"],
                }
            )
            current = status
    return rows, current


def _track(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (fixture_id,) = key
    if state.hasTimedOut:
        # timeout invocation: no input batches (concat would raise), just
        # drop the expired per-fixture state and emit nothing
        state.remove()
        return
    current = state.get[0] if state.exists else None
    frames = list(batches)
    if not frames:
        return
    ticks = pd.concat(frames, ignore_index=True)
    ticks = ticks.sort_values("scraped_at", kind="mergesort")
    rows, current = _fold_transitions(fixture_id, ticks, current)
    state.update((current,))
    if current == "finished":
        # finished fixtures won't transition again — let state expire
        state.setTimeoutDuration(60 * 60 * 1000)
    if rows:
        yield pd.DataFrame(rows)


def track_status_transitions(ticks: DataFrame) -> DataFrame:
    """Streaming: emit one row per real status transition per fixture.

    ``ticks`` is a streaming DataFrame with (fixture_id, status,
    scraped_at). Output mode must be 'append'.
    """
    return (
        ticks.groupBy("fixture_id")
        .applyInPandasWithState(
            _track,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def track_status_transitions_batch(ticks: DataFrame, tie_col: str = "tick_id") -> DataFrame:
    """BATCH twin of :func:`track_status_transitions`, running the SAME
    state-transition function (``_fold_transitions``) over each fixture's
    full history in one grouped Arrow pass (``applyInPandas``) — the
    restatement that makes the stateful operator externally
    hash-checkable by a SQL oracle, which the streaming half cannot be
    (its micro-batch boundaries are not SQL-expressible).

    ``ticks``: (fixture_id, status, scraped_at, ``tie_col``) — the tie
    column gives simultaneous ticks a deterministic total order (the
    streaming operator's within-batch stable sort has no SQL twin).
    Distributed shape: one hash exchange on fixture_id, per-group work
    linear in that fixture's ticks — the same contract as the state-store
    partitioning at cluster scale."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["scraped_at", tie_col], kind="mergesort")
        rows, _ = _fold_transitions(int(pdf["fixture_id"].iloc[0]), pdf, None)
        if not rows:
            return pd.DataFrame(
                columns=["fixture_id", "prev_status", "new_status", "transition_ts"]
            )
        return pd.DataFrame(rows)

    return ticks.groupBy("fixture_id").applyInPandas(run, TRANSITION_SCHEMA)
