"""Sessionization: gap-based session assignment over an event stream.

The batch twin of Structured Streaming's ``session_window`` (used by the
streaming module); expressed with lag + a running sum of gap flags so the
whole computation is one shuffle on the user key (SURVEY §2.9 T6 — the
reference recomputes per-fixture status per poll; sessions are the
generalized stateful grouping).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tie_break: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 0-based session ids per key; a new session starts when the
    gap from the previous event exceeds ``gap_seconds``."""
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in tie_break]
    w = Window.partitionBy(*keys).orderBy(*order)
    # Exact integer microseconds (not a seconds cast): gap decisions at
    # sub-second boundaries must not depend on truncation.
    micros = F.unix_micros(F.col(ts_col))
    gap = micros - F.lag(micros).over(w)
    new_sess = F.when(gap > gap_seconds * 1_000_000, 1).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_sess).over(running))
