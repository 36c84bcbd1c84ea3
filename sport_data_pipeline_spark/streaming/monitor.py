"""Streaming observability (SURVEY.md §2.9 T7).

The reference exports per-request / per-scrape timings to Prometheus
(src/monitoring/prometheus_metrics.py:39-150) and logs loop health. The
Spark-native equivalents:

- ``observe_rates``: attach named ``Observation``-style metrics to a
  (streaming or batch) DataFrame via ``df.observe`` — computed inside the
  running query with zero extra passes, surfaced per micro-batch in
  ``StreamingQueryProgress.observedMetrics``.
- ``ProgressRecorder``: a ``StreamingQueryListener`` that captures each
  micro-batch's progress (rows, duration, observed metrics) into memory —
  the hook point where a real deployment forwards to Prometheus/StatsD.

Both are driver-side plumbing; nothing here touches the data path, so a
1000-executor job pays only the metric aggregation the query already does.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observe_rates(
    df: DataFrame,
    name: str,
    value_col: str | None = None,
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Attach row-count (and optional value-sum / custom) metrics computed
    in-flight by the query itself. Read them from
    ``progress.observedMetrics[name]`` (streaming) or a batch query's
    ``QueryExecutionListener``."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    if value_col is not None:
        metrics[f"sum_{value_col}"] = F.sum(F.col(value_col))
    if extra:
        metrics.update(extra)
    cols = [c.alias(k) for k, c in metrics.items()]
    return df.observe(name, *cols)


@dataclass
class BatchProgress:
    batch_id: int
    num_input_rows: int
    duration_ms: dict[str, int]
    observed: dict[str, dict[str, Any]]


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Collects per-micro-batch progress; swap ``records.append`` for a
    Prometheus push in production."""

    records: list[BatchProgress] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        raw = json.loads(p.json)
        self.records.append(
            BatchProgress(
                batch_id=raw.get("batchId", -1),
                num_input_rows=raw.get("numInputRows", 0),
                duration_ms=dict(raw.get("durationMs", {})),
                observed=dict(raw.get("observedMetrics", {})),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(r.num_input_rows for r in self.records)
