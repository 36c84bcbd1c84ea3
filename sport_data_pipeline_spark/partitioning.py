"""Scale-adaptive partitioning helpers (r15 optimization round).

Guide §2: "make partitioning scale-adaptive (AQE coalescing / derive from
input size) rather than a constant tuned for either local mode or the
cluster." The single helper here pays a spreading exchange only when the
upstream is actually short of parallelism — the test harness's one-file
parquet tables scan as ONE split, which would serialize every CPU-heavy
map chain that follows (tokenize/shingle/fingerprint); a 100 TB table
already scans as thousands of splits and the same call is then a no-op
instead of a full shuffle of the payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to the session's core count (hash on ``cols``
    when given, round-robin otherwise) ONLY when it currently has fewer
    partitions than cores. Results must be partition-layout-invariant at
    the call site — true for every engine operator, whose outputs are
    keyed aggregations/joins, not positional.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p, *[F.col(c) for c in cols]) if cols else df.repartition(p)
