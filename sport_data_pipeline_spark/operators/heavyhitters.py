"""Misra-Gries heavy hitters: mergeable frequent-items summaries.

The missing member of the sketch family next to HLL++ (distinct counts)
and GK (quantiles, both via Spark built-ins in plans/domain.sketch_profile):
when even the (term → count) relation is too large to shuffle — web-scale
token or URL frequency over 100 TB — each partition compresses its counts
to k counters and only the ≤ k-rows-per-partition summaries shuffle.

This uses the batch compression from the mergeable-summaries literature
(Agarwal et al., PODS'12): count a partition exactly, subtract the
(k+1)-th largest count s_p, keep the positive remainder. That is a valid
Misra-Gries summary with per-item underestimate ≤ s_p ≤ n_p/(k+1);
summing summaries across partitions keeps the guarantee additive:

    true - N/(k+1)  ≤  estimate  ≤  true        (N = total item count)

for EVERY item, under ANY partitioning — which is what makes the error
bound a driver-checkable contract even though the raw estimates depend on
the partition layout.

The per-partition kernel runs behind Arrow (``mapInPandas``): it
accumulates the whole partition before emitting, and the counting is
C-speed (``collections.Counter`` over list data) — no per-row Python UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _compress(counts: dict, k: int) -> dict:
    """Reduce an exact count dict to ≤ k entries, Misra-Gries style:
    subtract the (k+1)-th largest count from everything, keep positives."""
    if len(counts) <= k:
        return dict(counts)
    s = sorted(counts.values(), reverse=True)[k]  # (k+1)-th largest
    return {item: c - s for item, c in counts.items() if c - s > 0}


def heavy_hitters(
    df: DataFrame,
    items_col: str,
    k: int = 64,
    compress_final: bool = True,
) -> DataFrame:
    """Approximate frequent items of an exploded-array column.

    ``items_col`` is an ``array<string>`` column (e.g. tokenized text);
    each partition summarizes its item stream to ``k`` counters, the tiny
    summaries (≤ k rows per partition) are summed on one small shuffle,
    and the merged result is optionally compressed back to ``k`` rows.

    Returns (item, est) with ``true - N/(k+1) <= est <= true``. The raw
    ``est`` values depend on the partition layout (like any MG sketch);
    the bound does not.
    """
    import collections

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: collections.Counter = collections.Counter()
        for batch in batches:
            for items in batch["__items"]:
                if items is not None and len(items):
                    counts.update(items.tolist() if hasattr(items, "tolist") else items)
        comp = _compress(counts, k)
        yield pd.DataFrame(
            {"item": list(comp.keys()), "est": list(comp.values())}
        ).astype({"item": str, "est": "int64"})

    partials = df.select(F.col(items_col).alias("__items")).mapInPandas(
        summarize, schema="item string, est long"
    )
    merged = partials.groupBy("item").agg(F.sum("est").cast("long").alias("est"))
    if not compress_final:
        return merged
    # final compression to k rows: same subtract-(k+1)-th rule, expressed
    # relationally (threshold is a 1-row broadcast, not a collect)
    kth = (
        merged.orderBy(F.desc("est"), F.asc("item"))
        .limit(k + 1)
        .agg(F.when(F.count(F.lit(1)) > k, F.min("est")).otherwise(F.lit(0)).alias("__s"))
    )
    return (
        merged.crossJoin(F.broadcast(kth))
        .select("item", (F.col("est") - F.col("__s")).cast("long").alias("est"))
        .filter(F.col("est") > 0)
    )
