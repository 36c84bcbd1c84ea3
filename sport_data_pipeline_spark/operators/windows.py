"""Window-function operators: the rewrites of the reference's pandas loops.

The reference computes per-team form, latest-value, and open/close prices
with Python loops over collected rows (O(teams × matches),
src/analytics/engine.py:137-191). Each helper here is one shuffle on the
partition key + a linear window pass — the shape that survives 100 TB.

Determinism: callers must pass a *total* order (include a unique id as the
final order column) or top-N membership is undefined under ties.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_ROW_NUM = "__rn"


def _order_cols(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def last_n_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    n: int,
) -> DataFrame:
    """Keep the latest ``n`` rows per key (reference W1: last-5-match form,
    src/analytics/engine.py:143-152 sort_values().tail(5)).

    One hash shuffle on ``keys``; rank + filter happen within partitions.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending=True))
    return (
        df.withColumn(_ROW_NUM, F.row_number().over(w))
        .filter(F.col(_ROW_NUM) <= n)
        .drop(_ROW_NUM)
    )


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Latest row per business key (reference W4 latest market value;
    W7 ON-CONFLICT-DO-UPDATE latest-wins, database/schema.sql:986-997)."""
    return last_n_per_key(df, keys, order_by, 1)


def first_last_value(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    value_col: str,
    open_name: str = "open_value",
    close_name: str = "close_value",
) -> DataFrame:
    """Open/close value per key over an ordered tick stream (reference
    W5/J11: open vs close odds per match/bookmaker/market/outcome,
    database/schema.sql:729-745).

    Single window with an unbounded frame computes both ends in one pass;
    one row per key is emitted.
    """
    asc = _order_cols(order_by, descending=False)
    w = Window.partitionBy(*keys).orderBy(*asc)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        df.withColumn(open_name, F.first(value_col).over(w_full))
        .withColumn(close_name, F.last(value_col).over(w_full))
        .withColumn(_ROW_NUM, F.row_number().over(w))
        .filter(F.col(_ROW_NUM) == 1)
        .select(*keys, open_name, close_name)
    )


def time_bucket_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    bucket_name: str = "bucket_start",
) -> DataFrame:
    """Hypertable-style tumbling rollup: epoch-aligned fixed-width time
    buckets (``width`` like "1 hour", "15 minutes") × grouping columns.

    One shuffle on (bucket, groups) with map-side partial aggregation —
    the batch twin of a TimescaleDB continuous aggregate. Coarser
    granularities should re-aggregate from a finer rollup's output
    (sum of counts / decimal sums), not rescan the raw events — see
    ``plans/windows.time_bucket_cascade``.
    """
    b = F.window(F.col(ts_col), width)
    out = df.groupBy(b.alias("__w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("__w.start").alias(bucket_name), *group_cols,
        *[c for c in out.columns if c != "__w" and c not in group_cols],
    )


def rank_standings(
    df: DataFrame,
    order_by: Sequence[Column | str],
    position_col: str = "position",
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Assign league positions (reference W6/A13: standings position,
    database/schema.sql:491-507). With ``partition_cols`` (the scale
    default for any multi-competition/multi-season table) positions are
    per partition and the window is bounded by the largest league —
    constant in data volume. Without it the window is a SINGLE global
    sort: legitimate only for a table that is one league's standings
    (≤ tens of rows), which is what the in-repo callers rank; any caller
    holding more than one competition-season should pass the partition
    columns rather than accept the unpartitioned window."""
    order = _order_cols(order_by, descending=False)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
    else:
        w = Window.orderBy(*order)
    return df.withColumn(position_col, F.row_number().over(w))


def global_percent_rank(
    df: DataFrame,
    order_by: Sequence[str],
    out_col: str = "pct_rank",
) -> DataFrame:
    """Distributed global ``percent_rank() OVER (ORDER BY ...)``.

    The naive form — ``F.percent_rank().over(Window.orderBy(...))`` — is the
    reference's percentile contract (src/analytics/reports.py:80-85), but in
    Spark an unpartitioned window moves the ENTIRE table into one partition
    (``WindowExec: No Partition Defined``): a scale-killer at 100 TB. This
    computes the identical value with every partition bounded at ~n/P rows:

      1. range-repartition on the order columns → contiguous sorted ranges;
      2. count rows per range partition (≤ P rows, P = shuffle partitions);
      3. cumulative offsets over those P rows — the only unpartitioned
         window left, and it is bounded by CLUSTER CONFIG (partition
         count), never by data volume;
      4. broadcast the offsets back; global rank = range-partition offset
         + row_number within the partition, and
         percent_rank = (rank − 1) / (n − 1)  (0.0 when n == 1, matching
         Spark/DuckDB).

    ``order_by`` must be a TOTAL order (append a unique id last): with no
    ties rank == row position, so percent_rank needs no tie handling. The
    two consumers of the range exchange (the counts branch and the probe
    branch) share one shuffle via ReusedExchange; the range-partitioner
    sampling is seed-deterministic, so the branches agree even if
    recomputed.
    """
    cols = [F.col(c) for c in order_by]
    part = df.repartitionByRange(*cols).withColumn("__pid", F.spark_partition_id())
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # ≤ P rows: the unpartitioned windows below are config-bounded, not
    # data-bounded (the whole point of this operator).
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_tot).alias("__total"),
    )
    w_rn = Window.partitionBy("__pid").orderBy(*cols)
    grank = F.col("__off") + F.row_number().over(w_rn) - F.lit(1)
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            F.when(
                F.col("__total") > 1,
                grank.cast("double") / (F.col("__total") - F.lit(1)),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__pid", "__off", "__total")
    )


def global_quantiles(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    ps: Sequence[float],
) -> DataFrame:
    """EXACT global quantiles (``percentile_disc`` semantics) without a
    single-partition sort — the same distributed-rank machinery as
    :func:`global_percent_rank`.

    ``percentile_disc(p)`` is the value at 1-based position ``ceil(p·n)``
    of the sorted multiset; ties in ``value_col`` don't matter because any
    row at that position carries the same value, so ranking by the total
    order ``(value_col, tiebreak_col)`` and picking the target row is
    exact. Plan: range exchange on the order columns → per-partition
    counts (≤ P rows) → broadcast cumulative offsets → row_number within
    each range partition → filter to the ≤ len(ps) target positions.
    Every partition is bounded at ~n/P; the only unpartitioned window
    runs over the P-row counts frame (config-bounded).

    Returns ``(p, value)`` — one row per requested quantile; empty input
    returns no rows. ``approx_percentile`` is the one-pass sketch
    alternative; this is the exact path for when the quantile IS the
    product (split thresholds, calibration cuts).
    """
    if not ps:
        raise ValueError("global_quantiles requires at least one quantile")
    if any(p <= 0 or p > 1 for p in ps):
        raise ValueError(f"quantiles must be in (0, 1]: {list(ps)}")
    cols = [F.col(value_col), F.col(tiebreak_col)]
    part = df.repartitionByRange(*cols).withColumn("__pid", F.spark_partition_id())
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_tot).alias("__total"),
    )
    w_rn = Window.partitionBy("__pid").orderBy(*cols)
    ranked = part.join(F.broadcast(offsets), "__pid").select(
        F.col(value_col).alias("value"),
        (F.col("__off") + F.row_number().over(w_rn)).alias("__rank"),
        "__total",
    )
    # targets as a tiny literal frame: rank == ceil(p * n), 1-based
    p_df = F.broadcast(
        df.sparkSession.createDataFrame([(float(p),) for p in ps], "p double")
    )
    return (
        ranked.join(p_df, F.ceil(F.col("p") * F.col("__total")) == F.col("__rank"))
        .select("p", "value")
        .orderBy("p")
    )


def systematic_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """Deterministic systematic sampling with inclusion probability
    proportional to an integer weight (token counts, byte sizes) — the
    zero-RNG way to draw a ~``n``-item token-budget subsample of a corpus.

    Lay the items on a line in ``id_col`` order, each occupying the
    half-open interval ``(cum−w, cum]`` of length ``weight``; select every
    item whose interval contains one of the ``n`` evenly spaced points
    ``k·W/n`` (k = 1..n, W = total weight — the right-closed convention,
    so the first item isn't unconditionally selected by a zero point). An
    item heavier than the stride can cover several points but is emitted
    once (``n_points`` reports how many, and Σ n_points == n exactly), so
    the sample size is ≤ n with expectation n; selection is exactly
    reproducible across engines, runs, and cluster sizes — no RNG state,
    and upstream dedup cannot flip unrelated items in or out.

    The cumulative weight is a DISTRIBUTED prefix sum (same machinery as
    :func:`global_percent_rank`): range exchange on ``id_col`` →
    per-partition weight sums (≤ P rows) → broadcast cumulative offsets →
    running sum within each range partition. The point-containment test is
    pure integer arithmetic — ``(cum·n) div W > ((cum−w)·n) div W`` in
    decimal(38,0), exact in both Spark and external SQL engines (the
    quotient is ≤ n, far from any overflow).

    Zero-weight items are never selected. Returns
    ``(id_col, weight_col, n_points)`` for the selected items.
    """
    if n <= 0:
        raise ValueError(f"sample size must be positive: {n}")
    part = df.select(
        F.col(id_col), F.col(weight_col).cast("decimal(38,0)").alias("__w")
    ).repartitionByRange(F.col(id_col)).withColumn("__pid", F.spark_partition_id())
    # the counts branch projects RENAMED columns so no attribute name is
    # shared with the probe side (Spark 4's self-join ambiguity detection
    # trips on same-named refs across the shared lineage)
    counts = part.select(
        F.col("__pid").alias("__cpid"), F.col("__w").alias("__cw")
    ).groupBy("__cpid").agg(F.sum("__cw").alias("__psum"))
    w_off = Window.orderBy("__cpid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__cpid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__cpid",
        F.coalesce(F.sum("__psum").over(w_off), F.lit(0).cast("decimal(38,0)")).alias(
            "__off"
        ),
        F.sum("__psum").over(w_tot).alias("__totw"),
    )
    w_run = Window.partitionBy("__pid").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = part.withColumn("__ps", F.sum("__w").over(w_run))
    k_hi = F.expr(f"(__cum * {n}) div __totw")  # points strictly before cum
    k_lo = F.expr(f"((__cum - __w) * {n}) div __totw")
    return (
        run.join(F.broadcast(offsets), F.col("__pid") == F.col("__cpid"))
        .withColumn("__cum", (F.col("__off") + F.col("__ps")).cast("decimal(38,0)"))
        .filter(F.col("__totw") > 0)
        .withColumn("__np", k_hi - k_lo)
        .filter(F.col("__np") > 0)
        .select(
            id_col,
            F.col("__w").cast("long").alias(weight_col),
            F.col("__np").cast("long").alias("n_points"),
        )
    )
