"""Join operators beyond plain equi-joins: symmetric pairs, as-of, range.

Reference counterparts:
- J5 head-to-head self-join (src/analytics/engine.py:193-229) — a Python
  loop over fixtures there; here a symmetric-key equi-join: O(n), one
  shuffle.
- J10/W5 as-of & range semantics (SCD2 name lookups, open/close odds).
  Spark has no native as-of join; the scalable rewrite is union the two
  sides tagged, sort within key partitions, and carry the last left-side
  attributes forward with ``last(..., ignorenulls=True)`` — one shuffle,
  no correlated subquery, no per-row probe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def symmetric_pair_key(a: Column | str, b: Column | str, names: tuple[str, str] = ("pair_a", "pair_b")) -> list[Column]:
    """Order-insensitive pair key: (least, greatest). Rewrites the
    reference's `(home=h∧away=a)∨(home=a∧away=h)` scan into a groupable
    equi-key (J5)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return [F.least(ca, cb).alias(names[0]), F.greatest(ca, cb).alias(names[1])]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str = "asof_",
    right_tiebreak: Sequence[str] = (),
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` / kdb ``aj`` semantics, one
    shuffle, no theta-join blowup.

    For each left row, attach ONE right row within the same ``on`` key:

    - ``direction="backward"`` (default): the latest right row with
      ``right_ts <= left_ts``.
    - ``direction="forward"``: the earliest right row with
      ``right_ts >= left_ts``.
    - ``direction="nearest"``: whichever of those two candidates is
      closer in time; exact-tie distance prefers the backward one.
    - ``tolerance``: maximum allowed ``|left_ts - right_ts|`` — in
      SECONDS when the ts columns are timestamps, in the column's own
      units when numeric. Out-of-tolerance candidates become NULL (left
      rows are always kept, as in ``merge_asof``).

    Implementation: tag and union both sides, window per key ordered by
    (ts, side) with right rows sorting adjacent to equal-timestamp left
    rows on the qualifying side, then carry the right payload across.
    ``nearest`` evaluates a second window in the OPPOSITE sort order —
    still a single hash exchange on ``on`` (two Sort+Window passes over
    the same partitioning). Ties at equal ``right_ts`` pick the greatest
    ``right_tiebreak`` tuple in every direction. Distances compare in
    integer MICROSECONDS for timestamps (``unix_micros`` both sides), so
    tolerance/nearest decisions carry no float rounding.

    Returns all left columns plus ``prefix+value`` columns (NULL when no
    qualifying right row). Scale: one shuffle on ``on``; skewed keys are
    handled by AQE. This is the pattern for point-in-time feature joins
    (odds-at-kickoff, latest market value before a transfer, SURVEY §2
    J10/J11/W4/W5).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction!r}")
    on = list(on)
    lcols = left.columns
    # All right-side payload travels as ONE struct so the carried values
    # always come from the same right row — per-column last(ignorenulls)
    # would mix rows whenever right values contain NULLs. Tiebreak columns
    # ride in the struct too (they may not be requested as outputs), plus
    # the right timestamp under a reserved name for tolerance/nearest.
    rdt = dict(right.dtypes)
    if not right_values:
        raise ValueError("asof_join requires at least one right_values column")
    # Both ts columns must agree on timestamp-vs-numeric BEFORE any plan is
    # built — a mixed pair would otherwise fail deep in unionByName (or,
    # worse, silently cast the timestamp side to double in the distance).
    l_is_ts = "timestamp" in dict(left.dtypes)[left_ts]
    r_is_ts = "timestamp" in rdt[right_ts]
    if l_is_ts != r_is_ts:
        raise ValueError(
            f"asof_join ts dtypes disagree: {left_ts}={dict(left.dtypes)[left_ts]} "
            f"vs {right_ts}={rdt[right_ts]} — both must be timestamps or both numeric"
        )
    struct_fields = list(right_values) + [c for c in right_tiebreak if c not in right_values]
    # join fields + __rts uniformly so the DDL is well-formed for any
    # non-empty field list (guarded above)
    ddl_parts = [f"`{f}`:{rdt[f]}" for f in struct_fields] + [f"`__rts`:{rdt[right_ts]}"]
    struct_ddl = "struct<" + ",".join(ddl_parts) + ">"
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in on],
        F.lit(None).cast(struct_ddl).alias("__r"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in lcols if c not in on],
        F.struct(
            *[F.col(f).alias(f) for f in struct_fields],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    tiebreaks = [F.col("__r").getField(c) for c in right_tiebreak]
    # Backward: ascending ts; right rows (side 0) sort before left rows at
    # equal timestamps (<= semantics), and last() therefore carries the
    # greatest-tiebreak right row at or before each left row.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: DESCENDING ts, so the earliest qualifying right row is the
    # last one seen; side 0 still sorts first at equal ts (>= includes
    # equality) and ascending tiebreaks make last() pick the greatest.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_cols = []
    if direction in ("backward", "nearest"):
        carry_cols.append(F.last("__r", ignorenulls=True).over(w_back).alias("__rb"))
    if direction in ("forward", "nearest"):
        carry_cols.append(F.last("__r", ignorenulls=True).over(w_fwd).alias("__rf"))
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[F.col(f"__l_{c}") for c in lcols if c not in on],
        *carry_cols,
    ).filter(F.col("__side") == 1)

    # integer-microsecond distance for timestamps (bit-exact tie/tolerance
    # decisions); numeric ts columns compare in their own units (the
    # dtype-agreement guard at the top makes is_ts well-defined)
    is_ts = l_is_ts

    def _num(col):
        return F.unix_micros(col) if is_ts else col.cast("double")

    def _dist(rcol):
        return F.abs(_num(F.col("__ts")) - _num(rcol.getField("__rts")))

    def _gate(rcol):
        if tolerance is None:
            return rcol
        # round (not truncate) seconds → integer microseconds, so a
        # fractional-microsecond tolerance never silently tightens
        tol = F.lit(round(tolerance * 1_000_000)) if is_ts else F.lit(tolerance)
        return F.when(rcol.isNotNull() & (_dist(rcol) <= tol), rcol)

    if direction == "backward":
        chosen = _gate(F.col("__rb"))
    elif direction == "forward":
        chosen = _gate(F.col("__rf"))
    else:
        rb, rf = _gate(F.col("__rb")), _gate(F.col("__rf"))
        chosen = (
            F.when(rb.isNull(), rf)
            .when(rf.isNull(), rb)
            .when(_dist(rb) <= _dist(rf), rb)  # exact tie prefers backward
            .otherwise(rf)
        )
    return carried.withColumn("__chosen", chosen).select(
        *on,
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on],
        *[F.col("__chosen").getField(v).alias(f"{prefix}{v}") for v in right_values],
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2 range join: match each fact to the dimension interval covering
    its timestamp (J10: ``valid_from <= ts AND (valid_to IS NULL OR
    ts < valid_to)``).

    Plain range predicate join — Catalyst turns the equi-part into the
    shuffle key and applies the range as a post-filter.
    """
    cond = None
    for k in on:
        c = facts[k] == dim[k]
        cond = c if cond is None else (cond & c)
    cond = cond & (dim[valid_from] <= facts[fact_ts])
    cond = cond & (dim[valid_to].isNull() | (facts[fact_ts] < dim[valid_to]))
    return facts.join(dim, cond, "left")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join point rows into the closed-open intervals ``[start, end)``
    that contain them — WITHOUT an equi-key (or with only a weak one).

    Catalyst plans a bare range predicate (no equi-conjunct) as a
    broadcast-nested-loop or cartesian join — quadratic and
    memory-unbounded at scale. The scalable rewrite is temporal
    bucketization: pick a bucket width ``bucket_seconds``, explode each
    interval over every bucket it overlaps, map each point to its single
    bucket, and equi-join on the bucket id (+ any ``on`` keys) with the
    range predicate as a residual filter. Each point lands in exactly one
    bucket, so every qualifying (point, interval) pair meets exactly once
    — no post-join dedup.

    Cost model: an interval of length L replicates over
    ``ceil(L / bucket)`` ≈ 1-2 buckets when ``bucket_seconds`` is chosen
    at or above the typical interval length, so the exploded interval side
    stays O(|intervals|) and the join is an ordinary shuffled equi-join —
    AQE-skew-eligible, partial-agg friendly downstream. (This is the same
    bucketize-then-equi-join trick engines with native range joins run
    under the hood, e.g. the published bin-based range-join optimization
    in Databricks' runtime; Spark OSS has no such rule, hence the explicit
    operator.)

    ``how`` supports "inner" and "left" (left keeps points that fall in no
    interval, with NULL interval columns). Output: all point columns plus
    all interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_point_join supports inner/left, got {how!r}")
    w_us = int(bucket_seconds) * 1_000_000
    keys = list(on)
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        # The output carries both sides' columns; a silent duplicate name
        # would make every downstream F.col() reference ambiguous.
        raise ValueError(f"rename colliding non-key columns before joining: {sorted(clash)}")
    # Alias scopes disambiguate columns even when both inputs derive from
    # the same source DataFrame (a common shape: points and intervals both
    # carved out of one event table).
    # Closed-open [start, end): zero-length and inverted intervals can
    # match nothing, and MUST be filtered before the explode — Spark's
    # sequence(a, b) switches to step -1 when a > b, so an unfiltered
    # inverted interval would explode DOWNWARD across every bucket back to
    # its end (unbounded cost on dirty data, though the residual filter
    # would still drop the rows). With end > start the last covered bucket
    # is the one holding end - 1 microsecond.
    ivl = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start_col)) / w_us),
                    F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
                )
            ),
        )
        .alias("__ivl")
    )
    pts = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / w_us)
    ).alias("__pts")

    def P(c: str) -> Column:
        return F.col(f"__pts.{c}")

    def I(c: str) -> Column:
        return F.col(f"__ivl.{c}")

    cond = P("__bucket") == I("__bucket")
    for k in keys:
        cond = cond & (P(k) == I(k))
    cond = cond & (I(start_col) <= P(point_ts)) & (P(point_ts) < I(end_col))
    joined = pts.join(ivl, cond, how)
    return joined.select(
        *[P(c) for c in points.columns],
        *[I(c) for c in intervals.columns if c not in keys],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner-join interval rows whose closed-open spans overlap —
    ``max(starts) < min(ends)`` — without a nested-loop plan.

    Both sides explode over the temporal buckets they cover, equi-join on
    the bucket id (+ ``on`` keys), and the overlap predicate filters
    residually. An overlapping pair co-occurs in EVERY bucket their spans
    share, so the join would emit it once per shared bucket; the
    first-shared-bucket rule — keep the match only where ``bucket ==
    floor(max(starts) / W)`` — picks exactly one representative bucket per
    pair (the bucket holding the overlap's left edge, which both sides
    necessarily cover). Dedup is therefore a filter, not a shuffle.

    Same cost model as ``interval_point_join``: with ``bucket_seconds``
    near the typical span length each side replicates O(1)×, and the plan
    is an ordinary AQE-eligible shuffled equi-join at any scale.
    """
    w_us = int(bucket_seconds) * 1_000_000
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(f"rename colliding non-key columns before joining: {sorted(clash)}")

    def exploded(df: DataFrame, start: str, end: str) -> DataFrame:
        # end > start filter BEFORE the explode: sequence(a, b) descends
        # when a > b (see interval_point_join), and empty/inverted spans
        # can overlap nothing under the closed-open rule anyway.
        return df.filter(F.col(end) > F.col(start)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start)) / w_us),
                    F.floor((F.unix_micros(F.col(end)) - 1) / w_us),
                )
            ),
        )

    keys = list(on)
    # Alias scopes: both sides may derive from the same source DataFrame.
    l = exploded(left, left_start, left_end).alias("__ovl_l")
    r = exploded(right, right_start, right_end).alias("__ovl_r")

    def L(c: str) -> Column:
        return F.col(f"__ovl_l.{c}")

    def R(c: str) -> Column:
        return F.col(f"__ovl_r.{c}")

    cond = L("__bucket") == R("__bucket")
    for k in keys:
        cond = cond & (L(k) == R(k))
    overlap_start = F.greatest(L(left_start), R(right_start))
    cond = cond & (overlap_start < F.least(L(left_end), R(right_end)))
    cond = cond & (L("__bucket") == F.floor(F.unix_micros(overlap_start) / w_us))
    joined = l.join(r, cond)
    return joined.select(
        *[L(c) for c in left.columns],
        *[R(c) for c in right.columns if c not in keys],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join: spread hot join keys across ``salt``
    sub-partitions.

    The left (large, skewed) side gets a round-robin salt (balanced by
    construction, type-agnostic); the right side is replicated once per
    salt value,
    so every (key, salt) bucket still sees all matching right rows —
    output is row-identical to ``left.join(right, on, how)``. With
    ``hot_keys`` (a DataFrame of just the skewed key values), only rows
    matching a hot key are salted/replicated and the cold remainder joins
    plainly — replication cost scales with the hot set, not the dims.

    This is the manual fallback for joins AQE's skew-join can't fix:
    skewed *shuffle* joins where both sides are too big to broadcast, or
    deliberate repartitioning before stateful streaming joins. ``how``
    supports "inner" and "left".
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    salt_col = F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))

    if hot_keys is not None:
        hot = F.broadcast(hot_keys.select(*keys).distinct())
        l_hot = left.join(hot, keys, "left_semi")
        l_cold = left.join(hot, keys, "left_anti")
        r_hot = right.join(hot, keys, "left_semi")
        hot_joined = (
            l_hot.withColumn("__salt", salt_col)
            .join(
                r_hot.withColumn("__salt", salts),
                keys + ["__salt"],
                how,
            )
            .drop("__salt")
        )
        return hot_joined.unionByName(l_cold.join(right, keys, how))

    return (
        left.withColumn("__salt", salt_col)
        .join(right.withColumn("__salt", salts), keys + ["__salt"], how)
        .drop("__salt")
    )


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    threshold: float = 10.0,
    salt: int = 16,
    max_hot: int = 64,
) -> DataFrame:
    """Profile-then-route equi-join: measure the left side's per-key load
    (the ``key_skew_profile`` diagnostic, inline), and only if some key
    carries more than ``threshold``× the mean key load route THOSE keys
    through ``salted_join``'s hot-key path while the cold remainder joins
    plainly. Output is row-identical to ``left.join(right, on, how)``.

    This closes the gap between the two standalone tools: the profiler
    tells an operator WHEN salting pays and ``salted_join`` assumes the
    caller already knows WHICH keys are hot; this helper makes the
    decision mechanical. The profile pass is one map-side-combinable
    count per key plus a 1-row global aggregate, and at most ``max_hot``
    hot-key rows come back to the driver (bounded, like AQE's runtime
    statistics — never the key set). With no key above threshold the
    plan IS the plain join: zero salting overhead on uniform data.

    A hot NULL key — the commonest real-world skew shape (a mostly-null
    foreign key) — gets the null-bypass treatment instead of salting:
    NULL never equi-matches, so salting nulls is pure overhead (the
    salted path's semi-join can't route them) while the plain join still
    hashes every null row into ONE shuffle partition on an outer join.
    When the profile finds the null group hot, null-keyed rows skip the
    join entirely — inner drops them before the shuffle (the filter
    Catalyst infers anyway), left appends them map-only with null right
    columns. Output stays row-identical to the plain join.

    Use when AQE's skew-join can't see the skew (e.g. the join feeds a
    stateful streaming stage, or the skew only materializes after an
    upstream explode); prefer plain join + AQE otherwise — measured
    crossover in SCALE.md §8.
    """
    from functools import reduce as _reduce

    keys = list(on)
    c = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    t = c.agg(
        F.count(F.lit(1)).alias("__n_keys"), F.sum("__cnt").alias("__n_rows")
    )
    hot_rows = (
        c.crossJoin(F.broadcast(t))
        # cnt/mean >= threshold, kept in integer-x-double form (one
        # multiply each side; no per-row division)
        .filter(
            F.col("__cnt") * F.col("__n_keys")
            >= F.lit(float(threshold)) * F.col("__n_rows")
        )
        .orderBy(F.desc("__cnt"))
        .limit(int(max_hot))
        .select(*keys)
        .collect()
    )
    real_hot = [r for r in hot_rows if all(r[k] is not None for k in keys)]
    # the bypass below is only row-preserving for inner/left (the hows
    # salted_join supports); any other how falls through to the plain join
    null_hot = len(real_hot) < len(hot_rows) and how in ("inner", "left")
    bypass = None
    if null_hot:
        # null-keyed rows cannot match: route them around the join. The
        # split is two branches of the same map-only scan — no shuffle
        # ever sees the null rows.
        any_null = _reduce(
            lambda a, b: a | b, [F.col(k).isNull() for k in keys]
        )
        if how == "left":
            bypass = left.filter(any_null).select(
                "*",
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in right.schema.fields
                    if f.name not in keys
                ],
            )
        left = left.filter(~any_null)
    if not real_hot:
        joined = left.join(right, keys, how)
    else:
        hot = left.sparkSession.createDataFrame(
            real_hot, left.select(*keys).schema
        )
        joined = salted_join(left, right, keys, how=how, salt=salt, hot_keys=hot)
    return joined if bypass is None else joined.unionByName(bypass)
