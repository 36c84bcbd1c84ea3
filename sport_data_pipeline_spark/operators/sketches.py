"""Deterministic, cross-engine-portable summary sketches.

The reference keeps running aggregates over full history tables
(analytics/analytics_service.py player/team aggregate loops, SURVEY §2.4
A2/A5); at 100 TB the exact versions of "how many distinct users" and
"how often did X occur" shuffle every key. The classic answers are
mergeable sketches — HyperLogLog for distinct counts, Count-Min for
frequencies — and Spark ships approximate built-ins
(``approx_count_distinct``, exercised by ``sketch_profile``). What the
built-ins cannot give is a CROSS-ENGINE BIT-EXACT artifact: their
register layouts and hash functions are implementation-private, so the
strongest oracle available is an error-bound boolean.

This module implements the full sketch family deterministically over
md5-derived hashes (the same portability trick as
``dedup.simhash_portable``: the top 15 hex chars of md5 = 60 unsigned
bits that any SQL engine reconstructs identically), with all arithmetic
integer until one final double division. The sketch REGISTERS themselves
hash-compare across engines — a far stronger contract than "estimate
within bound":

- DISTINCT — ``hll_registers``: per-group HLL register table (register
  index, max rho) at precision p. One ``groupBy(group, register)
  .max(rho)`` — the partial max combines map-side (plan-verified in
  tests), the shuffle carries at most groups × 2^p rows regardless of
  input size, and merging two sketches IS the same max
  (``merge_hll_registers``). rho uses ``length(bin(w))`` for bit-length
  — integer-only, no log2 rounding hazard. ``hll_estimate_expr`` keeps
  the Σ2^-rho sum exact in a BIGINT and folds the bias constant into
  ONE double literal, so the only floating-point operation is the final
  division.
- DISTINCT/OVERLAP — ``kmv_bottomk`` / ``kmv_overlap``: the k smallest
  distinct hashes (plans as TakeOrderedAndProject — per-partition
  top-k, k-row merge, no full sort); union-merge is bottom-k of the
  concatenation, and the Jaccard/intersection estimates let a corpus
  ask "how much do A and B overlap" without joining either.
- FREQUENCY — ``cms_cells`` / ``cms_point_estimates``: Count-Min over d
  independent row hashes; cells are plain BIGINT counts (cell-wise SUM
  is the merge), point estimates are min-over-rows — all integers.
- MEMBERSHIP — ``bloom_build`` / ``bloom_probe``: semi-join reduction;
  the filter is a ≤ m/32-row word table (bit_or merge), the probe a
  zero-shuffle projection over one broadcast map.
- QUANTILE — ``dyadic_histogram`` / ``dyadic_quantile_picks``:
  fixed-width power-of-two bins (cell-sum merge); reads walk the tiny
  cumulative bucket table, error ≤ half a bin by construction.

Scale: every structure here reduces unbounded key cardinality to
fixed-size state in one map-side-combinable pass, and every merge is
the same aggregate shape as the build — that is the entire point vs
exact COUNT(DISTINCT)/per-key counts/sorts at 100 TB (measured flat-to-
sublinear at 10× data, SCALE.md §8k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bit width of the portable md5-derived hash (15 hex chars, sign-safe).
HASH_BITS = 60


def portable_hash60(col: Column, salt: str | None = None) -> Column:
    """60-bit unsigned hash both Spark and any SQL engine compute
    identically: conv(substring(md5(string), 1, 15), 16, 10).

    ``salt`` prepends "<salt>:" — used by Count-Min for its d independent
    row hashes. The hashed bytes are the UTF-8 of the value's canonical
    string form, so the oracle side is CAST(x AS VARCHAR)."""
    s = col.cast("string")
    if salt is not None:
        s = F.concat(F.lit(f"{salt}:"), s)
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), deterministic variant
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: (group..., reg, rho).

    reg = low ``p`` bits of the 60-bit hash; rho = 1 + leading zeros of
    the remaining W = 60-p bits (rho = W+1 when they are all zero).
    Registers never observed by any value are simply absent (their rho
    is 0 by convention — ``hll_estimate_expr`` accounts for them).

    Duplicate values hash to the same (reg, rho), so the max-aggregate
    absorbs them without a distinct pass — the shuffle after the
    map-side partial max is at most |groups|·2^p rows.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    h = portable_hash60(F.col(value_col))
    reg = (h % m).cast("int")
    w = F.shiftright(h, p)
    # integer bit-length via the binary string: bin(5) = '101' in Spark
    # and DuckDB alike; w = 0 never reaches length() (guarded to rho=W+1)
    rho = F.when(w > 0, F.lit(w_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(w_bits + 1)
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def merge_hll_registers(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-merge two register tables: per (group, reg) the max rho.

    This IS HLL's mergeability — sketch(A ∪ B) = elementwise max — and
    it is the same shape as the build aggregate, so a tree of merges
    stays one exchange of ≤ |groups|·m rows per level."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_constants(p: int = 8) -> tuple[float, int]:
    """(numerator literal C, scale exponent) for ``hll_estimate_expr``.

    C = alpha_m · m² · 2^(W+1) folded into one double so estimate =
    C / S needs exactly one floating-point operation. alpha_m is the
    standard bias constant 0.7213/(1 + 1.079/m) for m ≥ 128."""
    m = 1 << p
    w_bits = HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * (m * m) * float(1 << (w_bits + 1)), w_bits + 1


def hll_estimate_expr(p: int = 8):
    """(per-register term expression, numerator literal C) for the raw
    HLL estimate over a register table.

    Summing the term over present registers and adding
    (m - n_present)·2^(W+1) gives S = Σ 2^(W+1-rho) exact in int64
    (bounded by m·2^(W+1) = 2^(p+W+1) = 2^61 for p=8). The estimate is
    then C/S — one double division; no small-range linear-counting
    branch (ln is not bit-portable across engines) — the queries assert
    the 5σ error bound instead, and at the cardinalities the corpus
    tables carry the raw regime is the operative one anyway."""
    m_scale, shift = hll_constants(p)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {shift} - rho)")
    return term, m_scale


def hll_sketch_summary(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Collapse a register table to one row per group:
    (group..., n_registers, sketch_csv, hll_s, est).

    sketch_csv is the canonical "reg:rho" list ordered by register — the
    cross-engine artifact a hash-compare pins bit-for-bit."""
    m = 1 << p
    term, c_lit = hll_estimate_expr(p)
    shift = HASH_BITS - p + 1
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("reg", "rho"))),
                lambda s: F.concat_ws(":", s["reg"].cast("string"), s["rho"].cast("string")),
            ),
        ).alias("sketch_csv"),
        F.sum(term).alias("__s_present"),
    )
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("n_registers")).cast("long")
        * F.lit(1 << shift).cast("long")
    )
    return agg.select(
        *group_cols,
        "n_registers",
        "sketch_csv",
        s_total.alias("hll_s"),
        (F.lit(c_lit) / s_total.cast("double")).alias("est"),
    )


# ---------------------------------------------------------------------------
# Count-Min (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_cells(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Count-Min cell table (row, cell, cnt) over one pass of the input.

    Row i's hash is the portable 60-bit hash of "<i>:<value>" mod w.
    The explode multiplies map-side rows by d, but the partial count
    combines to ≤ d·w rows per partition before the (only) exchange.
    Merging two sketches is cell-wise SUM — same aggregate, so
    incremental maintenance is a union + re-count."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    exploded = df.select(F.col(value_col).alias("__v")).select("__v", rows)
    # the salt is the row index — a column, so the concat is inlined here
    # rather than going through portable_hash60's literal salt
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("row").cast("string"), F.lit(":"), F.col("__v").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        exploded.select("row", (h % w).cast("int").alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    cells: DataFrame,
    probes: DataFrame,
    probe_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-frequency estimates for the probe values: min over the d
    rows of the probed cells. Broadcast-joins the (≤ d·w row) cell table
    side against the probes — no shuffle of the probe side."""
    p = probes.select(F.col(probe_col).alias("__p")).withColumn(
        "row", F.explode(F.sequence(F.lit(0), F.lit(d - 1)))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("row").cast("string"), F.lit(":"), F.col("__p").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    probed = p.select("__p", "row", (h % w).cast("int").alias("cell"))
    est = (
        probed.join(F.broadcast(cells), ["row", "cell"], "left")
        .fillna({"cnt": 0})
        .groupBy("__p")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(F.col("__p").alias(probe_col), "cms_est")


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et al.
# 2007 for the Jaccard/intersection use)
# ---------------------------------------------------------------------------


def kmv_bottomk(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Bottom-k sketch of a key column: the k smallest DISTINCT 60-bit
    md5-derived hashes, one row each (column ``h``).

    Physical shape is the scale story: distinct-by-hash combines
    map-side, and the global bottom-k plans as TakeOrderedAndProject
    (per-partition top-k, then a k-row merge at one task) — no full
    sort, no all-keys shuffle. The sketch supports
    - distinct-count estimation: (k-1)·2^60 / h_k,
    - UNION merge: bottom-k of the concatenated sketches, and
    - Jaccard/intersection between sets (``kmv_overlap``): the fraction
      of the union sketch's k values present in both sides' sketches —
    which is how a 100 TB decontamination pass asks "how much does this
    crawl overlap the eval corpus" without joining either corpus."""
    h = portable_hash60(F.col(value_col))
    return (
        df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_estimate_literal(k: int = 256) -> float:
    """Numerator of the KMV distinct estimator, folded into one double
    literal: (k-1)·2^60 — so the estimate D = LIT / h_k costs exactly
    one floating-point division (bit-identical in any IEEE engine)."""
    return float((k - 1) * (1 << HASH_BITS))


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 256):
    """(union_sketch, overlap_count_df) for two bottom-k sketches.

    union_sketch = bottom-k of A ∪ B (the KMV merge); the overlap count
    is |K(A∪B) ∩ K(A) ∩ K(B)| — Jaccard ≈ that count / k. All frames
    involved are ≤ k rows, so the joins broadcast."""
    union = (
        a.unionByName(b).distinct().orderBy("h").limit(k)
    )
    overlap = (
        union.join(F.broadcast(a), "h", "left_semi")
        .join(F.broadcast(b), "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("overlap_k"))
    )
    return union, overlap


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — membership sketch for semi-join reduction
# ---------------------------------------------------------------------------

#: bits per bitmap word. 32 keeps every shift strictly inside a signed
#: 64-bit value in BOTH engines (DuckDB range-checks 1::BIGINT << 63).
_BLOOM_WORD = 32


def _bloom_pos(i, key_col: str, m_bits: int, hash_fn: str):
    """Bit position i for a key: md5-derived (bit-portable across engines
    — the oracled queries' form) or xxhash64 (JVM-cheap — the engine
    optimization form; ~an order of magnitude less per-row work, which
    is what makes the filter worth its keep as a runtime pre-filter)."""
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(F.lit(i).cast("int"), F.col(key_col).cast("string")),
            F.lit(m_bits),
        )
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{i}:"), F.col(key_col).cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    j: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Build a Bloom bitmap over the DISTINCT keys of ``df`` as a word
    table (word, wbits): j hash-derived positions per key, OR-folded into
    32-bit words — ≤ m/32 rows total, one map-side-combinable bit_or
    aggregate. This is the build side of SEMI-JOIN REDUCTION: at 100 TB
    you ship this (fixed-size) table to the fact scan instead of
    shuffling the fact table into a join just to discard 80% of it.
    Merging two filters over key subsets is the same bit_or.
    ``hash_fn``: "md5" (cross-engine bit-portable — the oracled form) or
    "xxhash64" (JVM-cheap — the engine pre-filter form; build and probe
    must agree)."""
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(i, "__k", m_bits, hash_fn) for i in range(j)])
        ).alias("pos")
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(_BLOOM_WORD)])
    return (
        pos.select(
            (F.col("pos") / _BLOOM_WORD).cast("int").alias("word"),
            F.element_at(powers, (F.col("pos") % _BLOOM_WORD).cast("int") + 1).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("wbits"))
    )


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int = 65536,
    j: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Append a ``bloom_pass`` boolean to ``fact``: true iff all j bits
    for the row's key are set in the filter.

    Physical shape is the point: the word table (≤ m/32 rows, 16 KB at
    the default m) is COLLECTED ONCE and folded into the plan as a
    constant dense ``array<long>`` bitmap — exactly how Spark's own
    runtime bloom filters ship their build side — so the probe is a
    pure literal projection over the fact scan: zero joins, zero
    exchanges, full whole-stage codegen. (The earlier 1-row crossJoin
    form was measured 4× slower end to end on a 20M-row probe: the
    ``bloom_pass`` filter gets pushed into the BroadcastNestedLoopJoin
    CONDITION, evaluating the whole expression twice outside codegen,
    and MapType ``element_at`` linear-scans its entries per probe.)
    Note the collect makes this call EAGER — it runs the small build
    job when the plan is constructed. False negatives are impossible by
    construction (every build bit was set); false positives are the
    (1-e^(-jn/m))^j hash-collision rate the caller bounds by sizing m."""
    n_words = m_bits // _BLOOM_WORD
    wb = {int(r["word"]): int(r["wbits"]) for r in words.collect()}
    # ONE py4j call for the whole bitmap literal: element-wise F.lit
    # construction costs a JVM round trip per word (measured ~10 s of
    # pure driver time at m=65536)
    arr = F.lit([wb.get(i, 0) for i in range(n_words)]).cast("array<long>")
    powers = F.lit([1 << b for b in range(_BLOOM_WORD)]).cast("array<long>")
    cond = F.lit(True)
    for i in range(j):
        h = _bloom_pos(i, key_col, m_bits, hash_fn)
        word = (h / _BLOOM_WORD).cast("int")
        mask = F.element_at(powers, (h % _BLOOM_WORD).cast("int") + 1)
        cond = cond & (F.element_at(arr, word + 1).bitwiseAND(mask) != 0)
    return fact.withColumn("bloom_pass", cond)


# ---------------------------------------------------------------------------
# Dyadic-bucket quantile histogram (fixed-width power-of-two buckets —
# the Prometheus/OpenTelemetry histogram shape, mergeable by cell sum)
# ---------------------------------------------------------------------------


def dyadic_histogram(
    df: DataFrame, group_cols: list[str], cents_col: str, shift: int = 12
) -> DataFrame:
    """Per-group bucket table (group..., bucket, cnt) over an integer
    value column: bucket = value >> shift (2^shift-wide bins).

    One groupBy — map-side combinable, exchange bounded by
    |groups| × value_range/2^shift rows — and merging two histograms is
    the same cell-wise SUM (the CMS/Prometheus merge). Quantile reads
    walk the cumulative counts; the estimate's error is bounded BY
    CONSTRUCTION at one bucket width, the contract a fixed-bin
    histogram trades against GK/KLL's adaptive bins (those need
    order-dependent compactions no SQL engine restates bit-exactly;
    this one is a plain integer aggregate any engine agrees on).

    Bucketing is an arithmetic right shift (exact int64 floor, never a
    double): negative values floor toward -inf exactly as the
    ``value >> shift`` contract states (-1 cent → bucket -1, not 0),
    and values ≥ 2^53 cannot be mis-bucketed by double rounding."""
    b = F.shiftright(F.col(cents_col).cast("long"), shift)
    return (
        df.select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dyadic_quantile_picks(
    hist: DataFrame, group_cols: list[str], qs: list[float], shift: int = 12
) -> DataFrame:
    """Quantile reads over a dyadic histogram: for each q, the bucket
    where the ceil(q·n)-th value lives (cumulative walk over ≤
    range/2^shift rows per group — a window over the tiny bucket table,
    never over the data), reported as the bucket midpoint in cents.

    Output: (group..., q, rank_r, bucket, est_cents). Midpoint = lo +
    half-width keeps the estimate integer; the true rank-r value lies in
    [lo, hi] by construction, so |est - true| <= 2^(shift-1)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    picks = None
    for q in qs:
        r = F.ceil(F.lit(q) * F.col("n")).cast("long")
        t = totals.select(*group_cols, F.lit(q).alias("q"), r.alias("rank_r"))
        c = cum.join(t, group_cols).filter(F.col("cum") >= F.col("rank_r"))
        p = (
            c.groupBy(*group_cols, "q", "rank_r")
            .agg(F.min("bucket").alias("bucket"))
        )
        picks = p if picks is None else picks.unionByName(p)
    half = 1 << (shift - 1)
    return picks.withColumn(
        "est_cents", (F.col("bucket") * (1 << shift) + half).cast("long")
    )
