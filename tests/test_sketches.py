"""Deterministic-sketch units: register-level agreement with a pure-Python
HLL/CMS over the same md5-derived hashes, mergeability, and the estimator's
error contract on known cardinalities."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sport_data_pipeline_spark.operators.sketches import (
    cms_cells,
    cms_point_estimates,
    hll_constants,
    hll_registers,
    hll_sketch_summary,
    merge_hll_registers,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_registers(values, p=8):
    m = 1 << p
    w_bits = 60 - p
    regs: dict[int, int] = {}
    for v in values:
        h = _h60(str(v))
        reg = h % m
        w = h >> p
        rho = (w_bits + 1) - w.bit_length() if w > 0 else w_bits + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_pure_python(spark):
    vals = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v string").withColumn(
        "g", F.lit("all")
    )
    got = {
        r["reg"]: r["rho"]
        for r in hll_registers(df, ["g"], "v").collect()
    }
    assert got == _py_registers(vals)


def test_hll_estimate_within_5_sigma_and_exact_s(spark):
    n = 5000
    df = spark.createDataFrame([(i % n,) for i in range(3 * n)], "v bigint").withColumn(
        "g", F.lit("all")
    )
    regs = hll_registers(df, ["g"], "v")
    row = hll_sketch_summary(regs, ["g"]).collect()[0]
    # S restated from the python registers: exact integer agreement
    p = 8
    m, shift = 1 << p, 60 - p + 1
    pyregs = _py_registers([i % n for i in range(3 * n)])
    s_py = sum(1 << (shift - r) for r in pyregs.values()) + (m - len(pyregs)) * (
        1 << shift
    )
    assert row["hll_s"] == s_py
    c, _ = hll_constants(p)
    assert row["est"] == pytest.approx(c / s_py, abs=0.0)
    # raw-regime error contract: 5 sigma at rsd = 1.04/sqrt(256)
    assert abs(row["est"] - n) <= 5 * (1.04 / 16) * n


def test_hll_merge_equals_whole(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "v bigint").withColumn(
        "g", F.lit("all")
    )
    whole = hll_registers(df, ["g"], "v")
    a = hll_registers(df.filter(F.col("v") % 2 == 0), ["g"], "v")
    b = hll_registers(df.filter(F.col("v") % 2 == 1), ["g"], "v")
    merged = merge_hll_registers(a, b, ["g"])
    got_w = {(r["reg"], r["rho"]) for r in whole.collect()}
    got_m = {(r["reg"], r["rho"]) for r in merged.collect()}
    assert got_w == got_m


def _py_cms(values, d=4, w=512):
    cells: dict[tuple[int, int], int] = {}
    for v in values:
        for i in range(d):
            c = _h60(f"{i}:{v}") % w
            cells[(i, c)] = cells.get((i, c), 0) + 1
    return cells


def test_cms_cells_match_pure_python_and_merge_is_sum(spark):
    vals = [i % 100 for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {(r["row"], r["cell"]): r["cnt"] for r in cms_cells(df, "v").collect()}
    assert got == _py_cms(vals)
    # merge = cell-wise sum: two value-disjoint halves sum to the whole
    a = cms_cells(df.filter(F.col("v") < 50), "v")
    b = cms_cells(df.filter(F.col("v") >= 50), "v")
    summed = (
        a.unionByName(b).groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))
    )
    got_sum = {(r["row"], r["cell"]): r["cnt"] for r in summed.collect()}
    assert got_sum == got


def test_cms_point_estimates_overestimate_only(spark):
    vals = [i % 37 for i in range(1110)]  # every value occurs 30 times
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    cells = cms_cells(df, "v")
    probes = spark.createDataFrame([(v,) for v in range(37)], "v bigint")
    est = {
        r["v"]: r["cms_est"]
        for r in cms_point_estimates(cells, probes, "v").collect()
    }
    assert set(est) == set(range(37))
    for v, e in est.items():
        assert e >= 30  # CMS never underestimates
    # absent probe estimates >= 0 and is whatever collided into its cells
    ghost = spark.createDataFrame([(99999,)], "v bigint")
    (g,) = cms_point_estimates(cells, ghost, "v").collect()
    assert g["cms_est"] >= 0


def test_kmv_bottomk_matches_python_and_merges(spark):
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.operators.sketches import (
        kmv_bottomk,
        kmv_estimate_literal,
        kmv_overlap,
    )

    vals_a = list(range(0, 3000))
    vals_b = list(range(1500, 4500))
    k = 128
    df_a = spark.createDataFrame([(v,) for v in vals_a * 2], "v bigint")  # dups absorbed
    df_b = spark.createDataFrame([(v,) for v in vals_b], "v bigint")
    ka = sorted(r["h"] for r in kmv_bottomk(df_a, "v", k).collect())
    kb = sorted(r["h"] for r in kmv_bottomk(df_b, "v", k).collect())
    py_a = sorted({_h60(str(v)) for v in vals_a})[:k]
    py_b = sorted({_h60(str(v)) for v in vals_b})[:k]
    assert ka == py_a and kb == py_b
    # union merge = bottom-k of the concatenation; overlap count matches python
    union, ov = kmv_overlap(
        kmv_bottomk(df_a, "v", k), kmv_bottomk(df_b, "v", k), k
    )
    ku = sorted(r["h"] for r in union.collect())
    py_u = sorted(set(py_a) | set(py_b))[:k]
    assert ku == py_u
    (got_ov,) = ov.collect()
    py_ov = sum(1 for h in py_u if h in set(py_a) and h in set(py_b))
    assert got_ov["overlap_k"] == py_ov
    # distinct estimates within 5 sigma of truth: |A| = 3000, |A u B| = 4500
    assert abs(kmv_estimate_literal(k) / ka[-1] - 3000) <= 5 / (k - 2) ** 0.5 * 3000
    assert abs(kmv_estimate_literal(k) / ku[-1] - 4500) <= 5 / (k - 2) ** 0.5 * 4500
    # jaccard estimate within the worst-case 5 sigma bound
    j_true = 1500 / 4500
    assert abs(py_ov / k - j_true) <= 5 * (0.25 / k) ** 0.5


def test_bloom_no_false_negatives_and_merge(spark):
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.createDataFrame([(v,) for v in range(500)], "k bigint")
    words = bloom_build(keys, "k", m_bits=4096, j=4)
    # every inserted key passes — the Bloom guarantee
    probed = bloom_probe(keys, "k", words, m_bits=4096, j=4)
    assert probed.filter(~F.col("bloom_pass")).count() == 0
    # merge = bit_or of the word tables: two halves equal the whole
    a = bloom_build(keys.filter("k < 250"), "k", m_bits=4096, j=4)
    b = bloom_build(keys.filter("k >= 250"), "k", m_bits=4096, j=4)
    merged = {
        r["word"]: r["wbits"]
        for r in a.unionByName(b).groupBy("word").agg(F.bit_or("wbits").alias("wbits")).collect()
    }
    whole = {r["word"]: r["wbits"] for r in words.collect()}
    assert merged == whole
    # a saturated-enough filter produces SOME false positives on outsiders
    outsiders = spark.createDataFrame([(v,) for v in range(10_000, 20_000)], "k bigint")
    fp = bloom_probe(outsiders, "k", words, m_bits=4096, j=4).filter("bloom_pass").count()
    assert 0 < fp < 2000  # ~ (1-e^-0.49)^4 * 10000 ~ 230 expected

def test_bloom_probe_is_literal_projection(spark):
    """The probe must never shuffle OR JOIN the fact table: the collected
    word table folds into the plan as a constant array (the Spark
    runtime-filter shape), so the probed plan contains ZERO exchanges
    and zero joins of any kind — just the fact scan plus a projection."""
    from sport_data_pipeline_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.createDataFrame([(v,) for v in range(100)], "k bigint")
    words = bloom_build(keys, "k", m_bits=4096, j=4)
    fact = spark.range(0, 1000).withColumnRenamed("id", "k")

    probed = bloom_probe(fact, "k", words, m_bits=4096, j=4)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_dyadic_histogram_floor_buckets_negatives(spark):
    """Bucketing is an arithmetic shift (exact int64 floor): negative
    cents floor toward -inf (-1 -> bucket -1, -4097 -> bucket -2 at
    shift 12), never collapsing -4095..4095 into bucket 0 the way a
    truncating double division would — the half-bucket error contract
    depends on every bucket spanning exactly 2^shift values."""
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.operators.sketches import dyadic_histogram

    vals = [-4097, -4096, -1, 0, 4095, 4096]
    df = spark.createDataFrame([(v,) for v in vals], "cents bigint").withColumn(
        "g", F.lit("all")
    )
    got = {r["bucket"]: r["cnt"] for r in dyadic_histogram(df, ["g"], "cents", 12).collect()}
    assert got == {-2: 1, -1: 2, 0: 2, 1: 1}


def test_dyadic_quantile_within_half_bucket(spark):
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.operators.sketches import (
        dyadic_histogram,
        dyadic_quantile_picks,
    )

    import numpy as np

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1_000_000, 20_000)
    df = spark.createDataFrame([(int(v),) for v in vals], "cents bigint").withColumn(
        "g", F.lit("all")
    )
    shift = 12
    hist = dyadic_histogram(df, ["g"], "cents", shift)
    picks = dyadic_quantile_picks(hist, ["g"], [0.5, 0.95, 0.99], shift)
    got = {r["q"]: r for r in picks.collect()}
    s = np.sort(vals)
    for q in (0.5, 0.95, 0.99):
        r = int(np.ceil(q * len(s)))
        true = int(s[r - 1])  # rank-r value, 1-indexed
        est = got[q]["est_cents"]
        assert abs(est - true) <= (1 << (shift - 1)), (q, est, true)
        # the picked bucket is exactly the one containing the rank-r value
        assert got[q]["bucket"] == true >> shift
    # merge = cell-wise sum reproduces the whole histogram
    a = dyadic_histogram(df.filter("cents % 2 = 0"), ["g"], "cents", shift)
    b = dyadic_histogram(df.filter("cents % 2 = 1"), ["g"], "cents", shift)
    summed = {
        r["bucket"]: r["cnt"]
        for r in a.unionByName(b).groupBy("g", "bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    whole = {r["bucket"]: r["cnt"] for r in hist.collect()}
    assert summed == whole
