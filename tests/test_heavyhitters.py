"""Misra-Gries heavy hitters: exactness on small vocabularies, the
underestimate-only property, and the N/(k+1) bound under hostile
partitionings (the guarantee the registered contract query hashes on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sport_data_pipeline_spark.operators.heavyhitters import _compress, heavy_hitters


def _exact(rows):
    from collections import Counter

    c = Counter()
    for items in rows:
        c.update(items)
    return c


@pytest.fixture()
def skewed(spark):
    # zipf-ish: item_i appears ~ (60 - i) times, plus a long tail of singletons
    rows = []
    for i in range(40):
        rows.extend([[f"hot_{i}"]] * (60 - i))
    rows.extend([f"tail_{j}"] for j in range(300))
    return spark.createDataFrame([(r,) for r in rows], "toks array<string>"), _exact(rows)


def test_compress_subtracts_kth_and_keeps_positives():
    counts = {"a": 10, "b": 7, "c": 3, "d": 1}
    out = _compress(counts, 2)
    # 3rd largest = 3: a->7, b->4, c/d dropped
    assert out == {"a": 7, "b": 4}
    assert _compress(counts, 10) == counts  # small vocab: exact


def test_exact_when_vocabulary_fits(spark, skewed):
    df, exact = skewed
    est = {r["item"]: r["est"] for r in heavy_hitters(df, "toks", k=10_000).collect()}
    assert est == dict(exact)


@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_mg_guarantee_any_partitioning(spark, skewed, n_parts):
    df, exact = skewed
    k = 16
    n_total = sum(exact.values())
    est = {
        r["item"]: r["est"]
        for r in heavy_hitters(df.repartition(n_parts), "toks", k=k).collect()
    }
    assert len(est) <= k
    for item, e in est.items():
        assert e <= exact[item]  # never overcounts
    for item, true in exact.items():
        e = est.get(item, 0)
        assert (true - e) * (k + 1) <= n_total  # MG bound, exact integers
    # the clear heavy hitters (true > N/(k+1)) must survive with est > 0
    for item, true in exact.items():
        if true * (k + 1) > n_total:
            assert est.get(item, 0) > 0
