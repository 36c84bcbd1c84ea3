"""The correctness gate, locally: every registered query with an oracle is
executed in Spark and in DuckDB on sf0.001 and compared exactly (sorted
columns, sorted rows, exact values — the same discipline as the driver's
order-insensitive value-hash)."""

from __future__ import annotations

import pandas as pd
import pytest

from sport_data_pipeline_spark.plans import all_queries

from conftest import SF_DIR

SPECS = all_queries()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object and df[c].map(lambda v: isinstance(v, bool)).all():
            df[c] = df[c].astype(bool)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if s.oracle])
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    got = _normalize(spec.fn(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if not s.oracle])
def test_query_runs(name, spark):
    """Non-SQL-expressible ops at least run and have a stable schema."""
    df = SPECS[name].fn(spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
