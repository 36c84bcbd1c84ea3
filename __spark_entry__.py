"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sport_data_pipeline_spark``; every entry maps to
an operator family in SURVEY.md §2 (see each QuerySpec's ``survey`` field).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sport_data_pipeline_spark.plans import all_queries
from sport_data_pipeline_spark.session import configure_runtime


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top performers: 3-way join + agg + top-K) on sf0.001."""
    configure_runtime(spark)
    return all_queries()["top_performers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # No clearCache here: this runs at PLAN-BUILD time, so it would
            # clobber still-unmaterialized persist markers of previously
            # built queries (and any cache the harness itself owns).
            # bench.py clears per query because it controls when each query
            # materializes; a correctness harness accumulates only small
            # sf0.01 intermediates.
            configure_runtime(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted where the op is
    not SQL-expressible — MinHash/SimHash signatures use Spark xxhash64)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
