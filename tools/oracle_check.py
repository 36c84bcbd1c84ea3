"""Driver-mimicking correctness check.

The external harness builds its OWN SparkSession (none of get_session's
confs — Spark defaults, 200 shuffle partitions) and runs
``__spark_entry__.queries()[name]`` against ``oracle_sql()[name]`` via
DuckDB with order-insensitive exact comparison. This tool reproduces that
environment so a query can be verified under DRIVER conditions (the r6
``e2e_daily_pipeline`` failure was a session-conf difference invisible to
the in-repo suite, whose fixture session carries our tuned confs).

Usage::

    python tools/oracle_check.py [--sf-dir DIR] [name ...]

No names = the full driver window (the 50 externally checked entries).
Exit code 0 iff every checked query matches bit-exactly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # same discipline as tests/test_queries_oracle.py and the driver:
    # sorted columns, sorted rows, exact values
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object and len(df) and df[c].map(
            lambda v: isinstance(v, bool)
        ).all():
            df[c] = df[c].astype(bool)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from sport_data_pipeline_spark.catalog import TABLES
    from sport_data_pipeline_spark.plans.registry import DRIVER_WINDOW

    # a VANILLA session, as the driver builds it: no tuned confs beyond
    # master/cores — configure_runtime inside queries() must do the rest
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle_check")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(DRIVER_WINDOW)
    failed = []
    for name in names:
        t0 = time.perf_counter()
        try:
            got = _normalize(queries[name](spark, args.sf_dir).toPandas())
        except Exception as exc:  # the r6 failure mode: query errors out
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, no oracle) "
                  f"[{time.perf_counter() - t0:.1f}s]")
            continue
        want = _normalize(con.execute(oracles[name]).df())
        try:
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"{len(got)} rows vs oracle {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=True, obj=name
            )
        except AssertionError as exc:
            print(f"FAIL {name}: {str(exc)[:400]}")
            failed.append(name)
            continue
        print(f"ok   {name}: {len(got)} rows bit-exact "
              f"[{time.perf_counter() - t0:.1f}s]")

    print(f"\n{len(names) - len(failed)}/{len(names)} match", flush=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
