"""Isolated per-query timing probe (r15 optimization loop).

Times named queries exactly the way bench.py does (clearCache per rep,
count() action, warm session) and prints per-query median/min over N reps.
Not the official bench — a fast A/B instrument for optimization work.

Usage: python tools/query_probe.py [--sf-dir DIR] [--reps N] name [name...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from sport_data_pipeline_spark.plans import all_queries
    from sport_data_pipeline_spark.session import get_session

    spark = get_session("query_probe")
    specs = all_queries()
    for name in args.names:
        if name not in specs:
            print(f"?? {name}: not registered")
            return 2
    # warm JVM + parquet footers
    specs[args.names[0]].fn(spark, args.sf_dir).count()
    for name in args.names:
        times = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            specs[name].fn(spark, args.sf_dir).count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: median={statistics.median(times):.3f}s "
            f"min={min(times):.3f}s reps={[round(t, 3) for t in times]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
