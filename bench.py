#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-ish action (collect for small
results) so the timing covers scan → shuffle → result, not plan building.
"""

from __future__ import annotations

import json
import os
import time

from sport_data_pipeline_spark.plans import all_queries
from sport_data_pipeline_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    specs = [s for s in all_queries().values() if s.headline]
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    specs[0].fn(spark, sf_dir).count()

    for spec in specs:
        t0 = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[spec.name] = round(dt, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
