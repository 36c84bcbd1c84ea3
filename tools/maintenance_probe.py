#!/usr/bin/env python
"""Maintenance-op scaling probe: retention and compaction at 1× vs 10×.

Claims under test (sources/sinks.py):

- ``enforce_retention`` is a PARTITION operation — cost O(partitions
  dropped), INDEPENDENT of table row count. Measured by building the same
  day-partitioned events table at 1× and 10× rows and dropping the same
  number of day partitions from each: the times should match (both ~rm -r
  of k directories), while a row-filter rewrite would be 10× slower.
- ``compact_parquet`` is one linear rewrite sized from on-disk bytes —
  cost ∝ data, file count collapses to ⌈bytes/target⌉. Measured on a
  deliberately fragmented table (maxRecordsPerFile) at both scales.

Usage:
  PYTHONPATH=. python tools/maintenance_probe.py BASE_DIR SCALE_DIR [RUNS]

Prints ONE JSON line with per-op times at both scales and the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _files(path: str) -> int:
    return sum(
        1
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.catalog import load_table
    from sport_data_pipeline_spark.session import get_session
    from sport_data_pipeline_spark.sources.sinks import (
        compact_parquet,
        enforce_retention,
        write_partitioned,
    )

    base_dir, scale_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_session("maintenance_probe")
    out: dict[str, dict] = {}
    tmp = tempfile.mkdtemp(prefix="sdp_maint_")
    try:
        for label, sf_dir in (("base", base_dir), ("scaled", scale_dir)):
            ev = (
                load_table(spark, sf_dir, "events")
                .withColumn("day", F.to_date("ts"))
                .filter(F.col("day").isNotNull())
            )
            days = sorted(
                r["day"] for r in ev.select("day").distinct().collect()
            )
            # retention: identical partition count at both scales; drop the
            # same number of oldest partitions each run (rebuild per run)
            n_drop = max(2, len(days) // 4)
            cutoff = str(days[n_drop])
            ret_times, rows = [], ev.count()
            for _ in range(runs):
                p = f"{tmp}/{label}_ret"
                shutil.rmtree(p, ignore_errors=True)
                write_partitioned(ev, p, ["day"])
                t0 = time.perf_counter()
                dropped = enforce_retention(spark, p, "day", cutoff=cutoff)
                ret_times.append(time.perf_counter() - t0)
                assert len(dropped) == n_drop, (label, dropped)
            # compaction: fragment deliberately, then one sized rewrite
            frag = f"{tmp}/{label}_frag"
            comp_times = []
            for _ in range(runs):
                shutil.rmtree(frag, ignore_errors=True)
                ev.write.option("maxRecordsPerFile", "2000").mode(
                    "overwrite"
                ).parquet(frag)
                before = _files(frag)
                t0 = time.perf_counter()
                compact_parquet(spark, frag, target_mb=128)
                comp_times.append(time.perf_counter() - t0)
            out[label] = {
                "rows": rows,
                "partitions": len(days),
                "retention_dropped": n_drop,
                "retention_sec": round(sorted(ret_times)[runs // 2], 4),
                "compact_files_before": before,
                "compact_files_after": _files(frag),
                "compact_sec": round(sorted(comp_times)[runs // 2], 4),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    out["retention_ratio"] = round(
        out["scaled"]["retention_sec"] / out["base"]["retention_sec"], 2
    )
    out["compact_ratio"] = round(
        out["scaled"]["compact_sec"] / out["base"]["compact_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
