#!/usr/bin/env python
"""Skew-hardening probe: measure a deliberately hot-keyed shuffle join
under (a) plain sort-merge, (b) AQE skew-join splitting, (c) the library's
``salted_join`` — the three strategies SCALE.md §9 documents for skewed
fact joins at cluster scale.

Input is a skewed replica built by make_scale_copy.py with HOT_FRAC > 0
(e.g. 30% of events on user_id = -1). The probed join is the realistic
skew-pain shape: events (large, hot-keyed) ⋈ per-(user, day) activity
dimension on user_id — the hot user's rows fan out by its day count, so a
plain sort-merge join funnels hot_frac × fanout of the work into ONE task
while every other task idles.

Broadcast is disabled for the probe (at 100 TB the user-grain dimension
outgrows the broadcast threshold — that regime is exactly when skew
matters), and the AQE skew thresholds are scaled DOWN proportionally
(8 MB/4 MB vs the 256 MB/64 MB defaults) so the probe's partition sizes
relate to its threshold the way a real cluster's do; nothing else is
tuned.

Usage: PYTHONPATH=. python tools/skew_probe.py SKEWED_DIR [RUNS]
Prints one JSON line {mode: {"sec": median, "runs": [...]}}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def probe_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from sport_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    facts = ev.select("event_id", "user_id", "event_type", "ts")
    dim = facts.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("day_events")
    )
    return facts, dim


def run_join(facts: DataFrame, dim: DataFrame, mode: str) -> int:
    if mode == "salted":
        from sport_data_pipeline_spark.operators.joins import salted_join

        joined = salted_join(facts, dim, ["user_id"], salt=32)
    elif mode == "skew_aware":
        from sport_data_pipeline_spark.operators.joins import skew_aware_join

        # profile-then-route: pays the per-key count pass, salts ONLY the
        # detected hot keys, joins the cold remainder plain
        joined = skew_aware_join(facts, dim, ["user_id"], threshold=10.0, salt=32)
    else:
        joined = facts.join(dim, "user_id")
    # aggregate to a tiny result so the timing is join+shuffle, not collect
    return joined.groupBy("event_type").agg(F.sum("day_events").alias("s")).count()


def median(xs: list[float]) -> float:
    ys = sorted(xs)
    m = len(ys) // 2
    return ys[m] if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2


MODES = {
    # classic sort-merge: the hot partition lands on one task
    "plain_smj": {"spark.sql.adaptive.enabled": "false"},
    # AQE runtime re-plan: OptimizeSkewedJoin splits the hot partition
    "aqe_skew": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    },
    # manual salting (the fallback for joins AQE can't split, e.g. ahead
    # of stateful streaming joins): correctness unit-tested vs plain join
    "salted": {"spark.sql.adaptive.enabled": "false"},
    # profile-then-route: measures the skew first, salts only hot keys
    "skew_aware": {"spark.sql.adaptive.enabled": "false"},
}


def main() -> None:
    from sport_data_pipeline_spark.session import get_session

    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_session("skew_probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    facts, dim = probe_frames(spark, sf_dir)
    out: dict[str, dict[str, object]] = {}
    for mode, confs in MODES.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        jm = mode if mode in ("salted", "skew_aware") else "plain"
        run_join(facts, dim, jm)  # warm
        times: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            run_join(facts, dim, jm)
            times.append(time.perf_counter() - t0)
        out[mode] = {"sec": round(median(times), 3), "runs": [round(t, 3) for t in times]}
        print(f"# {mode}: {out[mode]['sec']}s {out[mode]['runs']}", file=sys.stderr)
        # restore defaults touched by this mode before the next one
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
