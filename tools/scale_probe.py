#!/usr/bin/env python
"""Scaling probe: time registered queries at a base SF dir and an N× replica
(see make_scale_copy.py) and print per-query ratios.

A ratio ≤ N is at-most-linear in data volume; well below N means fixed
overheads still dominate at the base scale. Superlinear rows are the
within-block all-pairs operators — their mitigations are documented in
SCALE.md §8.

Usage:
  PYTHONPATH=. python tools/scale_probe.py BASE_DIR SCALE_DIR [RUNS] [q1,q2,...]

Defaults: RUNS=3; queries = all headline queries plus the non-headline
probe set below. Prints one JSON line {query: {base, scaled, ratio}}.
"""

from __future__ import annotations

import json
import sys
import time

EXTRA_PROBES = (
    "fuzzy_entity_match_blocked",
    "late_dup_ticks",
    "hard_negative_mining",
    "scd2_point_in_time",
    "cube_order_stats",
    "corpus_train_shards",
    "user_activity_topk",
    "pq_topk_recall",
)


def median(xs: list[float]) -> float:
    ys = sorted(xs)
    m = len(ys) // 2
    return ys[m] if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2


def main() -> None:
    from sport_data_pipeline_spark.plans import all_queries
    from sport_data_pipeline_spark.session import get_session

    base_dir, scale_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    specs = all_queries()
    if len(sys.argv) > 4:
        names = sys.argv[4].split(",")
    else:
        names = [n for n, s in specs.items() if s.headline] + list(EXTRA_PROBES)

    spark = get_session("scale_probe")
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = specs[name].fn
        times: dict[str, list[float]] = {"base": [], "scaled": []}
        # warm BOTH sides once (footers, file listing, JIT) so the first
        # timed run of either scale carries no one-time costs
        fn(spark, base_dir).count()
        fn(spark, scale_dir).count()
        for _ in range(runs):
            for tag, d in (("base", base_dir), ("scaled", scale_dir)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).count()
                times[tag].append(time.perf_counter() - t0)
        b, s = median(times["base"]), median(times["scaled"])
        out[name] = {"base": round(b, 3), "scaled": round(s, 3), "ratio": round(s / b, 1)}
        print(f"# {name}: {b:.2f}s -> {s:.2f}s ({s / b:.1f}x)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
