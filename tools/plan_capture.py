"""Capture .explain("formatted") for queries into plans/r<N>/<query>_<tag>.txt.

Optimization-round evidence tool (guide §1.2/§7.2): the judge cannot run
Spark, so plan claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin")
are checked against these committed files.

Usage::

    python tools/plan_capture.py --tag before [--round r15] [name ...]

No names = every headline query. Queries whose fn() executes eager work at
plan-build time (snapshot writes, codebook collects) simply run that work;
the captured plan is the returned DataFrame's final plan either way.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r15")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sport_data_pipeline_spark.plans import all_queries
    from sport_data_pipeline_spark.session import get_session

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("plan_capture")
    specs = all_queries()
    names = args.names or [n for n, s in specs.items() if s.headline]
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"plan_capture: {name}")
        df = spec.fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange refs -> {path}")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
