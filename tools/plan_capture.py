"""Capture .explain("formatted") for queries into plans/r<N>/<query>_<tag>.txt.

Optimization-round evidence tool (guide §1.2/§7.2): the judge cannot run
Spark, so plan claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin")
are checked against these committed files.

Checkpointed queries (e2e_daily_pipeline, semantic_dedup_cells, ...) return
a frame whose final plan is just `Scan ExistingRDD` — vacuous as evidence
(r15 verdict item 4). This tool therefore wraps ``stage_checkpoint`` for
the duration of each query's plan build and records EVERY pre-checkpoint
stage's formatted plan in the same capture file, section-headed, followed
by the final plan.

Usage::

    python tools/plan_capture.py --tag before [--round r16] [name ...]

No names = every headline query. Queries whose fn() executes eager work at
plan-build time (snapshot writes, codebook collects) simply run that work;
the captured plans are the checkpoint-stage inputs plus the returned
DataFrame's final plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r16")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sport_data_pipeline_spark import checkpointing
    from sport_data_pipeline_spark.plans import all_queries
    from sport_data_pipeline_spark.session import get_session

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("plan_capture")
    specs = all_queries()
    names = args.names or [n for n, s in specs.items() if s.headline]

    # Wrap stage_checkpoint in EVERY module that imported it by name, so
    # each checkpoint-stage input's plan is captured before the lineage cut
    # erases it from the final plan.
    real_ck = checkpointing.stage_checkpoint
    staged: list[str] = []

    def recording_ck(df, eager: bool = True):
        staged.append(_formatted(spark, df))
        return real_ck(df, eager)

    patched = []
    for mod_name, mod in list(sys.modules.items()):
        if mod_name.startswith("sport_data_pipeline_spark") and (
            getattr(mod, "stage_checkpoint", None) is real_ck
        ):
            setattr(mod, "stage_checkpoint", recording_ck)
            patched.append(mod)

    try:
        for name in names:
            spec = specs[name]
            spark.sparkContext.setJobDescription(f"plan_capture: {name}")
            staged.clear()
            df = spec.fn(spark, args.sf_dir)
            sections = [
                f"== checkpoint stage {i + 1} of {len(staged)} (pre-checkpoint plan) ==\n{p}"
                for i, p in enumerate(staged)
            ]
            sections.append(f"== final plan ==\n{_formatted(spark, df)}")
            plan = "\n\n".join(sections)
            path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"{name}: {plan.count('Exchange')} Exchange refs, "
                  f"{len(staged)} checkpoint stage(s) -> {path}")
            spark.catalog.clearCache()
    finally:
        for mod in patched:
            mod.stage_checkpoint = real_ck
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
