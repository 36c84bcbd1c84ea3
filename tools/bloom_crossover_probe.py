#!/usr/bin/env python
"""Bloom semi-join-reduction crossover probe.

Measures ``incremental_dedup``'s exact+near routing with the Bloom
pre-filter OFF vs ON across corpus:batch ratios, holding the batch fixed
and growing the corpus. The build side is O(batch) with a handful of tiny
fixed stages, so the filter costs roughly a constant; the benefit grows
with the corpus rows it keeps out of the exact gate's join. The probe
prints the measured crossover so the default-off-at-bench-scale /
on-in-steady-state-loops choice (operators/dedup.py, SCALE.md §4) is a
number, not a guess.

Usage:
  PYTHONPATH=. python tools/bloom_crossover_probe.py [SF_DIR] [RUNS]

Defaults: SF_DIR=/root/testdata/sf0.1, RUNS=3. Prints one JSON line:
  {ratio: {"off": sec, "on": sec, "speedup": off/on}, ...}
"""

from __future__ import annotations

import json
import sys
import time


def median(xs: list[float]) -> float:
    ys = sorted(xs)
    m = len(ys) // 2
    return ys[m] if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.catalog import load_table
    from sport_data_pipeline_spark.operators.dedup import incremental_dedup
    from sport_data_pipeline_spark.session import get_session

    spark = get_session("bloom_crossover_probe")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # fixed small batch (the steady-state shape: batch << corpus)
    batch = docs.filter(F.col("doc_id") % 97 == 0).limit(200).persist()
    batch.count()

    out: dict[str, dict[str, float]] = {}
    for frac_denom in (8, 4, 2, 1):
        corpus = docs.filter(F.col("doc_id") % frac_denom == 1).persist()
        n_corpus = corpus.count()

        def run(bloom: int | None) -> float:
            ts = []
            for _ in range(runs):
                t = time.time()
                incremental_dedup(
                    batch, corpus, "doc_id", "text",
                    block_cols=["lang", "source"], threshold=0.5, shingle_n=3,
                    bloom_m_bits=bloom,
                ).count()
                ts.append(time.time() - t)
            return median(ts)

        off, on = run(None), run(65536)
        out[f"corpus={n_corpus}"] = {
            "off": round(off, 3),
            "on": round(on, 3),
            "speedup": round(off / on, 3),
        }
        corpus.unpersist()
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs, "batch": 200,
                      "runs": runs, "results": out}))


if __name__ == "__main__":
    main()
