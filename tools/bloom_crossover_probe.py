#!/usr/bin/env python
"""Bloom semi-join-reduction probe: measure BOTH join regimes.

``incremental_dedup``'s exact gate joins batch fingerprints against corpus
fingerprints. Two physical regimes exist:

- BROADCAST regime (small batch — the steady-state ingest shape): the
  batch side broadcasts, the corpus STREAMS through a broadcast-hash join
  with no exchange; the probe saves only the hash-table lookup per
  corpus row.
- SHUFFLE regime (batch past the broadcast threshold — a backfill or a
  giant crawl drop): the gate becomes a sort-merge join that EXCHANGES
  the corpus side. Pre-filtering the corpus with the plan-literal Bloom
  (a pure projection) prunes the rows entering the exchange to true
  matches + the false-positive sliver — the classic semi-join reduction.
  The probe simulates this regime at test scale by disabling auto
  broadcast (what naturally happens at 100 TB when the batch outgrows
  the threshold).

The probe separates CONSTRUCTION cost (the Bloom build job + the
plan-literal bitmap through analysis — paid once per micro-batch) from
steady-state EXECUTION. At incremental_dedup level the exec effect is
within noise at test scale (the near gate's shingling dominates the
operator); the isolated exact-gate A/B at 20M corpus rows measures the
mechanism itself at 3.1x (shuffle) / 2.3x (broadcast) — numbers recorded
in SCALE.md §4. This is why ``bloom_m_bits`` defaults to None and the
streaming loop opts in.

Usage:
  PYTHONPATH=. python tools/bloom_crossover_probe.py [SF_DIR] [RUNS] [COPIES]

Defaults: SF_DIR=/root/testdata/sf0.1, RUNS=3, COPIES=64 (corpus =
documents replicated with disjoint ids -> ~320k docs at sf0.1). Prints one
JSON line with both regimes' off/on medians.
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
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.catalog import load_table
    from sport_data_pipeline_spark.operators.dedup import incremental_dedup
    from sport_data_pipeline_spark.session import get_session

    spark = get_session("bloom_crossover_probe")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    base = docs.count()
    # corpus: disjoint-id replicas; texts get a per-copy suffix so the
    # replicas are distinct content (no cross-copy dup matches)
    copy_ids = spark.range(copies).select(F.col("id").alias("__c"))
    corpus = (
        docs.crossJoin(F.broadcast(copy_ids))
        .select(
            (F.col("doc_id") + F.col("__c") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("__c")).alias("text"),
            "lang",
            "source",
        )
        .persist()
    )
    n_corpus = corpus.count()
    batch = docs.filter(F.col("doc_id") % 25 == 0).persist()
    n_batch = batch.count()

    def run(bloom: int | None) -> tuple[float, float]:
        # construction (the Bloom build job + plan literal + analysis,
        # paid once per micro-batch in a loop) timed separately from
        # steady-state execution (the per-row probe cost at scale)
        t0 = time.time()
        df = incremental_dedup(
            batch, corpus, "doc_id", "text",
            block_cols=["lang", "source"], threshold=0.5, shingle_n=3,
            bloom_m_bits=bloom,
        )
        construct = time.time() - t0
        ts = []
        for _ in range(runs):
            t = time.time()
            df.count()
            ts.append(time.time() - t)
        return construct, median(ts)

    out: dict[str, dict[str, float]] = {}
    for regime, conf in (
        ("broadcast", "10485760"),  # Spark default threshold
        ("shuffle", "-1"),          # what a past-threshold batch plans as
    ):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
        (c_off, off), (c_on, on) = run(None), run(16384)
        out[regime] = {
            "construct_off": round(c_off, 3),
            "construct_on": round(c_on, 3),
            "exec_off": round(off, 3),
            "exec_on": round(on, 3),
            "exec_speedup": round(off / on, 3),
        }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(json.dumps({
        "sf_dir": sf_dir, "base_docs": base, "corpus": n_corpus,
        "batch": n_batch, "runs": runs, "results": out,
    }))


if __name__ == "__main__":
    main()
