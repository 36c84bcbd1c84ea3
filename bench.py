#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-ish action (collect for small
results) so the timing covers scan → shuffle → result, not plan building.

Per-query numbers are a NOISE-GATED median of $SPARK_GRAFT_BENCH_RUNS runs
(default 7 — the r9 quiet-box requalification protocol, SCALE.md §8h):
this VM's co-tenant noise swings single runs up to 6× (r5's
raw totals spanned 19.8–119.3 s for identical code), so a plain median
breaks down whenever a majority of runs are contended. The gate keeps only
runs whose total is within $SPARK_GRAFT_BENCH_NOISE_GATE (default 1.5×) of
the best run — defensible because the queries are CPU-bound with caches
cleared per query, so the fastest observed run is the least-contended
measurement and slower totals are co-tenant interference, not variance in
the code under test. The JSON carries the aggregation rule, the raw
per-run totals under "runs", the best-run total under "min_run_total",
and a per-table data-epoch fingerprint under "data".

The r9 requal discipline is encoded here so an official artifact cannot
silently regress to a 2-of-5-runs-kept number: (a) a PRE-FLIGHT CO-TENANT
CHECK records any already-running JVMs under "cotenant_jvms" (a non-empty
list means the box was not quiet — rerun after `pgrep -f java` comes back
clean); (b) 7 runs by default; (c) the gated and UNGATED medians are
published together with their agreement under "gated_ungated_agreement" —
r8's 38%-apart estimators flagged a real problem, r9's 2% closed it, so
the agreement number IS the run's self-check.
"""

from __future__ import annotations

import json
import os
import time

from sport_data_pipeline_spark.plans import all_queries
from sport_data_pipeline_spark.session import get_session


def cotenant_jvms() -> list[str] | str:
    """Pre-flight quiet-box check: command lines of java processes already
    running when the bench starts (leaked pytest sessions, a concurrent
    build). Run BEFORE creating our own session, so anything found is a
    co-tenant that will contend for CPU and inflate every timing.

    Returns the (possibly empty) list on a readable /proc; the sentinel
    string "unsupported" when /proc cannot be scanned at all, so an empty
    list always means a genuinely verified-quiet box, never a blind one.
    A JVM counts when any argv token's path basename is "java" (covers
    wrapper launchers whose argv0 is the wrapper, not the JVM binary)."""
    out: list[str] = []
    try:
        pids = os.listdir("/proc")
    except OSError:
        return "unsupported"
    for pid in pids:
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        argv = [a.decode(errors="replace") for a in raw.split(b"\0") if a]
        if any(os.path.basename(a) == "java" for a in argv):
            cmd = " ".join(argv)
            out.append(f"{pid}: {cmd[:120].strip()}")
    return out


def data_fingerprint(sf_dir: str) -> dict[str, object]:
    """Data-epoch stamp: {table: [bytes, mtime]} for every parquet in the
    bench dir. Bench totals are only comparable across rounds when this
    fingerprint is unchanged — the test corpus has been regenerated between
    rounds before, which shifted per-query times with zero code change."""
    fp: dict[str, object] = {}
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            path = os.path.join(sf_dir, f)
            if os.path.isdir(path):  # directory-style dataset: sum the parts
                parts = [
                    os.path.join(dp, fn)
                    for dp, _, fns in os.walk(path)
                    for fn in fns
                    if not fn.startswith((".", "_"))
                ]
                size = sum(os.stat(p).st_size for p in parts)
                mtime = max((int(os.stat(p).st_mtime) for p in parts), default=0)
            else:
                st = os.stat(path)
                size, mtime = st.st_size, int(st.st_mtime)
            fp[f.removesuffix(".parquet")] = [size, mtime]
    return fp


def aggregate(
    samples: dict[str, list[float]],
    run_totals: list[float],
    gate: float,
) -> tuple[dict[str, float], list[int]]:
    """Noise-gated aggregation: keep runs whose TOTAL is within ``gate``×
    of the best run (contention inflates every query near-uniformly, so
    run-total is the contention detector), then per-query median over the
    surviving runs. Returns (per-query timings, kept run indexes). The
    best run always survives, so ``clean`` is never empty."""

    def median(xs: list[float]) -> float:
        ys = sorted(xs)
        m = len(ys) // 2
        return ys[m] if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2

    min_total = min(run_totals)
    clean = [i for i, t in enumerate(run_totals) if t <= gate * min_total]
    timings = {
        name: round(median([xs[i] for i in clean]), 4) for name, xs in samples.items()
    }
    return timings, clean


def per_query_min(samples: dict[str, list[float]]) -> dict[str, float]:
    """Per-query MIN across ALL runs (ungated) — the contention-robust
    companion column (r16, verdict item 2): the gated median is still the
    official number, but when ambient load slips a contended run past the
    1.5x gate (r15: a 42 s run entered a 29 s median and manufactured 24
    phantom regressions), the min column is the round-over-round
    comparison that cannot be inflated by a co-tenant. Additions-only:
    "value"/"queries" semantics are unchanged."""
    return {name: round(min(xs), 4) for name, xs in samples.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cotenants = cotenant_jvms()  # before our own JVM exists
    spark = get_session("bench")

    specs = [s for s in all_queries().values() if s.headline]
    # 7 runs (the r9 requalification default): this box's co-tenant noise
    # swings single runs 3×+ (observed totals 13s..29s within one
    # session); a median-of-7 with the noise gate keeps a couple of noisy
    # runs from moving the official number AND leaves enough clean runs
    # for the median to be meaningful when one or two are contended.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7")))

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    specs[0].fn(spark, sf_dir).count()

    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    run_totals: list[float] = []
    for _ in range(n_runs):
        run_total = 0.0
        for spec in specs:
            # Operators that persist intermediates (dedup signature tables)
            # cannot unpersist before their caller materializes the result,
            # so a multi-query session accumulates cache. Clear it per query:
            # each timing then measures the query, not its predecessors'
            # eviction churn (measured 4.7s vs 1.1s on ngram_jaccard).
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[spec.name].append(dt)
            run_total += dt
        run_totals.append(round(run_total, 4))

    # Noise gate: see aggregate() — a contended run inflates every query
    # near-uniformly (r5 evidence: 1.4–2.5× across the board with zero
    # code change), so per-query medians over the gated runs measure the
    # code, not the co-tenant.
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_NOISE_GATE", "1.5"))
    timings, clean = aggregate(samples, run_totals, gate)
    # the PLAIN (ungated) estimator published alongside: run-total gating
    # cannot distinguish co-tenant contention from genuine intermittent
    # pathology (GC/spill/skew), so drift between the two estimators
    # across rounds is the tell that the gate is hiding something real.
    ungated, _ = aggregate(samples, run_totals, float("inf"))
    min_total = min(run_totals)
    total = round(sum(timings.values()), 4)
    ungated_total = round(sum(ungated.values()), 4)
    agreement = round(ungated_total / total, 4) if total else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # additions-only observability (r16): per-query min over
                # ALL runs (see per_query_min) and the session's effective
                # parallelism — proof that $SPARK_GRAFT_CPUS reached the
                # scheduler, so a scaling run can distinguish "env honored
                # but overhead-bound" from "env ignored".
                "min": per_query_min(samples),
                "parallelism": spark.sparkContext.defaultParallelism,
                "runs": run_totals,
                "min_run_total": round(min_total, 4),
                "ungated_median_total": ungated_total,
                "gated_ungated_agreement": agreement,
                "cotenant_jvms": cotenants,
                "aggregation": (
                    f"per-query median over runs with total <= {gate}x the best "
                    f"run ({len(clean)}/{len(run_totals)} runs kept)"
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "data": data_fingerprint(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
