"""bench.py's noise-gated aggregation: the official perf artifact's
estimator, pinned against the r5 failure mode (a majority of contended
runs dragging the median onto the co-tenant's number)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
from bench import aggregate, per_query_min  # noqa: E402


def test_gate_discards_contended_runs():
    # 5 runs of 2 queries; runs 0/3 are ~2x contended (uniform inflation)
    samples = {
        "q1": [2.0, 1.0, 1.1, 2.2, 0.9],
        "q2": [4.0, 2.0, 2.1, 4.1, 1.9],
    }
    totals = [sum(samples[q][i] for q in samples) for i in range(5)]
    timings, clean = aggregate(samples, totals, gate=1.5)
    assert clean == [1, 2, 4]  # contended runs 0 and 3 excluded
    assert timings == {"q1": 1.0, "q2": 2.0}  # medians of the clean runs


def test_all_runs_contended_still_returns_best():
    # worst case: every run but the best exceeds the gate — the best run
    # always survives, so the artifact degrades to best-run, never empty
    samples = {"q": [10.0, 1.0, 9.0]}
    timings, clean = aggregate(samples, [10.0, 1.0, 9.0], gate=1.5)
    assert clean == [1]
    assert timings == {"q": 1.0}


def test_per_query_min_ignores_the_gate():
    # the r16 companion column: min over ALL runs, even ones the gate
    # discards — a contended run can never inflate it, and a best-run
    # sample inside an otherwise-contended session still counts
    samples = {
        "q1": [2.0, 1.0, 1.1, 2.2, 0.9],
        "q2": [4.0, 2.0, 2.1, 4.1, 1.9],
    }
    assert per_query_min(samples) == {"q1": 0.9, "q2": 1.9}


def test_r5_failure_mode_majority_contended():
    # r5's raw totals (19.8 best, 3 of 5 contended): a plain median lands
    # on a contended run; the gated median must not
    totals = [92.8, 60.8, 19.8, 119.3, 27.7]
    samples = {"q": [t / 10 for t in totals]}  # per-query mirrors totals
    timings, clean = aggregate(samples, totals, gate=1.5)
    assert clean == [2, 4]  # only 19.8 and 27.7 survive
    assert timings["q"] == (1.98 + 2.77) / 2  # not 6.08 (the plain median)
