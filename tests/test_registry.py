"""Registry-order contract: external correctness harnesses check a bounded
prefix of the registry (the first 50 entries), so the prefix must stay
exactly the curated DRIVER_WINDOW — every entry oracle-bearing, no operator
family left outside the window without an earlier representative."""

from sport_data_pipeline_spark.plans import all_queries
from sport_data_pipeline_spark.plans.registry import DRIVER_WINDOW


def test_driver_window_is_prefix():
    names = list(all_queries())
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_driver_window_size():
    # The harness checks exactly 50 entries; a larger window silently drops
    # queries from hard checking, a smaller one wastes checked slots.
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_driver_window_all_oracle_bearing():
    specs = all_queries()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert no_oracle == [], f"window entries without an oracle: {no_oracle}"


def test_window_covers_all_survey_ops():
    # Every operator id claimed by ANY registered query must be claimed by
    # at least one query inside the checked window (so no §2 op is only
    # covered by an unchecked registry-tail query).
    specs = all_queries()

    def ops(spec):
        return {t.strip() for t in spec.survey.split(",") if t.strip()}

    window_ops = set().union(*(ops(specs[n]) for n in DRIVER_WINDOW))
    tail_only = {
        n: sorted(ops(s) - window_ops)
        for n, s in specs.items()
        if n not in DRIVER_WINDOW and not ops(s) <= window_ops
    }
    # Known, accepted exceptions — all still checked by the local DuckDB
    # oracle suite: A6 histogram buckets and U2 two-column distinct union
    # gave up their window slots to families with no other coverage;
    # F4(text) is the text variant of in-window F4; X6 is plan-asserted
    # over every registered query (tests/test_plans.py).
    # A1(rollup)/A1(cube) are the grouping-sets variants of in-window A1;
    # llm-hard-negatives shares its execution shape (and window slot
    # rationale) with in-window ann-cosine.
    accepted = {
        "A6",
        "U2",
        "F4(text)",
        "X6",
        "A1(rollup)",
        "A1(cube)",
        "llm-hard-negatives",
        # PQ-ADC ANN: approximate variant of in-window ann-cosine (same
        # recall-contract pattern as in-window ann-cosine-ivf).
        "ann-cosine-pq",
        # Misra-Gries frequent items: sketch-family sibling of in-window
        # `sketch_profile` (HLL++/GK), same error-bound-contract pattern.
        "sketch-heavy-hitters",
        # time-series profile similarity: beyond-reference extension whose
        # execution shape (aligned-vector cosine top-k) is in-window via
        # ann-cosine; fully DuckDB-oracled in the tail.
        "ts-similarity",
        # Arrow/BLAS top-k: alternative physical path for the same rank
        # projection as in-window ann-cosine (embedding_topk); rotated out
        # in r5 to free a slot, agreement unit-tested + DuckDB-oracled.
        "ann-cosine-arrow",
        # streaming session windows: the streaming-machinery variant of
        # in-window T6 (sessionize_events batch twin) — same session
        # semantics, proven stream-equals-batch by its own verdict query
        # (stream_session_equivalence, DuckDB-oracled); r6 rotation
        # candidate per COVERAGE.md.
        "T6(stream)",
        # stream-stream interval join: the streaming-machinery variant of
        # in-window J10 (asof_clicks / scd2_point_in_time range
        # semantics) — proven stream-equals-batch by its own verdict query
        # (stream_join_equivalence, range-join count DuckDB-oracled); r6
        # rotation candidate per COVERAGE.md.
        "J10(stream)",
        # CDC snapshot diff: audit companion of in-window S10 upsert
        # routing (latest_per_key/record_unification cover the merge
        # itself); exact full-outer-join oracle in the tail
        # (snapshot_table_diff); r6 rotation candidate per COVERAGE.md.
        "cdc-diff",
    }
    real = {n: [o for o in lost if o not in accepted] for n, lost in tail_only.items()}
    real = {n: lost for n, lost in real.items() if lost}
    assert real == {}, f"survey ops only covered outside the window: {real}"
