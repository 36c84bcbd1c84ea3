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
    # oracle suite. (r8 returned A1(rollup), A1(cube), ts-similarity and
    # A11 to the window via rollup_pricing, cube_order_stats,
    # user_activity_topk and field_coverage — the rotation that closed
    # the driver-row backlog.)
    accepted = {
        # Arrow/BLAS top-k: alternative physical path for the same rank
        # projection as in-window ann-cosine (embedding_topk); rotated out
        # in r5 to free a slot, agreement unit-tested + DuckDB-oracled.
        # (ann-cosine-ivf was accepted here r6–r8; the r9 rotation returned
        # it to the window via incremental_semantic_dedup_ivf.)
        "ann-cosine-arrow",
        # HLL++/GK sketch profile: rotated out in r6 (green rows r4+r5);
        # the in-window sketch-family slot moved to the Misra-Gries
        # heavy-hitters sibling (same error-bound-contract pattern); the
        # approximate variants of in-window exact A2/A7 stay DuckDB-
        # oracled in the tail via in-query error-bound booleans.
        "A2(approx)",
        "A7(approx)",
        # scalar CASE/aliasing projection variants of in-window F12
        # (top_performers, lm_quality_score); projection_case carried them
        # green r1–r5, rotated out in r6, still DuckDB-oracled.
        "F1",
        "F6",
        # pivot matrix: the PIVOT presentation of in-window A5 grouped
        # counts (lang_stats); pivot_status_matrix carried the tag green
        # r1–r5, rotated out in r6 for the e2e pipeline row, still
        # DuckDB-oracled.
        "A5(pivot)",
        # late/duplicate tick policy, batch twin: the deterministic batch
        # restatement of in-window T5(stream) (stream_batch_equivalence's
        # watermarked stateful dedup); late_dup_ticks carried the tag
        # green r2–r5, rotated out in r6, still DuckDB-oracled.
        "T5",
        # freshness union-stats: freshness_stats carried A10 green r1–r6,
        # rotated out in r7 to free a slot; U1 stays in-window via
        # union_distinct_keys + snapshot_table_diff; still DuckDB-oracled.
        "A10",
        # per-language text aggregate: the text variant of in-window A7
        # (segment_stats); lang_stats carried it green r1–r6, rotated out
        # in r7, still DuckDB-oracled.
        "A7(text)",
        # generator-function tag: the explode/posexplode shape stays
        # in-window via dedup_spans_rewrite (span/position explode) and
        # corpus_train_shards (chunk explode); doc_chunks carried the tag
        # green r1–r6, rotated out in r7, still DuckDB-oracled and still
        # a bench headline row (the r8 refresh widened the set to 26).
        "UDTF",
        # --- r8 rotation (driver-row-backlog close): each tag below left
        # the window with a green row history and an in-window sibling of
        # the same execution shape; all stay DuckDB-oracled locally. ---
        # regex token split: the text variant of in-window F4
        # (parse_functions); token_counts carried it green r7.
        "F4(text)",
        # width-bucket histogram: a map-side bucket-id expression feeding
        # the in-window A5 grouped-count shape (frequency_count);
        # histogram_bucket carried it green r5–r7.
        "A6",
        # hard-negative mining: the same broadcast-probe cosine top-k
        # shape as in-window ann-cosine (user_activity_topk);
        # hard_negative_mining carried it green r7.
        "llm-hard-negatives",
        # union-distinct: in-window U1 (snapshot_table_diff) plus the
        # partial-distinct-before-exchange shape; union_distinct_keys
        # carried it green r7.
        "U2",
        # text-side coverage stats: the documents-table variant of
        # in-window A11 (field_coverage); doc_quality carried it green
        # r6–r7.
        "A11(text)",
        # ratio of grouped decimal sums: in-window A1/A2 grouped
        # aggregation with a derived division (league_summary);
        # ratio_of_sums carried it green r7.
        "A3",
        # --- r9 rotation: each tag below left the window with a green r8
        # row and an in-window sibling of the same execution shape; all
        # stay DuckDB-oracled locally. ---
        # global (ungrouped) decimal-sum aggregate: the same partial-agg
        # + single-exchange shape as in-window grouped A1
        # (top_performers, lang_embedding_centroid) and the counts rollup
        # inside global_exact_quantiles; league_summary carried A2 green
        # r8, pricing_summary/global_aggregates r1–r7.
        "A2",
        # exact hash dedup: the hash-groupBy + semi-join shape stays
        # in-window inside e2e_daily_pipeline's incremental dedup stage,
        # and content fingerprinting via doc_winnow_fingerprint;
        # doc_fingerprint carried dedup-exact green r8.
        "dedup-exact",
        # (dedup-clusters was accepted here r9–r11; the r12 rotation
        # returned it to the window via media_neardup_clusters.)
        # --- r12-new deterministic sketch family: register-level
        # bit-exact HLL + Count-Min with the merge operator pinned
        # in-query. All five sketches held green driver rows in r13;
        # the r14 rotation kept kmv_corpus_overlap in-window (the
        # sketch-distinct / A2(approx) / llm-decontam holder) and
        # returned the other four to these pre-r13 accepted exceptions,
        # all still DuckDB-oracled locally. ---
        "sketch-distinct",
        "sketch-countmin",
        "sketch-bloom",
        "sketch-quantile",
        "A5(approx)",
        # vector compression error contract: the codebook-quantization
        # sibling pq_topk_recall (PQ IS the compressed-ANN path) stays
        # in-window, int8 quantization via lang_embedding_centroid's
        # fixed-point machinery; embedding_quantize_error carried
        # ann-compression green r7–r8.
        "ann-compression",
        # --- r13 rotation: each tag below left the window with a green
        # r8–r12 row history and an in-window sibling of the same
        # execution shape; both stay DuckDB-oracled locally. ---
        # Misra-Gries heavy hitters: the frequency-sketch family
        # (bounded per-partition state, merge = same aggregate, point
        # estimates with an error-bound contract) stays in-window via
        # cms_event_frequency, whose top-5 point estimates answer the
        # same query; heavy_hitters_sketch carried the tag green r8–r12.
        "sketch-heavy-hitters",
        # PII redaction: the map-only JVM regexp-chain projection shape
        # stays in-window via warc_ingest_pipeline's encoding gate and
        # string_normalize_slug's normalize chain; pii_redaction carried
        # the tag green r8–r12.
        "llm-pii",
        # (S13 was accepted here for r14 only; the r15 rotation returned
        # it to the window via coalesce_merge_updates' first driver row.)
    }
    real = {n: [o for o in lost if o not in accepted] for n, lost in tail_only.items()}
    real = {n: lost for n, lost in real.items() if lost}
    assert real == {}, f"survey ops only covered outside the window: {real}"
