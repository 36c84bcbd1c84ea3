"""End-to-end corpus cleaning post-conditions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_data_pipeline_spark.catalog import load_table
from sport_data_pipeline_spark.functions.text import content_fingerprint
from sport_data_pipeline_spark.operators.corpus import clean_corpus
from sport_data_pipeline_spark.operators.dedup import minhash_near_dup

from conftest import SF_DIR


def test_clean_corpus_postconditions(spark):
    d = load_table(spark, SF_DIR, "documents")
    cleaned = clean_corpus(d).persist()
    n_in, n_out = d.count(), cleaned.count()
    assert 0 < n_out < n_in  # something survived, something was removed

    # no exact duplicates remain
    fp_dups = (
        cleaned.select(content_fingerprint("text").alias("fp"))
        .groupBy("fp").count().filter(F.col("count") > 1).count()
    )
    assert fp_dups == 0

    # no near-dup pair survives at the removal threshold (banding is
    # deterministic, so re-running finds any remaining pair)
    assert minhash_near_dup(cleaned, "doc_id", "text", threshold=0.7).count() == 0

    # quality gate respected + annotations present
    rows = cleaned.select("n_tokens", "unique_ratio", "lang_guess").collect()
    assert all(r["n_tokens"] >= 5 and r["unique_ratio"] >= 0.1 for r in rows)
    assert all(r["lang_guess"] is not None for r in rows)
    cleaned.unpersist()
