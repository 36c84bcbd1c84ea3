"""End-to-end training-corpus cleaning: the composition the individual
LLM-pipeline operators exist for.

quality filter → exact dedup → MinHash near-dup removal → token/lang
annotation, as one lazy DataFrame plan. Each stage is the already-tested
operator; this module only sequences them, so the whole pipeline inherits
their scale properties (blocked pair generation, capped buckets, one
shuffle per stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import DEFAULT_LANG_MARKERS, lang_id, quality_features, token_count
from .dedup import exact_dedup, minhash_near_dup


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_unique_ratio: float = 0.1,
    max_stopword_ratio: float = 0.95,
    neardup_threshold: float = 0.7,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Clean a document corpus for training-data use.

    Stages:
      1. quality gate: drop too-short / too-repetitive / stopword-soup docs
         (pure filters — pushed into the scan where possible);
      2. exact dedup: one content-fingerprint shuffle, lowest id survives;
      3. near-dup removal: MinHash-LSH pairs at ``neardup_threshold``; for
         every verified pair the higher id is dropped (greedy min-id keep —
         the standard corpus-dedup rule; chains collapse to their minimum
         survivor transitively because every pair independently drops its
         higher member);
      4. annotation: token counts + heuristic language ID on survivors.

    Returns the surviving rows of ``df`` plus feature columns
    (n_tokens, unique_ratio, stopword_ratio, word_tokens, lang_guess).
    """
    feats = quality_features(text_col)
    passed = (
        df.withColumn("n_tokens", feats["n_tokens"])
        .withColumn("unique_ratio", feats["unique_ratio"])
        .withColumn("stopword_ratio", feats["stopword_ratio"])
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("unique_ratio") >= min_unique_ratio)
            & (F.col("stopword_ratio") <= max_stopword_ratio)
        )
    )

    deduped = exact_dedup(passed, text_col, id_col)

    pairs = minhash_near_dup(
        deduped,
        id_col,
        text_col,
        threshold=neardup_threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = deduped.join(losers, id_col, "left_anti")

    return survivors.withColumn("word_tokens", token_count(F.col(text_col)).cast("long")).withColumn(
        "lang_guess", lang_id(F.col(text_col), DEFAULT_LANG_MARKERS)
    )
