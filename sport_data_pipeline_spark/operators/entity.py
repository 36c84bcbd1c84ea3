"""Fuzzy entity resolution (SURVEY.md §2.3 J8 — src/common/entity_mapper.py:41-154).

The reference compares every new record against *all* existing rows with
per-field fuzz.ratio similarity and routes by threshold (≥90 auto-merge,
≥75 review queue, else create). At scale that is O(n·m) Python; here it is
a *blocked* similarity join:

  1. block: equi-join on cheap keys (country / birth-year / name prefix) so
     candidate pairs stay near-linear;
  2. score: normalized Levenshtein similarity (JVM ``levenshtein``), averaged
     over the match fields;
  3. route: best candidate per new record → 'merged' / 'review' / 'new'
     (left-anti records with no candidate are 'new' too).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import normalize_text


def similarity_ratio(a: Column, b: Column, prenormalized: bool = False) -> Column:
    """Levenshtein-based similarity in [0,100], ~fuzz.ratio semantics:
    100 * (1 - dist / max_len). Normalizes both sides unless the caller
    already did (normalize *before* a pair join: per-entity cost, not
    per-pair)."""
    na = a if prenormalized else normalize_text(a)
    nb = b if prenormalized else normalize_text(b)
    max_len = F.greatest(F.length(na), F.length(nb))
    return F.when(max_len == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(na, nb).cast("double") / max_len)
    )


def resolve_entities(
    new: DataFrame,
    existing: DataFrame,
    new_id: str,
    existing_id: str,
    block_on: Sequence[tuple[str, str]],
    match_fields: Sequence[tuple[str, str]],
    auto_threshold: float = 90.0,
    review_threshold: float = 75.0,
) -> DataFrame:
    """Blocked fuzzy match with 3-way routing.

    ``block_on``/``match_fields`` are (new_col, existing_col) pairs.
    Returns one row per new record: (new_id, matched_id, score, route)
    where route ∈ {'merged','review','new'}; matched_id is NULL for 'new'.
    Deterministic: best candidate by (score desc, matched_id asc).

    Scale shape: text normalization runs *before* the pair join (per
    entity, not per candidate pair), the pair join is a plain equi-join on
    the blocking key, and unmatched records come from one LEFT join — the
    candidate subtree is evaluated once, not once per output branch.
    """
    n = new.select(
        F.col(new_id).alias("__nid"),
        *[F.col(c).alias(f"__nb_{i}") for i, (c, _) in enumerate(block_on)],
        *[
            normalize_text(F.col(c)).alias(f"__nm_{i}")
            for i, (c, _) in enumerate(match_fields)
        ],
    )
    e = existing.select(
        F.col(existing_id).alias("__eid"),
        *[F.col(c).alias(f"__eb_{i}") for i, (_, c) in enumerate(block_on)],
        *[
            normalize_text(F.col(c)).alias(f"__em_{i}")
            for i, (_, c) in enumerate(match_fields)
        ],
    )
    # A small-file scan arrives as one partition; without an explicit
    # shuffle the (broadcast) pair join and all similarity scoring would run
    # in a single task. Repartition the probe side on the blocking key so
    # candidate generation + scoring parallelize across the cluster.
    n_parts = n.sparkSession.sparkContext.defaultParallelism
    n = n.repartition(n_parts, *[F.col(f"__nb_{i}") for i in range(len(block_on))])
    cond = None
    for i in range(len(block_on)):
        c = F.col(f"__nb_{i}") == F.col(f"__eb_{i}")
        cond = c if cond is None else cond & c
    pairs = n.join(F.broadcast(e), cond)

    scores = [
        similarity_ratio(F.col(f"__nm_{i}"), F.col(f"__em_{i}"), prenormalized=True)
        for i in range(len(match_fields))
    ]
    avg_score = scores[0]
    for s in scores[1:]:
        avg_score = avg_score + s
    avg_score = avg_score / len(scores)

    w = Window.partitionBy("__nid").orderBy(F.desc("score"), F.asc("__eid"))
    best = (
        pairs.select(F.col("__nid"), F.col("__eid"), avg_score.alias("score"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return new.select(F.col(new_id)).join(
        best.withColumnRenamed("__nid", new_id), new_id, "left"
    ).select(
        F.col(new_id),
        F.when(F.col("score") >= review_threshold, F.col("__eid")).alias("matched_id"),
        "score",
        F.when(F.col("score").isNull(), "new")
        .when(F.col("score") >= auto_threshold, "merged")
        .when(F.col("score") >= review_threshold, "review")
        .otherwise("new")
        .alias("route"),
    )
