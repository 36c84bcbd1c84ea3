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
    broadcast_existing: bool = True,
    salt: int = 16,
) -> DataFrame:
    """Blocked fuzzy match with 3-way routing.

    ``block_on``/``match_fields`` are (new_col, existing_col) pairs;
    multiple block pairs form a COMPOSITE key (candidates must match on
    every one — the reference blocks country + birth-year + name prefix,
    entity_mapper.py:41-154), which is what keeps within-block candidate
    sets sub-quadratic as the data grows. Returns one row per new record:
    (new_id, matched_id, score, route), route ∈ {'merged','review','new'};
    matched_id is NULL for 'new'. Deterministic: best candidate by
    (score desc, matched_id asc).

    Scale shape: text normalization runs *before* the pair join (per
    entity, not per candidate pair), and unmatched records come from one
    LEFT join — the candidate subtree is evaluated once, not once per
    output branch. With ``broadcast_existing`` (the common dims-sized
    case) the pair join never shuffles candidates, and the probe side
    repartitions on (block key, salt) so a hot block's scoring spreads
    across ``salt`` tasks instead of serializing in one. When the
    existing side is too big to broadcast, ``broadcast_existing=False``
    routes the equi-join through ``salted_join`` so hot blocks cannot
    skew the shuffle either.
    """
    from .joins import salted_join

    n = new.select(
        F.col(new_id).alias("__nid"),
        *[F.col(c).alias(f"__b_{i}") for i, (c, _) in enumerate(block_on)],
        *[
            normalize_text(F.col(c)).alias(f"__nm_{i}")
            for i, (c, _) in enumerate(match_fields)
        ],
    )
    e = existing.select(
        F.col(existing_id).alias("__eid"),
        *[F.col(c).alias(f"__b_{i}") for i, (_, c) in enumerate(block_on)],
        *[
            normalize_text(F.col(c)).alias(f"__em_{i}")
            for i, (_, c) in enumerate(match_fields)
        ],
    )
    block_cols = [f"__b_{i}" for i in range(len(block_on))]
    n_parts = n.sparkSession.sparkContext.defaultParallelism
    if broadcast_existing:
        # A small-file scan arrives as one partition; repartition the probe
        # side so candidate generation + scoring parallelize. The salt term
        # spreads a hot block's rows over `salt` tasks — harmless for the
        # broadcast join, which needs no co-partitioning.
        spread = F.pmod(F.xxhash64(F.col("__nid")), F.lit(max(salt, 1)))
        n = n.repartition(n_parts, *[F.col(c) for c in block_cols], spread)
        pairs = n.join(F.broadcast(e), block_cols)
    else:
        pairs = salted_join(n, e, on=block_cols, how="inner", salt=max(salt, 1))

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
