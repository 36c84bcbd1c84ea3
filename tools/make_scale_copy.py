#!/usr/bin/env python
"""Build an N× scale replica of a testdata dir for scaling probes.

Replicates every table N times with disjoint id universes (ids and FKs
offset by copy*OFFSET) so join fan-outs, group cardinalities, and per-user
event histories scale linearly — the replica answers "does the PLAN scale",
not "what does the data look like at sf1".

Two tables need more than an id offset to avoid fabricating quadratic
structure that the real corpus would not have:

- documents: each copy's text gets a per-copy LETTER-ONLY suffix on EVERY
  token (`foo` -> `fooqad` for copy 3), so shingle sets across copies are
  disjoint — otherwise every doc gains N-1 exact clones and near-dup pair
  counts grow O(N²) by construction, poisoning the scaling exponent of
  every dedup query. Letters-only matters: the r8 probe used a `cN_`
  PREFIX, which made every token fail the BPE trainer's `^[a-z]{2,}$`
  word filter, so copies contributed no vocabulary and the trainer probe
  ratio was meaningless (SCALE.md §8g). With the suffix, copy tokens stay
  lowercase-letter words and the vocabulary grows ~N× as real data would.
- embeddings, mode=rotate (default): each copy's vector is rotated by
  copy positions (norm preserved, direction changed), so cross-copy
  cosine ≈ noise instead of 1.0 for the same reason. This is the
  DECORRELATED replica: it deliberately destroys semantic clustering, so
  it measures the worst case of any cluster-routed operator (nothing
  prunes — the lossless-router O(n²) floor, SCALE.md §8g).
- embeddings, mode=perturb: each copy (except copy 0) keeps its vector
  direction with a tiny deterministic multiplicative jitter
  (cosine-to-original ≈ 0.999) — the STRUCTURED replica: copies land in
  their originals' semantic neighborhood, preserving cluster structure
  the way a re-crawl or shard merge would. Use ONLY for semantic-routing
  probes (stream_semantic_ingest_dedup, incremental_semantic_dedup_ivf):
  cross-copy near-dup pairs are real here by construction, so text-dedup
  scaling exponents measured on this replica are meaningless. CAVEAT
  (measured r9): the raw synthetic embeddings have NO semantic structure
  at the production threshold — zero cos>=0.8 pairs across the
  corpus/batch split, radius bound admits ~100% (semantic_bound_probe) —
  so perturb copies replicate structurelessness and the probe still
  measures the no-structure floor, with true-pair multiplicity inflated
  10x on top (copies of corpus rows are corpus rows).
- embeddings, mode=cluster: REPLACES every direction with one of 4
  per-copy seeded +-1/sqrt(d) cluster centers plus eps=0.05 jitter.
  Cluster COUNT grows with the copy index while per-cluster density
  stays constant (more topics, not 10x-duplicated topics), so true-pair
  volume grows LINEARLY and cluster routing has real structure to prune
  against at tau=0.8 (within-cluster cos >= ~0.98, cross-cluster <~0.6).
  The transform applies to copy 0 too: compare a cluster-1x dir against
  a cluster-Nx dir, never against the raw sf dir.

region/nation are fixed dimensions and stay as-is (as they would at any
real SF).

With HOT_FRAC > 0 the replica additionally plants a deliberately hot key:
that fraction of ``events`` rows (selected by a deterministic event_id
modulus) gets ``user_id = -1``, emulating the single-dominant-entity skew
(one viral user / one boilerplate source) that breaks sort-merge joins at
cluster scale. Used by tools/skew_probe.py; leave at 0 for the plain
scaling probe.

Usage: python tools/make_scale_copy.py SRC_DIR DST_DIR N [HOT_FRAC] [EMB_MODE]
       EMB_MODE: rotate (default) | perturb | cluster
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F

OFFSET = 100_000_000  # > any id at the scales we replicate
HOT_USER = -1  # planted hot key (no real user_id is negative)


def _copies(df: DataFrame, n: int) -> DataFrame:
    """Cross-join with a copy index column ``__c`` in [0, n)."""
    spark = df.sparkSession
    idx = spark.range(n).select(F.col("id").cast("int").alias("__c"))
    return df.crossJoin(F.broadcast(idx))


def _offset(col: str) -> F.Column:
    return (F.col(col) + F.col("__c").cast("long") * F.lit(OFFSET)).alias(col)


def replicate(
    src: str, dst: str, n: int, hot_frac: float = 0.0, emb_mode: str = "rotate"
) -> None:
    from sport_data_pipeline_spark.catalog import TABLES, load_table
    from sport_data_pipeline_spark.session import get_session

    spark = get_session("make_scale_copy")
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name in TABLES:
        df = load_table(spark, src, name)
        if name in ("region", "nation"):
            out = df
        else:
            rep = _copies(df, n)
            cols = []
            for c in df.columns:
                if c in key_cols[name]:
                    cols.append(_offset(c))
                elif name == "documents" and c == "text":
                    cols.append(F.col("text"))  # rewritten with __c below
                elif name == "embeddings" and c == "embedding":
                    if emb_mode == "cluster":
                        # rewritten with __c below (needs a centers join)
                        cols.append(F.col("embedding"))
                    elif emb_mode == "perturb":
                        # STRUCTURED replica: per-element multiplicative
                        # jitter in [1-eps, 1+eps], deterministic in
                        # (copy, element index), copy 0 untouched. Keeps
                        # direction (cosine-to-original ≈ 1 - Var(δ)/2 ≈
                        # 0.9996 at eps=0.05) so copies stay inside their
                        # originals' semantic cluster; zero vectors stay
                        # zero (zero-norm semantics preserved).
                        eps = 0.05
                        jit = F.transform(
                            "embedding",
                            lambda x, i: F.when(
                                F.col("__c") == 0, x
                            ).otherwise(
                                (
                                    x.cast("double")
                                    * (
                                        F.lit(1.0)
                                        + F.lit(eps)
                                        * (
                                            (
                                                F.pmod(
                                                    F.col("__c") * 131 + i * 17,
                                                    F.lit(11),
                                                ).cast("double")
                                                - 5.0
                                            )
                                            / 5.0
                                        )
                                    )
                                ).cast("float")
                            ),
                        )
                        cols.append(jit.alias("embedding"))
                    else:
                        # DECORRELATED replica (default): rotate by __c
                        # positions — norm kept, direction changed. Modulo
                        # the dim — a shift >= dim would silently be the
                        # identity (empty first slice), planting cosine-1.0
                        # cross-copy clones for n > dim.
                        sz = F.size("embedding")
                        shift = F.pmod(F.col("__c"), sz)
                        rot = F.concat(
                            F.slice(F.col("embedding"), shift + 1, sz),
                            F.slice(F.col("embedding"), F.lit(1), shift),
                        )
                        cols.append(rot.alias("embedding"))
                else:
                    cols.append(F.col(c))
            out = rep.select(*cols, F.col("__c"))
            if name == "documents":
                # per-copy letter-only token SUFFIX (copy 3 -> "fooqad"):
                # shingles stay disjoint across copies AND suffixed tokens
                # still pass word filters like the BPE trainer's
                # ^[a-z]{2,}$ — so vocabulary-sized claims probe honestly.
                # Two base-26 letters cover n <= 676 copies.
                c_hi = F.char(F.lit(97) + F.floor(F.col("__c") / 26) % 26)
                c_lo = F.char(F.lit(97) + F.pmod(F.col("__c"), F.lit(26)))
                out = out.withColumn(
                    "text",
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\S+)"),
                        F.concat(F.lit(r"$1q"), c_hi, c_lo),
                    ),
                )
            if name == "embeddings" and emb_mode == "cluster":
                # CLUSTERED replica: REPLACE every direction with one of
                # C=4 per-copy cluster centers plus a small deterministic
                # jitter, so the table has real semantic structure at the
                # production threshold (the raw synthetic table has NONE:
                # measured zero cos>=0.8 pairs across the corpus/batch
                # split and a radius bound that admits ~100% — no router
                # can prune structureless data, tools/semantic_bound_probe
                # .py). Cluster COUNT grows with the copy index (cid =
                # vec_id%C + C*copy) while per-cluster density stays
                # constant — the way real corpora scale (more topics, not
                # 10x-duplicated topics) — so true-pair volume grows
                # LINEARLY and a cluster-routed operator can be probed for
                # its scaling exponent. Centers are seeded random +-1/sqrt(d)
                # rows: pairwise cos ~ N(0, 1/d), max well under tau-2*eps,
                # so clusters never bleed at tau=0.8; within-cluster cos
                # >= ~0.98 at eps=0.05. Zero vectors stay zero. Compare a
                # cluster-1x dir against a cluster-Nx dir (NOT the raw sf
                # dir - different data by construction).
                import numpy as np

                c_per_copy = 4
                eps = 0.05
                dim = len(df.select("embedding").first()[0])
                rng = np.random.default_rng(42)
                centers = rng.choice([-1.0, 1.0], size=(c_per_copy * n, dim)) / dim**0.5
                cent = F.broadcast(
                    spark.createDataFrame(
                        [(i, [float(x) for x in row]) for i, row in enumerate(centers)],
                        "__cl int, __center array<double>",
                    )
                )
                n0 = F.sqrt(
                    F.aggregate(
                        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                )
                out = (
                    out.withColumn(
                        "__cl",
                        (
                            F.pmod(F.col("vec_id"), F.lit(c_per_copy))
                            + F.lit(c_per_copy) * F.col("__c")
                        ).cast("int"),
                    )
                    .withColumn("__n0", n0)
                    .join(cent, "__cl")
                    .withColumn(
                        "__mix",
                        F.zip_with(
                            "__center",
                            "embedding",
                            lambda cc, x: cc
                            + F.when(
                                F.col("__n0") > 0,
                                F.lit(eps) * x.cast("double") / F.col("__n0"),
                            ).otherwise(F.lit(0.0)),
                        ),
                    )
                    .withColumn(
                        "__n1",
                        F.sqrt(
                            F.aggregate(
                                F.transform("__mix", lambda x: x * x),
                                F.lit(0.0),
                                lambda a, x: a + x,
                            )
                        ),
                    )
                    .withColumn(
                        "embedding",
                        F.when(
                            F.col("__n0") > 0,
                            F.transform("__mix", lambda x: (x / F.col("__n1")).cast("float")),
                        ).otherwise(F.col("embedding")),
                    )
                    .drop("__cl", "__center", "__mix", "__n0", "__n1")
                )
            out = out.drop("__c")
        if name == "events" and hot_frac > 0:
            # Deterministic hot-key injection AFTER the id offset so the
            # hot rows come uniformly from every copy.
            mod = 1000  # coarse enough to be exact for frac ≥ 0.001, fine
            # enough to spread hot rows through the whole id/time range
            out = out.withColumn(
                "user_id",
                F.when(
                    F.pmod(F.col("event_id"), F.lit(mod)) < F.lit(int(mod * hot_frac)),
                    F.lit(HOT_USER).cast("long"),
                ).otherwise(F.col("user_id")),
            )
        out.repartition(8).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        # count from the written footers — re-counting `out` would execute
        # the whole replica DAG (cross-join + regexp rewrite) a second time
        n_rows = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"{name}: {n_rows} rows -> {dst}/{name}.parquet")
    spark.stop()


if __name__ == "__main__":
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    hot_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    emb_mode = sys.argv[5] if len(sys.argv) > 5 else "rotate"
    if emb_mode not in ("rotate", "perturb", "cluster"):
        raise SystemExit(f"EMB_MODE must be rotate|perturb|cluster, got {emb_mode!r}")
    replicate(src, dst, n, hot_frac, emb_mode)
