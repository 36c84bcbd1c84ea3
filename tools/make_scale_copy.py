#!/usr/bin/env python
"""Build an N× scale replica of a testdata dir for scaling probes.

Replicates every table N times with disjoint id universes (ids and FKs
offset by copy*OFFSET) so join fan-outs, group cardinalities, and per-user
event histories scale linearly — the replica answers "does the PLAN scale",
not "what does the data look like at sf1".

Two tables need more than an id offset to avoid fabricating quadratic
structure that the real corpus would not have:

- documents: each copy's text gets a per-copy token prefix on EVERY token
  (`c3_foo`), so shingle sets across copies are disjoint — otherwise every
  doc gains N-1 exact clones and near-dup pair counts grow O(N²) by
  construction, poisoning the scaling exponent of every dedup query.
- embeddings: each copy's vector is rotated by copy positions (norm
  preserved, direction changed), so cross-copy cosine ≈ noise instead of
  1.0 for the same reason.

region/nation are fixed dimensions and stay as-is (as they would at any
real SF).

With HOT_FRAC > 0 the replica additionally plants a deliberately hot key:
that fraction of ``events`` rows (selected by a deterministic event_id
modulus) gets ``user_id = -1``, emulating the single-dominant-entity skew
(one viral user / one boilerplate source) that breaks sort-merge joins at
cluster scale. Used by tools/skew_probe.py; leave at 0 for the plain
scaling probe.

Usage: python tools/make_scale_copy.py SRC_DIR DST_DIR N [HOT_FRAC]
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


def replicate(src: str, dst: str, n: int, hot_frac: float = 0.0) -> None:
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
                    # rotate by __c positions: norm kept, direction changed.
                    # Modulo the dim — a shift >= dim would silently be the
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
                # do the text prefix with the copy index available
                out = out.withColumn(
                    "text",
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\S+)"),
                        F.concat(F.lit("c"), F.col("__c").cast("string"), F.lit(r"_$1")),
                    ),
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
    replicate(src, dst, n, hot_frac)
