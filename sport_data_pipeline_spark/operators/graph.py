"""Iterative graph operators: connected components over the near-dup pair
graph (the cluster-level view of corpus deduplication).

The input graph is the PAIR LIST, not the corpus — after blocking/LSH the
edge set is orders of magnitude smaller than the document table, so the
iterative stage runs on a small relation and the final cluster assignment
joins back to documents. Label propagation converges in O(graph diameter)
rounds; near-dup clusters are shallow (dup chains, not social graphs), so
the loop is a handful of rounds in practice, with ``max_iterations`` as the
runaway guard.

Each round is join + min-aggregate (two hash shuffles over edge-sized
data); ``stage_checkpoint`` truncates the lineage every round so the plan
does not grow with the iteration count — executor-local blocks by default,
the RELIABLE checkpoint directory when the session sets
``checkpointing.CHECKPOINT_DIR_CONF`` (a production cluster points it at
durable storage so label-propagation rounds survive executor loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpointing import stage_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation.

    Returns (id, component) for every vertex that appears in ``edges``,
    where ``component`` is the minimum vertex id reachable from ``id``.

    Raises ``RuntimeError`` if the graph has not converged after
    ``max_iterations`` rounds (diameter larger than the guard) — a loud
    failure beats silently-wrong clusters.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = stage_checkpoint(sym)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    labels = stage_checkpoint(labels)

    for _ in range(max_iterations):
        neighbor = sym.join(labels, sym["b"] == labels["id"]).select(
            F.col("a").alias("id"), F.col("label")
        )
        new_labels = stage_checkpoint(
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # min-label is monotone, so "changed" = any strict decrease.
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
