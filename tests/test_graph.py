"""Connected components: iterative min-label propagation vs a reference
union-find on synthetic graphs (chains force multi-round convergence)."""

from __future__ import annotations

import pytest

from sport_data_pipeline_spark.operators.graph import connected_components


def _reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min member id
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


@pytest.mark.parametrize(
    "edges",
    [
        # two triangles + a bridge-free isolated pair
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
        # an 8-node chain: diameter 7 forces several propagation rounds
        [(i, i + 1) for i in range(8)],
        # star with high-id center + back-edges
        [(100, 5), (100, 6), (100, 7), (6, 7)],
        # single edge
        [(42, 7)],
    ],
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _reference(edges)


def test_nonconvergence_raises(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(6)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=2)
