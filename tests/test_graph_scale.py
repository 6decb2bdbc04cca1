"""Convergence-shape tests for connected_components: the large-star/
small-star formulation must handle long-chain graphs in O(log n) rounds
(plain min-label propagation needs O(diameter) = 999 rounds here) and
must fail loudly instead of returning non-converged labels."""

from __future__ import annotations

import pytest

from posting_lines_spark.operators.graph import connected_components, dedup_groups


def test_path_graph_1000_nodes_converges_logarithmically(spark):
    n = 1000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = connected_components(edges, max_iter=15)
    rows = comp.collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}
    g = dedup_groups(comp).collect()
    assert len(g) == 1 and g[0].survivor == 0 and g[0].n_members == n


def test_two_components_and_isolation(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=1)


def test_random_graphs_match_union_find(spark):
    """300 random edges over 120 nodes (seeded): Spark CC must agree with
    a reference union-find, component for component."""
    import random

    rng = random.Random(20260813)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    want = {}
    for n in nodes:
        root = find(n)
        want[n] = min(m for m in nodes if find(m) == root)

    from posting_lines_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want
