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
