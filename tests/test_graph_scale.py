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


def test_cc_observation_fallback_path(spark, monkeypatch):
    """If the convergence observation never fires (bounded wait returns
    None — simulating an engine that materializes checkpoints outside
    withAction), CC must degrade to the explicit-aggregate checksum and
    still converge to correct labels instead of hanging (round-3 advice)."""
    from posting_lines_spark.operators import graph as G

    monkeypatch.setattr(G, "_obs_get_bounded", lambda obs, timeout_s=0.0: None)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r.node: r.component for r in G.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_obs_get_bounded_times_out_on_unfired_observation(spark):
    """An Observation attached to a never-executed plan must yield None
    within the bound, not block forever."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from posting_lines_spark.operators.graph import _obs_get_bounded

    obs = Observation("never_fires")
    spark.range(10).observe(obs, F.count(F.lit(1)).alias("n"))  # no action
    assert _obs_get_bounded(obs, timeout_s=1.0) is None


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


# --- pagerank (fixed-point integer) ---

from posting_lines_spark.operators.graph import PR_SCALE, pagerank  # noqa: E402


def test_pagerank_mass_conservation_and_order(spark):
    # symmetric star: every leaf ↔ hub 0; hub concentrates damped mass
    edges = spark.createDataFrame(
        [(i, 0, 1) for i in range(1, 5)] + [(0, i, 1) for i in range(1, 5)],
        "src long, dst long, w long",
    )
    ranks = {r.node: r["rank"] for r in pagerank(edges, iters=8).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    assert ranks[0] > ranks[1]
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]  # symmetric leaves tie exactly
    # integer mass conservation: total ≤ SCALE (div truncation only loses
    # < 1 unit per node per round), and ≥ 95% of SCALE retained here
    total = sum(ranks.values())
    assert total <= PR_SCALE
    assert total > PR_SCALE * 95 // 100


def test_pagerank_weighted_edges_split_proportionally(spark):
    # 0 → 1 with weight 3, 0 → 2 with weight 1: contrib ratio must be 3:1
    edges = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
        "src long, dst long, w long",
    )
    ranks = {r.node: r["rank"] for r in pagerank(edges, iters=6).collect()}
    assert ranks[1] > ranks[2]


def test_pagerank_matches_pure_python_on_random_graphs(spark):
    """Seeded random weighted digraphs: Spark's fixed-point pagerank must
    agree INTEGER-FOR-INTEGER with a pure-Python replay of the same
    recurrence — the cross-engine determinism claim, verified outside
    both SQL engines."""
    import random
    from collections import defaultdict

    def py_pagerank(edges, iters, scale=PR_SCALE, damping_pct=85):
        nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
        n = len(nodes)
        outw: dict = defaultdict(int)
        for u, _, w in edges:
            outw[u] += w
        rank = {x: scale // n for x in nodes}
        tp = (15 * scale) // (100 * n)
        for _ in range(iters):
            s: dict = defaultdict(int)
            for u, v, w in edges:
                if u in rank:
                    r, o = rank[u], outw[u]
                    s[v] += (r // o) * w + ((r % o) * w) // o
            rank = {x: tp + (damping_pct * s[x]) // 100 for x in nodes}
        return rank

    rng = random.Random(20260813)
    for _ in range(3):
        n_nodes = rng.randint(5, 20)
        raw = {
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(n_nodes, 3 * n_nodes))
        }
        edges = [(u, v, rng.randint(1, 9)) for u, v in raw if u != v]
        if not edges:
            continue
        got = {
            r.node: r["rank"]
            for r in pagerank(
                spark.createDataFrame(edges, "src long, dst long, w long"), iters=4
            ).collect()
        }
        assert got == py_pagerank(edges, iters=4)
