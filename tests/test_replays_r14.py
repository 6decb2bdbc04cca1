"""Pure-Python replays for round-14 registrations.

Replay discipline (tools/replay_census.py): a registered query whose
engine formulation is `spark.sql(...)` over the SAME text as its DuckDB
oracle proves only that two engines parse one string identically — the
replay re-derives the expected output from the raw parquet rows in
plain Python and compares exactly."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from tests.conftest import SF0001


def test_replay_graph_linkpred_cap64(spark):
    """Re-derive the production-cap (cap=64) link prediction from raw
    (l_orderkey, l_partkey) pairs: distinct baskets -> co-occurrence
    edges (weight >= LINKPRED_COOC) -> per-node adjacency capped at the
    64 strongest edges (weight DESC, id ASC) -> wedge counts -> minus
    existing edges -> Jaccard on EXACT uncapped degrees -> top 20 under
    the registered total order. Exact match including the float scores
    (one IEEE double division of exact integers on both sides)."""
    from posting_lines_spark.queries import load_all
    from posting_lines_spark.queries.graph_q import (
        GRAPH_NEIGHBOR_CAP_PROD,
        LINKPRED_COOC,
    )

    raw = (
        spark.read.parquet(f"{SF0001}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set[int]] = defaultdict(set)
    for r in raw:
        baskets[r.l_orderkey].add(r.l_partkey)
    pair_w: Counter = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_w[(a, b)] += 1
    edges = {p: w for p, w in pair_w.items() if w >= LINKPRED_COOC}

    adj0: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (a, b), w in edges.items():
        adj0[a].append((b, w))
        adj0[b].append((a, w))
    deg = {u: len(vs) for u, vs in adj0.items()}
    cap = GRAPH_NEIGHBOR_CAP_PROD
    adj = {
        u: [v for v, _ in sorted(vs, key=lambda t: (-t[1], t[0]))[:cap]]
        for u, vs in adj0.items()
    }
    capped_nodes = sum(1 for vs in adj0.values() if len(vs) > cap)

    cand: Counter = Counter()
    for a, mids in adj.items():
        for m in mids:
            for c in adj.get(m, ()):
                if a < c:
                    cand[(a, c)] += 1
    scored = [
        (
            a,
            c,
            cn,
            deg[a],
            deg[c],
            cn / (deg[a] + deg[c] - cn),
            capped_nodes,
            cap,
        )
        for (a, c), cn in cand.items()
        if (a, c) not in edges
    ]
    scored.sort(key=lambda t: (-t[5], -t[2], t[0], t[1]))
    expected = scored[:20]

    got = [
        (
            r["id_a"],
            r["id_b"],
            r["common_neighbors"],
            r["deg_a"],
            r["deg_b"],
            r["jaccard"],
            r["capped_nodes"],
            r["neighbor_cap"],
        )
        for r in load_all()["graph_linkpred_cap64"].fn(spark, SF0001).collect()
    ]
    assert got == expected
