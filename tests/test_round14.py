"""Round-14 regressions: the production wedge cap (VERDICT r13 item 3),
the ADVICE r13 fixes, and the close_round gate changes.

Reference parity context: the reference (sql_to_line.py) has no graph
code at all — the wedge family is part of the declared extension
surface; these tests pin the two documented operating points of its
scale lever."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


# ---- graph_linkpred cap=8 (parity demo) vs cap=64 (production) ----
#
# The skew01 measurement (SCALE.md skew row 1): on a hub-heavy graph
# cap=8 returns ZERO candidates — every node's strongest edges point at
# the same small head clique, so the capped adjacency is (head clique)
# + (everyone -> heads), every surviving wedge ends on a head, and
# every such endpoint pair is already an edge. cap=64 keeps enough of
# the heads' adjacency that tail-tail wedges (the real candidates)
# survive. This fixture reproduces that mechanism deterministically:
# 9 head parts that co-occur in EVERY order (pairwise weight = 2·|tails|,
# always each other's strongest edges) and |tails| tail parts that each
# co-occur with ALL 9 heads exactly LINKPRED_COOC times but NEVER with
# another tail. cap=8 prunes each head's adjacency to the other 8 heads
# -> the only candidates would be tail-head pairs, which are all
# existing edges -> empty. cap=64 keeps the heads' tail edges -> the
# tail-tail candidates (cn=9, Jaccard 9/(9+9-9)=1.0) come back.

N_HEADS = 9
N_TAILS = 30


def _hubclique_lineitem(spark):
    rows = []
    for t in range(N_TAILS):
        tail_part = 100 + t
        for o in (1000 + 2 * t, 1000 + 2 * t + 1):
            rows.append((o, tail_part))
            for h in range(1, N_HEADS + 1):
                rows.append((o, h))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).createOrReplaceTempView("hubclique_li")


def test_cap8_empties_on_hub_clique_graph(spark):
    from posting_lines_spark.queries.graph_q import (
        GRAPH_NEIGHBOR_CAP,
        _linkpred_core,
    )

    _hubclique_lineitem(spark)
    rows = spark.sql(
        "WITH " + _linkpred_core("hubclique_li", GRAPH_NEIGHBOR_CAP)
    ).collect()
    assert rows == [], (
        "cap=8 must reproduce the skew01 failure mode (0 candidates) "
        "on the hub-clique fixture — if this starts returning rows the "
        "parity-demo/production-cap split no longer demonstrates "
        "anything"
    )


def test_cap64_returns_true_topk_on_hub_clique_graph(spark):
    from posting_lines_spark.queries.graph_q import (
        GRAPH_NEIGHBOR_CAP_PROD,
        _linkpred_core,
    )

    _hubclique_lineitem(spark)
    rows = spark.sql(
        "WITH " + _linkpred_core("hubclique_li", GRAPH_NEIGHBOR_CAP_PROD)
    ).collect()
    assert len(rows) == 20, "production cap must keep real candidates"
    # the real candidates are tail-tail pairs: 9 shared heads, no
    # direct edge, exact Jaccard 9/(9+9-9) = 1.0
    for r in rows:
        assert r["id_a"] >= 100 and r["id_b"] >= 100
        assert r["common_neighbors"] == N_HEADS
        assert r["jaccard"] == 1.0
        assert r["neighbor_cap"] == GRAPH_NEIGHBOR_CAP_PROD
    # truncation is still reported honestly: all 9 heads exceed cap=64
    # (degree 8 + 30 tails = 38 < 64 -> actually NOT truncated here);
    # capped_nodes must be exact either way
    assert all(r["capped_nodes"] == 0 for r in rows)
    # and the top-20 equals the UNCAPPED top-20 (cap wide enough that
    # nothing the ranking uses was pruned on this graph)
    uncapped = spark.sql("WITH " + _linkpred_core("hubclique_li")).collect()
    key = lambda rs: [  # noqa: E731
        (r["id_a"], r["id_b"], r["common_neighbors"], r["jaccard"]) for r in rs
    ]
    assert key(rows) == key(uncapped)


def test_cap64_registered_with_oracle_row(spark):
    """The production cap is a first-class registry entry (driver-gated
    every round), not SCALE.md prose."""
    from posting_lines_spark.queries import load_all

    reg = load_all()
    spec = reg["graph_linkpred_cap64"]
    assert spec.oracle is not None
    df = spec.fn(spark, SF0001)
    rows = df.collect()
    assert {"id_a", "id_b", "jaccard", "capped_nodes", "neighbor_cap"} <= set(
        df.columns
    )
    assert all(r["neighbor_cap"] == 64 for r in rows)


# ---- ADVICE r13: dedup_lsh_hot_salted twin offset derives from data ----


def test_hot_salted_twin_ids_never_collide(spark):
    """Twin doc_ids must live strictly above max(doc_id) regardless of
    the corpus id range (the fixed +100000 offset collided on >100k-doc
    or offset-id corpora, silently merging shingle sets)."""
    from pyspark.sql import functions as F

    from posting_lines_spark.queries.dedup_q import _BOIL_SPARK, _BOIL_N

    # offset ids far above 100000: the old constant would collide
    docs = spark.range(10**10, 10**10 + 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    docs.createOrReplaceTempView("documents")
    out = spark.sql(_BOIL_SPARK)
    assert out.count() == 200 + _BOIL_N  # no doc_id merged two texts
    assert out.select("doc_id").distinct().count() == 200 + _BOIL_N


# ---- ADVICE r13: skew_pressure._timed distinguishes failure/timeout ----


def test_timed_reraises_genuine_failures(spark):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from skew_pressure import _timed

    def boom():
        raise ValueError("genuine failure, not a timeout")

    with pytest.raises(ValueError, match="genuine failure"):
        _timed(spark, "t14-boom", boom, timeout_s=60.0)

    sec, res, timed_out = _timed(spark, "t14-ok", lambda: 42, timeout_s=60.0)
    assert res == 42 and timed_out is False and sec is not None


# ---- ADVICE r13: stats_ad_uniform emits the TRUE reference bounds ----


def test_ad_uniform_ref_bounds_are_continuity_corrected(spark):
    """ref_lo/ref_hi must be the endpoints of the reference actually
    tested against — Uniform[a-1/2, b+1/2] on the cents grid, i.e.
    (2a-1)/200 and (2b+1)/200 in dollars — not the bare sample min/max."""
    from posting_lines_spark.queries import load_all

    reg = load_all()
    row = reg["stats_ad_uniform"].fn(spark, SF0001).collect()[0]
    import duckdb

    con = duckdb.connect()
    a, b = con.execute(
        "SELECT min(CAST(round(value*100e0) AS BIGINT)),"
        "       max(CAST(round(value*100e0) AS BIGINT)) "
        f"FROM read_parquet('{SF0001}/events.parquet') "
        "WHERE event_type = 'purchase'"
    ).fetchone()
    assert row["ref_lo"] == (2 * a - 1) / 200.0
    assert row["ref_hi"] == (2 * b + 1) / 200.0
