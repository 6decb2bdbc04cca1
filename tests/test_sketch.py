"""Semantic guarantees of the sketch family that the oracle harness
can't express: deterministic overcount, bounded sketch size, bloom
no-false-negatives + real selectivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_countmin_overcounts_only_and_is_bounded(spark):
    from posting_lines_spark.queries.sketch_q import (
        CM_DEPTH,
        CM_WIDTH,
        sketch_countmin_freq,
    )
    from posting_lines_spark.sources import load_table

    rows = sketch_countmin_freq(spark, SF0001).collect()
    assert rows, "no query keys"
    exact = {
        r["k"]: r["n"]
        for r in load_table(spark, SF0001, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.exact_n == exact.get(r.k, 0)
        # the count-min guarantee: collisions only ever ADD
        assert r.est_n >= r.exact_n, (r.k, r.est_n, r.exact_n)
        assert r.est_ge_exact
    # the sketch itself is d×w cells no matter the input size
    assert CM_DEPTH * CM_WIDTH == 2048


def test_bloom_prefilter_superset_and_selective(spark):
    from posting_lines_spark.queries.sketch_q import (
        BLOOM_WORDS,
        bloom_bitset,
        bloom_prefilter,
    )
    from posting_lines_spark.sources import load_table

    orders = load_table(spark, SF0001, "orders")
    dim = (
        load_table(spark, SF0001, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = bloom_bitset(dim, "c_custkey")
    assert len(words) == BLOOM_WORDS  # constant-size driver exchange

    pre = bloom_prefilter(orders, "o_custkey", words)
    n_total = orders.count()
    n_pre = pre.count()
    n_true = orders.join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"], "left_semi").count()
    # no false negatives: every true match survives the prefilter
    missed = (
        orders.join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"], "left_semi")
        .exceptAll(pre.join(F.broadcast(dim), pre["o_custkey"] == dim["c_custkey"], "left_semi"))
        .count()
    )
    assert missed == 0
    # and it actually reduces the fact side before the shuffle
    assert n_true <= n_pre < n_total
    # plan hygiene: the prefilter is scan+filter only — no exchange
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hll_merge_equals_single_level(spark):
    """Merging shard partials must estimate the same cardinality class as
    one global sketch — and both land within the 3σ bound of exact."""
    from posting_lines_spark.sources import load_table

    li = load_table(spark, SF0001, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    single = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(14))).alias("e")
    ).collect()[0]["e"]
    merged = (
        li.withColumn("shard", F.pmod("l_orderkey", F.lit(8)))
        .groupBy("shard")
        .agg(F.hll_sketch_agg("l_partkey", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    # HLL union of partials is lossless for HLL state: same estimate
    assert merged == single
    assert abs(merged - exact) <= 0.025 * exact
