"""Dedup-group queries: connected components over the MinHash near-dup
pair graph, and the survivor decision — the end of the dedup story
(shingle → signature → candidate pairs → verified pairs → groups →
survivors).

Oracle: DuckDB recursive CTE computes the reachability closure and takes
the same min-label per node — identical components regardless of the
iterative path Spark takes to the fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from posting_lines_spark.operators import dedup, graph
from posting_lines_spark.queries import register
from posting_lines_spark.queries.dedup_q import (
    BANDS,
    JACCARD_T,
    NEAR_BASE_SPARK,
    NUM_HASHES,
    _minhash_oracle,
)
from posting_lines_spark.sources import load_table

# the verified-pairs SQL is the minhash oracle minus its ORDER BY tail
_PAIRS_DUCK = _minhash_oracle().rsplit("ORDER BY", 1)[0]

COMPONENTS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_PAIRS_DUCK}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, label) AS (
  SELECT u AS node, u AS label FROM edges
  UNION
  SELECT e.v AS node, r.label FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node, min(label) AS component
FROM reach
GROUP BY node
ORDER BY node
"""


def _spark_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    base = spark.sql(NEAR_BASE_SPARK).repartition(spark.sparkContext.defaultParallelism)
    sig = dedup.minhash_signature(
        dedup.shingles(base, "doc_id", "text", distinct=False), "doc_id", NUM_HASHES
    ).localCheckpoint(eager=False)
    sh = dedup.shingles(base, "doc_id", "text").localCheckpoint(eager=False)
    cand = dedup.lsh_candidate_pairs(sig, "doc_id", NUM_HASHES, BANDS, hot_width=256)
    return dedup.jaccard_verify(cand, sh, "doc_id", JACCARD_T)


@register(
    "dedup_components",
    oracle=COMPONENTS_ORACLE,
    description="connected components over the MinHash near-dup graph "
    "(min-label propagation, join+min-agg per round, driver checks only a "
    "convergence scalar); oracle = recursive-CTE reachability closure",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = graph.connected_components(_spark_pairs(spark, sf_dir))
    return comp.orderBy("node")


GROUPS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_PAIRS_DUCK}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, label) AS (
  SELECT u AS node, u AS label FROM edges
  UNION
  SELECT e.v AS node, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
SELECT component, count(*) AS n_members, min(node) AS survivor,
       count(*) - 1 AS n_drops
FROM comp
GROUP BY component
ORDER BY component
"""


@register(
    "dedup_groups",
    oracle=GROUPS_ORACLE,
    description="dedup survivor decision: one keeper (min id) per near-dup "
    "component, drop counts — the final output a curation pipeline acts on",
)
def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = graph.connected_components(_spark_pairs(spark, sf_dir))
    return graph.dedup_groups(comp).orderBy("component")
