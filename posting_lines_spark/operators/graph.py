"""Connected components over near-duplicate pair graphs — the step that
turns dedup PAIRS (operators/dedup.py) into dedup GROUPS: each component
keeps one survivor (min id), the rest are drops.

Algorithm: min-label propagation. label(v) starts as v; each round every
vertex takes the min label among itself and its neighbors; converges in
O(component diameter) rounds. Near-dup components are shallow (dup
clusters link densely), so a handful of rounds suffices; for web-scale
graphs with long chains the same loop accepts the alternating
large-star/small-star optimization (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — each round stays a
join + min-aggregate, which is the Spark-shaped formulation (no driver-
side adjacency, data never leaves executors; the driver only checks the
convergence metric).

Determinism: labels are min(int64) — order-independent; the DuckDB
oracle replays the closure with a recursive CTE and takes the same min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id reachable. Iterates until the label sum stops changing
    (monotonically decreasing, so equality ⇔ fixpoint)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("node", F.col("label").alias("component"))


def dedup_groups(components: DataFrame) -> DataFrame:
    """Survivor/drop decision per component: keep min id, count members."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("node").alias("survivor"))
        .withColumn("n_drops", F.col("n_members") - 1)
    )
