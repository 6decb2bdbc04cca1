"""Array-function surface + approximate aggregates.

`array_funcs` is oracle-checked (sorted-distinct arrays are canonical on
both engines). The approx aggregates are engine-specific sketches (HLL /
KLL implementations differ), so `approx_stats` is a rows-only entry —
its accuracy bound is asserted in tests/test_queries.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

ARRAY_ORACLE = """
SELECT source,
       list_sort(list(DISTINCT split_part(text, ' ', 1))) AS first_tokens,
       len(list(DISTINCT split_part(text, ' ', 1))) AS n_distinct_first
FROM documents
GROUP BY source
ORDER BY source
"""


@register(
    "array_funcs",
    oracle=ARRAY_ORACLE,
    description="array functions: collect_set + sort_array per group "
    "(array<string> output column; engine surface §2.7 tail)",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    first = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    return (
        d.groupBy("source")
        .agg(
            F.sort_array(F.collect_set(first)).alias("first_tokens"),
            F.size(F.collect_set(first)).cast("long").alias("n_distinct_first"),
        )
        .orderBy("source")
    )


@register(
    "approx_stats",
    oracle=None,  # sketch implementations are engine-specific → rows-only
    description="approximate aggregates: approx_count_distinct (HLL++) and "
    "percentile_approx — the constant-memory path for 100 TB cardinality/"
    "quantile estimation; accuracy bound asserted in tests",
)
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
