"""Query-level assertions that the oracle harness can't express."""

from __future__ import annotations

from tests.conftest import SF0001


def test_approx_stats_within_bounds(spark):
    from posting_lines_spark.queries.array_q import approx_stats
    from posting_lines_spark.sources import load_table

    row = approx_stats(spark, SF0001).collect()[0]
    li = load_table(spark, SF0001, "lineitem")
    exact_parts = li.select("l_partkey").distinct().count()
    exact_orders = li.select("l_orderkey").distinct().count()
    assert abs(row.approx_parts - exact_parts) / exact_parts < 0.05
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.05
    exact_median = li.selectExpr("percentile(l_extendedprice, 0.5) AS m").collect()[0].m
    assert abs(row.approx_median_price - exact_median) / exact_median < 0.05


def test_all_registered_queries_have_unique_output_columns(spark):
    """The driver sorts columns by name before hashing — duplicate column
    names would silently corrupt the comparison."""
    import __spark_entry__ as m

    for name, fn in m.queries().items():
        df = fn(spark, SF0001)
        cols = [c.lower() for c in df.columns]
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns: {cols}"
