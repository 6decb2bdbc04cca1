"""Query-level assertions that the oracle harness can't express."""

from __future__ import annotations

from tests.conftest import SF0001


def test_approx_stats_within_bounds(spark):
    from posting_lines_spark.queries.array_q import approx_stats
    from posting_lines_spark.sources import load_table

    row = approx_stats(spark, SF0001).collect()[0]
    li = load_table(spark, SF0001, "lineitem")
    assert row.exact_parts == li.select("l_partkey").distinct().count()
    assert row.exact_orders == li.select("l_orderkey").distinct().count()
    assert row.parts_ok and row.orders_ok and row.median_ok


def test_all_registered_queries_have_unique_output_columns(spark):
    """The driver sorts columns by name before hashing — duplicate column
    names would silently corrupt the comparison."""
    import __spark_entry__ as m

    for name, fn in m.queries().items():
        df = fn(spark, SF0001)
        cols = [c.lower() for c in df.columns]
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns: {cols}"
