"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's query registry
(`posting_lines_spark/queries/`): every implemented operator from
SURVEY.md §2 registers a (PySpark callable, DuckDB oracle SQL) pair there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from posting_lines_spark.queries import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    End-to-end reference semantics (SURVEY.md §2.7 O16-O21): derive AIS
    segments, project EPSG:3005, compute length + SOG, aggregate.
    """
    registry = load_all()
    return registry["geo_flagship"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries (oracle=None)
    are non-SQL-expressible ops → driver records a rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
