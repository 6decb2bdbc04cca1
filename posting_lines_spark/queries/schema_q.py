"""Schema-fidelity query: the reference's full 18-column segments table
(sql_to_line.py:184-201) reproduced column-for-column, plus WKT
round-trip interop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.plans import ais
from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

FULL_SCHEMA_SQL = f"""
SELECT segment_id, uid, mmsi,
       CAST(start_time AS TIMESTAMP) AS start_time, duration,
       start_lat, start_lon, end_lat, end_lon,
       is_class_a, class_ais, class_gen, name, is_unique,
       CAST(last_change AS TIMESTAMP) AS last_change
FROM ({ais.SEGMENTS_FULL_SQL})
"""


@register(
    "segments_full_schema",
    oracle=FULL_SCHEMA_SQL,
    description="the reference's 18-column segments schema column-for-column "
    "(sql_to_line.py:184-201; geom/len_m/sog_kt are the derived trio added "
    "by the pipeline): types, nullable name varchar(20) cap, pass-through "
    "audit columns",
)
def segments_full_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(FULL_SCHEMA_SQL)
