"""Synthetic AIS `segments` derivation over the driver's `lineitem` table.

The reference's input schema (sql_to_line.py:184-201, SURVEY.md §1.3) is a
table of vessel-track segments. The driver testdata has no such table, so
FIXTURES.md §B1 fixes deterministic formulas that derive one from
`lineitem` — identical SQL text on the Spark and DuckDB sides, so no random
state is needed and the oracle sees the same rows.

Column mapping to the reference schema:
  segment_id ← segmentId (sql_to_line.py:184). NOT unique here: the
               datagen repeats (l_orderkey, l_linenumber) pairs, so
               segment_id carries duplicates — mirroring the reference's
               reality that dedup happens upstream (the isUnique flag,
               sql_to_line.py:197). Tests therefore compare multisets
               rather than joining on segment_id.
  uid        ← uid       (:185)
  mmsi       ← mmsi      (:186)  — synthesized vessel pool
  start_time ← startTime (:187)  — drives per-day batching semantics
  duration   ← duration  (:188)  — seconds; ~2% zero rows exercise the
               `duration = 0` clean step (:144-149) and quirk Q4
  start_lon/start_lat/end_lon/end_lat ← (:189-192)
  needs_geom ← `geom IS NULL` incrementality contract (:38, :41) — here a
               deterministic predicate so the oracle can replay it.

All float literals use e-notation (DOUBLE in both engines — see
functions/geo.py:dlit) and duration uses floor() because Spark's
double→int CAST truncates while DuckDB's rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from posting_lines_spark.sources import load_table

START_LON = "(-134.0e0 + (l_partkey % 1000) / 1000.0e0 * 12.0e0)"
START_LAT = "(48.0e0 + (l_suppkey % 100) / 100.0e0 * 6.0e0)"
END_LON = f"({START_LON} + ((l_orderkey % 100) - 50) / 1000.0e0)"
END_LAT = f"({START_LAT} + ((l_linenumber % 10) - 5) / 1000.0e0)"
# ~2% of rows get duration=0 (the reference's problem rows, sql_to_line.py:145)
DURATION = "(CASE WHEN l_orderkey % 50 = 0 THEN 0 ELSE CAST(floor(l_quantity * 60.0e0) AS INT) + 1 END)"
NEEDS_GEOM = "((l_orderkey % 10) < 6)"

SEGMENTS_SQL = f"""SELECT
  l_orderkey * 10 + l_linenumber AS segment_id,
  l_orderkey AS uid,
  CAST(200000000 + (l_suppkey % 100) * 1000 + (l_partkey % 500) AS INT) AS mmsi,
  l_shipdate AS start_time,
  {DURATION} AS duration,
  {START_LON} AS start_lon,
  {START_LAT} AS start_lat,
  {END_LON} AS end_lon,
  {END_LAT} AS end_lat,
  {NEEDS_GEOM} AS needs_geom,
  l_returnflag AS returnflag
FROM lineitem"""

# Full 18-column reference schema (sql_to_line.py:184-201, SURVEY.md §1.3):
# SEGMENTS_SQL above carries the computation-relevant subset; this variant
# adds the pass-through columns (isClassA, classAIS, classGen, name,
# isUnique, lastChange) with deterministic derivations so the schema
# surface matches the reference table column-for-column.
SEGMENTS_FULL_SQL = f"""SELECT
  l_orderkey * 10 + l_linenumber AS segment_id,
  l_orderkey AS uid,
  CAST(200000000 + (l_suppkey % 100) * 1000 + (l_partkey % 500) AS INT) AS mmsi,
  l_shipdate AS start_time,
  {DURATION} AS duration,
  {START_LAT} AS start_lat,
  {START_LON} AS start_lon,
  {END_LAT} AS end_lat,
  {END_LON} AS end_lon,
  (l_orderkey % 10) < 7 AS is_class_a,
  CAST(l_partkey % 100 AS SMALLINT) AS class_ais,
  CAST(l_suppkey % 10 AS SMALLINT) AS class_gen,
  CASE WHEN l_orderkey % 10 = 9 THEN NULL
       ELSE substring(concat('VESSEL_', l_suppkey % 100), 1, 20) END AS name,
  (l_orderkey % 20) != 0 AS is_unique,
  l_shipdate AS last_change,
  {NEEDS_GEOM} AS needs_geom,
  l_returnflag AS returnflag
FROM lineitem"""


def segments_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The segments table as a DataFrame (lazy; scan+project only)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SEGMENTS_SQL)
