"""Event-analytics operators over `events`: ordered-sequence funnel
analysis and cohort retention — the two classic product-analytics
queries engines grow dedicated operators for (ClickHouse windowFunnel /
retention); here both are compositions of interval joins and
day-bucketed aggregates, exactly oracle-checkable because all time math
is integer microseconds (TESTDATA ns truncated to µs on both engines).

Scale: the funnel's stage joins are per-user interval joins (shuffle on
user_id; per-user event counts are small and AQE splits outliers);
cohort retention is two hash-aggregates keyed on user then
(cohort, offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

# --- funnel: view → click → purchase, each step within 1 hour ---

FUNNEL_SQL = """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
vc AS (
  SELECT DISTINCT v.user_id, c.ts AS c_ts
  FROM v JOIN c ON c.user_id = v.user_id
   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
),
vcp AS (
  SELECT DISTINCT vc.user_id
  FROM vc JOIN p ON p.user_id = vc.user_id
   AND p.ts >= vc.c_ts AND p.ts <= vc.c_ts + INTERVAL 1 HOUR
)
SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM v) AS n_stage_view,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM vc) AS n_stage_click,
       (SELECT CAST(count(*) AS BIGINT) FROM vcp) AS n_stage_purchase
"""


@register(
    "funnel_analysis",
    oracle=FUNNEL_SQL,
    description="ordered-sequence funnel (view→click→purchase, each step "
    "within 1h): per-user interval joins, distinct-user counts per stage "
    "— the windowFunnel-style operator as declarative joins; shuffles on "
    "user_id only",
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(FUNNEL_SQL)


# --- cohort retention ---

def _cohort_sql(epoch_us: str) -> str:
    day = f"CAST(floor({epoch_us} / 86400000000.0e0) AS BIGINT)"
    return f"""
WITH days AS (
  SELECT user_id, {day} AS day_no FROM events
),
firsts AS (
  SELECT user_id, min(day_no) AS cohort_day FROM days GROUP BY user_id
)
SELECT f.cohort_day,
       d.day_no - f.cohort_day AS day_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active_users
FROM days d JOIN firsts f ON d.user_id = f.user_id
GROUP BY f.cohort_day, d.day_no - f.cohort_day
ORDER BY cohort_day, day_offset
"""


@register(
    "cohort_retention",
    oracle=_cohort_sql("epoch_us(ts)"),
    description="cohort retention: first-activity day per user (cohort), "
    "distinct active users per (cohort, day offset) — day bucketing in "
    "exact integer µs; two hash-aggregates, user then (cohort, offset)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cohort_sql("unix_micros(ts)"))
