"""Temporal join queries: as-of join and bucketed range join
(operators/temporal.py) with DuckDB oracles (native ASOF JOIN / plain
inequality join — tractable at oracle scale, while the Spark side uses
the distributed formulations).

Domain: for every `purchase` event, the user's most recent prior `signup`
or `click` context event (as-of), and error events within 5 minutes after
any purchase (range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posting_lines_spark.operators import temporal
from posting_lines_spark.queries import register
from posting_lines_spark.sources import load_table

ASOF_ORACLE = """
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) AS ts_us,
       r.value AS asof_value,
       epoch_us(r.ts) AS asof_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
ORDER BY l.event_id
"""


@register(
    "asof_join",
    oracle=ASOF_ORACLE,
    description="as-of join (SURVEY.md §2.3 extension): latest prior click "
    "per purchase, per user — union + ordered last_value window (one "
    "shuffle on the key; the distributed merge_asof)",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    out = temporal.as_of_join(purchases, clicks, key="user_id", ts="ts", right_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_value"),
        F.col("asof_ts_us"),
    ).orderBy("event_id")
"""
Note: ties at identical ts: both engines prefer the right row (ASOF uses
<=; the window orders right-before-left at equal ts).
"""


RANGE_ORACLE = """
SELECT p.event_id AS purchase_id, e.event_id AS error_id,
       epoch_us(e.ts) - epoch_us(p.ts) AS delta_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON epoch_us(e.ts) >= epoch_us(p.ts) AND epoch_us(e.ts) < epoch_us(p.ts) + 300000000
ORDER BY purchase_id, error_id
"""


@register(
    "range_join",
    oracle=RANGE_ORACLE,
    description="range (interval) join via coarse-bucket equi-join + exact "
    "filter (SURVEY.md §2.3 extension): errors within 5 min after each "
    "purchase; bucket width bounds the candidate fanout at scale",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    joined = temporal.range_join_bucketed(
        purchases, errors, "p_ts", "e_ts", lower_us=0, upper_us=300_000_000
    )
    return joined.select(
        "purchase_id",
        "error_id",
        (F.unix_micros("e_ts") - F.unix_micros("p_ts")).alias("delta_us"),
    ).orderBy("purchase_id", "error_id")
