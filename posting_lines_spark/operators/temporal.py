"""Temporal join operators Spark lacks natively (SURVEY.md §2.3: "as-of
join … interval join" belong to the engine's extension surface).

as_of_join — for each left row, the latest right row at-or-before its
timestamp, per key. Implemented as a union + ordered window
(last_value ignoring nulls), NOT a sort-merge of two streams: one shuffle
on (key), one in-partition sort — the classic distributed as-of shape.
At 100 TB both sides shuffle once on the key; no broadcast needed and
skewed keys split fine under AQE.

range_join_bucketed — equi-join on coarse time buckets + exact range
filter: turns an unbounded theta-join into |buckets|-bounded equi-join
work. Bucket width trades shuffle fanout (each left row probes 2
buckets) against per-bucket candidate count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row: values of `right_cols` from the latest right row
    with right.ts <= left.ts, same `key` (pd.merge_asof semantics,
    distributed). Ties on ts: the right row wins (marker orders right
    before left at equal ts). `tolerance_us` drops matches older than the
    given microsecond budget."""
    lcols = left.columns
    for c in (*lcols, *right_cols):
        if c.startswith("__"):
            raise ValueError(f"as_of_join reserves '__'-prefixed names; got {c!r}")
    # Right-side payload travels under reserved __r_<c> aliases so a left
    # column sharing a name in right_cols is never clobbered.
    l = left.withColumn("__is_left", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"__r_{c}", F.lit(None))
    r = right.select(
        F.col(key),
        F.col(ts),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__is_left", F.lit(0))
    for c in lcols:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None))
    unioned = l.unionByName(r.select(l.columns))
    w = (
        W.partitionBy(key)
        .orderBy(F.unix_micros(F.col(ts)), F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__is_left") == 0, F.col(f"__r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("__is_left") == 0, F.unix_micros(F.col(ts))), ignorenulls=True)
        .over(w)
        .alias("__asof_ts_us"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_us is not None:
        fresh = F.unix_micros(F.col(ts)) - F.col("__asof_ts_us") <= F.lit(tolerance_us)
        for c in right_cols:
            out = out.withColumn(f"__asof_{c}", F.when(fresh, F.col(f"__asof_{c}")))
        out = out.withColumn("__asof_ts_us", F.when(fresh, F.col("__asof_ts_us")))
    return out.select(
        *[c for c in lcols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_cols],
        F.col("__asof_ts_us").alias("asof_ts_us"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    bucket_us: int | None = None,
) -> DataFrame:
    """Join rows where right_ts ∈ [left_ts + lower_us, left_ts + upper_us):
    coarse-bucket equi-join + exact filter. Each left row probes the
    buckets its window can overlap (window ≤ bucket width ⇒ 2 probes)."""
    if bucket_us is None:
        bucket_us = max(upper_us - lower_us, 1)
    n_probe = (upper_us - lower_us) // bucket_us + 2
    l = left.withColumn("__lus", F.unix_micros(F.col(left_ts)))
    r = right.withColumn("__rus", F.unix_micros(F.col(right_ts))).withColumn(
        "__bucket", (F.col("__rus") / bucket_us).cast("long")
    )
    probes = F.explode(
        F.array(*[((F.col("__lus") + lower_us) / bucket_us).cast("long") + i for i in range(n_probe)])
    )
    l = l.withColumn("__bucket", probes)
    joined = l.join(r, "__bucket").filter(
        (F.col("__rus") >= F.col("__lus") + lower_us)
        & (F.col("__rus") < F.col("__lus") + upper_us)
    )
    return joined.drop("__bucket", "__lus", "__rus")
