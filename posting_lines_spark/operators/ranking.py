"""Distributed global ranking — the scale path for total-order indexes.

A plain `row_number() OVER (ORDER BY ...)` is a SINGLE-partition window:
every row funnels through one task — the classic scale-killer that is
invisible at sf0.01 and fatal at 100 TB. The standard two-pass fix
(Spark's own `zipWithIndex` shape, lifted to the DataFrame layer):

  1. `repartitionByRange` on the order key — partition p holds a
     contiguous key range, ranges ordered by p;
  2. rank locally within each partition (parallel windows);
  3. collect ONE count per partition (bounded by the partition count,
     never the data — the same driver-metadata budget as a bloom
     bitset) and add the exclusive prefix-sum offset of each partition.

Correctness requires a TOTAL order (a tiebreak column): with no ties,
any contiguous range split preserves global order, so the result equals
the single-partition window's ranks exactly — asserted by test on the
real corpus (tests/test_fifthwave.py) regardless of where the sampled
range boundaries land.

Reference scope note: the reference engine (SURVEY.md §2) never ranks;
this underpins the sorted-neighborhood dedup family (Hernandez-Stolfo
SNM), equi-depth profiling, and any ORDER-BY-layout write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row numbers over `order_cols` without a
    single-partition window. `order_cols` must be a total order (include
    a unique tiebreak column — with ties the boundary split would be
    arbitrary). Adds `out_col`; preserves all input columns."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # materialize the partitioned frame ONCE: the counts job and the
    # ranking job must see the SAME range boundaries (RangePartitioner
    # re-samples per execution — two independent runs can split ties at
    # different boundaries and skew every downstream offset)
    rp = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # one count per partition -> exclusive prefix sums on the driver
    # (bounded by the partition count; the sanctioned metadata collect)
    counts = {r._pid: r.cnt for r in rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in sorted(offsets.items()) for v in kv]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        rp.withColumn(out_col, (F.row_number().over(w) + off_expr).cast("bigint"))
        .drop("_pid")
    )


def global_running_sums(
    df: DataFrame,
    order_cols: list[str | Column],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global cumulative sums of `sum_cols` in `order_cols` order
    without a single-partition window — the ECDF/prefix-sum shape (same
    two-pass range-partition trick as global_row_number: local window
    cumsum + per-partition exclusive-prefix offsets collected once,
    bounded by the partition count). `order_cols` must be a total order.
    Sum columns must be integral (exact, order-free addition). NULLs in
    sum columns count as 0 — both the per-partition window sum and the
    partition totals coalesce to 0, so a NULL never silently skews
    `run_<col>` (a leading-NULL window sum would otherwise be NULL while
    the driver offsets coerced NULL totals to 0, desynchronizing the
    two). Adds `run_<col>` for each sum col; preserves all input
    columns."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # counts job and cumsum job must
        # see the SAME sampled range boundaries (see global_row_number)
    )
    totals = rp.groupBy("_pid").agg(
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).cast("bigint").alias(c)
            for c in sum_cols
        ]
    ).collect()
    by_pid = {r._pid: r for r in totals}
    offsets: dict[str, dict[int, int]] = {c: {} for c in sum_cols}
    acc = dict.fromkeys(sum_cols, 0)
    for pid in sorted(by_pid):
        for c in sum_cols:
            offsets[c][pid] = acc[c]
            acc[c] += by_pid[pid][c] or 0
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = rp
    for c in sum_cols:
        off = F.element_at(
            F.create_map(*[F.lit(v) for kv in sorted(offsets[c].items()) for v in kv]),
            F.col("_pid"),
        )
        out = out.withColumn(
            f"run_{c}",
            (F.sum(F.coalesce(F.col(c), F.lit(0))).over(w) + off).cast("bigint"),
        )
    return out.drop("_pid")


def global_running_max(
    df: DataFrame,
    order_cols: list[str | Column],
    max_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running MAX of `max_cols` in `order_cols` order
    without a single-partition window — the watermark/high-water-mark
    shape, same two-pass range-partition trick as global_running_sums:
    a per-partition window max plus per-partition exclusive PREFIX
    MAXIMA collected once (bounded by the partition count). The offset
    for the first partition is NULL and `greatest` skips NULLs, so no
    sentinel minimum is needed. `order_cols` must be a total order;
    max columns must be integral (BIGINT). NULL values never become the
    max (greatest skips them); an all-NULL prefix yields NULL, matching
    a single-partition window max. Adds `runmax_<col>` per max col."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # same sampled boundaries for both jobs
    )
    totals = rp.groupBy("_pid").agg(
        *[F.max(F.col(c)).cast("bigint").alias(c) for c in max_cols]
    ).collect()
    by_pid = {r._pid: r for r in totals}
    offsets: dict[str, dict[int, int | None]] = {c: {} for c in max_cols}
    acc: dict[str, int | None] = dict.fromkeys(max_cols)
    for pid in sorted(by_pid):
        for c in max_cols:
            offsets[c][pid] = acc[c]
            v = by_pid[pid][c]
            if v is not None and (acc[c] is None or v > acc[c]):
                acc[c] = v
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = rp
    for c in max_cols:
        off = F.element_at(
            F.create_map(
                *[
                    F.lit(v)
                    for pid, o in sorted(offsets[c].items())
                    for v in (pid, o)
                ]
            ),
            F.col("_pid"),
        )
        out = out.withColumn(
            f"runmax_{c}",
            F.greatest(F.max(F.col(c)).over(w), off).cast("bigint"),
        )
    return out.drop("_pid")
