"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.8 extension surface; the "custom stateful operators" entry
of the pyspark guide).

The operator keeps (n_events, max_value) per user across micro-batches
and emits the running totals each batch. Driven with availableNow +
maxFilesPerTrigger=1 so a bounded parquet directory exercises REAL
multi-batch state handoff (one batch per file), then the final state is
compared against the plain batch aggregate — state plumbing proven
end-to-end without an unbounded source.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _track_user(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, mx = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "max_value": [mx]})


def running_user_stats(
    spark: SparkSession, events: DataFrame, n_files: int = 4
) -> DataFrame:
    """Run the stateful tracker over `events` split into `n_files` files →
    n_files micro-batches. Returns the LAST emitted row per user (= final
    state). Update-mode memory sink keeps the latest row per key batch."""
    from posting_lines_spark.fixtures import scratch_dir

    src = scratch_dir(prefix="pls_state_src_")
    events.repartition(n_files).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"user_stats_{abs(hash(src)) % 10**8}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends each batch's emissions; the final
    # state per user is the row with the max n_events
    latest = spark.table(name)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        latest.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn")
    )
