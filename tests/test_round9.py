"""Round-9 regression tests: the four ADVICE-r8 findings.

1. _track_gaps must buffer a group's chunks before sorting (a group
   whose rows span multiple Arrow record batches within one micro-batch
   must fold gaps in global time order, not per-chunk order).
2. ml_map_at_k normalizes by min(K, TOTAL positives per user) — the
   standard TREC convention.
3. sketch_linear_counting reports NULL (not garbage) in the saturated
   v_empty = 0 regime.
4. graph_modularity's q_num arithmetic survives operands whose products
   exceed int64 (decimal routing + VARCHAR final cast, both engines).
"""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF001


class _FakeState:
    """Minimal GroupState stand-in for unit-driving _track_gaps."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _fold_python(ts_list):
    ts = sorted(ts_list)
    n = sg = sgg = 0
    for a, b in zip(ts, ts[1:]):
        g = b - a
        n += 1
        sg += g
        sgg += g * g
    return n, sg, sgg


def test_track_gaps_multichunk_group():
    """A group split across unsorted Arrow chunks must fold the SAME
    moments as one globally-sorted pass (the r8 ADVICE medium: per-chunk
    sorting computed gaps between misordered neighbors)."""
    from posting_lines_spark.streaming.stateful import _LANE, _track_gaps

    # Timestamps deliberately interleaved so per-chunk sorting would see
    # negative boundary gaps: chunk1 holds late rows, chunk2 early ones.
    c1 = pd.DataFrame({"ts_us": [5_000_000, 9_000_000], "event_id": [5, 9]})
    c2 = pd.DataFrame({"ts_us": [1_000_000, 7_000_000], "event_id": [1, 7]})
    c3 = pd.DataFrame({"ts_us": [3_000_000], "event_id": [3]})
    st = _FakeState()
    [out] = list(_track_gaps((42, "click"), iter([c1, c2, c3]), st))
    n, sg, sgg = _fold_python([5e6, 9e6, 1e6, 7e6, 3e6])
    assert int(out["n"][0]) == n
    assert int(out["sg"][0]) == sg
    assert int(out["sgg_hi"][0]) * _LANE + int(out["sgg_lo"][0]) == sgg
    # State carries; a later batch continues from the global max ts.
    c4 = pd.DataFrame({"ts_us": [11_000_000], "event_id": [11]})
    [out2] = list(_track_gaps((42, "click"), iter([c4]), st))
    n2, sg2, sgg2 = _fold_python([5e6, 9e6, 1e6, 7e6, 3e6, 11e6])
    assert int(out2["n"][0]) == n2
    assert int(out2["sg"][0]) == sg2
    assert int(out2["sgg_hi"][0]) * _LANE + int(out2["sgg_lo"][0]) == sgg2


def test_stream_interarrival_twin_multichunk(spark):
    """End-to-end: with Arrow batches forced tiny (7 rows), every group
    spans many chunks inside each micro-batch; the stateful twin must
    still equal the batch query exactly."""
    from posting_lines_spark.queries import load_all

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        reg = load_all()
        batch = {
            r["event_type"]: (r["n"], r["mean_gap_us"], r["var_gap_us"])
            for r in reg["events_interarrival_burstiness"]
            .fn(spark, SF001)
            .collect()
        }
        twin = {
            r["event_type"]: (r["n"], r["mean_gap_us"], r["var_gap_us"])
            for r in reg["stream_interarrival_stateful"]
            .fn(spark, SF001)
            .collect()
        }
    finally:
        spark.conf.set(key, old)
    assert twin == batch


def test_map_at_k_standard_normalization(spark):
    """A user whose relevant items mostly sit OUTSIDE the top-K must not
    score AP=1.0 from one rank-1 hit: the divisor is min(K, total
    positives), and zero-hit users with positives still count (AP=0)."""
    from posting_lines_spark.queries.ml_q import MAP_K, _map_sql

    import duckdb

    con = duckdb.connect()
    # user 1: 1 hit at rank 1, but 30 relevant total -> AP = 1/min(K,30)
    # user 2: positives only at ranks K+1.. -> AP = 0, still in the mean
    rows = []
    for rnk in range(1, 61):
        rows.append((1, rnk, 1 if (rnk == 1 or rnk > 30) else 0))
    for rnk in range(1, 61):
        rows.append((2, rnk, 1 if rnk > MAP_K else 0))
    con.execute("CREATE TABLE ranked(user_id BIGINT, rnk BIGINT, y BIGINT)")
    con.executemany("INSERT INTO ranked VALUES (?, ?, ?)", rows)
    sql = _map_sql()
    # swap the events-derived ranking for the synthetic one
    head, _, tail = sql.partition("),\nnp AS (")
    sql = "WITH r AS (SELECT user_id, rnk, y FROM ranked),\nnp AS (" + tail
    got = con.execute(sql).fetchone()
    con.close()
    ap1 = 1.0 / MAP_K  # min(K, 30) = K
    ap2 = 0.0
    assert got[0] == 2
    assert abs(got[1] - (ap1 + ap2) / 2) < 1e-12


def test_linear_counting_saturated_is_null(spark):
    """v_empty = 0 (every bucket occupied) must yield NULL n_est and
    rel_err — not the integer-ln kernel's finite-wrong value at 0."""
    from posting_lines_spark.functions.hashing import md5_int_spark
    from posting_lines_spark.queries.sketch_q import _linear_counting_sql

    spark.range(200_000).selectExpr("id AS user_id").createOrReplaceTempView(
        "events"
    )
    row = spark.sql(
        _linear_counting_sql(md5_int_spark("user_id", salt="lc"))
    ).collect()[0]
    assert row["v_empty"] == 0
    assert row["n_exact"] == 200_000
    assert row["n_est"] is None
    assert row["rel_err"] is None


def test_modularity_qnum_above_int64(spark, duck):
    """The decimal-routed q_num arithmetic is exact and engine-identical
    when intra*w2 and strength^2 exceed int64 (the r8 ADVICE overflow:
    raw BIGINT products wrapped on Spark, errored on DuckDB)."""
    w2 = 4_000_000_000  # doubled total edge weight past the ~3e9 wrap point
    rows = [(3_900_000_000, 1_000_000_000), (3_800_000_000, 1_000_000_000)]
    frag = """
SELECT CAST(CAST(sum(CAST(intra AS DECIMAL(19,0)) * CAST({w2} AS DECIMAL(19,0))
              - CAST(strength AS DECIMAL(19,0)) * CAST(strength AS DECIMAL(19,0)))
         AS STRING) AS DOUBLE) AS q_num
FROM per_c
""".format(w2=w2)
    exact = sum(i * w2 - s * s for i, s in rows)
    assert exact > 2**63  # genuinely out of int64 range
    spark.createDataFrame(rows, "intra long, strength long").createOrReplaceTempView("per_c")
    got_spark = spark.sql(frag).collect()[0]["q_num"]
    duck.execute("CREATE OR REPLACE TABLE per_c(intra BIGINT, strength BIGINT)")
    duck.executemany("INSERT INTO per_c VALUES (?, ?)", rows)
    got_duck = duck.execute(frag).fetchone()[0]
    duck.execute("DROP TABLE per_c")
    assert got_spark == got_duck == float(exact)


def test_interarrival_stateful_recovers_after_restart(spark):
    """Crash/resume path of the gap-moment state store (round-8 VERDICT
    item 3, mirroring test_stateful_attribution_recovers_after_restart):
    drain the first half of the time slices, STOP the query (offsets +
    per-(user,type) lane state checkpointed), reveal the rest, then
    start a BRAND-NEW query from the same checkpoint. The resumed query
    must reload (last_ts, n, Σg, Σg²-lanes) from the state store — the
    boundary gap between the halves is only correct if last_ts
    survived — so the per-key union-max partials equal the
    uninterrupted run's exactly."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from pyspark.sql.streaming.state import GroupStateTimeout

    from posting_lines_spark.fixtures import scratch_dir
    from posting_lines_spark.queries.stream_q import _sess_write_slices
    from posting_lines_spark.sources import load_table
    from posting_lines_spark.streaming.stateful import (
        _track_gaps,
        interarrival_stateful,
    )

    events = load_table(spark, SF001, "events")
    full = scratch_dir("pls_gaprec_full_")
    _sess_write_slices(events)(full)
    files = sorted(
        (os.path.join(full, f) for f in os.listdir(full) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    assert len(files) == 6  # 4 slices + 2 watermark-flush sentinels

    src = scratch_dir("pls_gaprec_src_")
    sink = scratch_dir("pls_gaprec_out_")
    ckpt = scratch_dir("pls_gaprec_ckpt_")
    schema = spark.read.parquet(full).schema

    def drain() -> None:
        # The memory sink can't recover from a checkpoint, so the
        # restart path uses a parquet sink in append mode: every
        # micro-batch appends each touched key's RUNNING totals, and
        # the max-n row per key is the final answer — same row-shape
        # and same _track_gaps state encoding as the registered query.
        out = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .where(F.col("user_id") >= 0)
            .withColumn("ts_us", F.expr("unix_micros(ts)"))
            .groupBy("user_id", "event_type")
            .applyInPandasWithState(
                _track_gaps,
                outputStructType="user_id long, event_type string, n long,"
                " sg long, sgg_hi long, sgg_lo long",
                stateStructType="last_ts long, n long, sg long,"
                " sgg_hi long, sgg_lo long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:3]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain()
    for f in files[3:]:
        shutil.copy2(f, os.path.join(src, os.path.basename(f)))
    drain()  # new query object; resumes from ckpt

    # final per-key row = max-n row across all appended running totals
    both = spark.read.schema(
        "user_id long, event_type string, n long, sg long,"
        " sgg_hi long, sgg_lo long"
    ).parquet(sink)
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("n").desc())
    got = {
        (r["user_id"], r["event_type"]): (r["n"], r["sg"], r["sgg_hi"], r["sgg_lo"])
        for r in both.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["n"], r["sg"], r["sgg_hi"], r["sgg_lo"])
        for r in interarrival_stateful(spark, full).collect()
    }
    assert got == want
