"""Spatial predicate tests: distance-kernel correctness on known
geometry, and the plan shape of the distance join (bucketed broadcast
equi-join — never a cross join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from posting_lines_spark.functions import geo
from tests.conftest import SF0001


def _dist(spark, px, py, x1, y1, x2, y2):
    df = spark.createDataFrame(
        [(px, py, x1, y1, x2, y2)], "xs double, ys double, x1 double, y1 double, x2 double, y2 double"
    )
    layers = geo.point_segment_dist_layers("xs", "ys", "x1", "y1", "x2", "y2")
    return geo.with_layers(df, layers).collect()[0].dist_m


def test_point_segment_distance_cases(spark):
    # perpendicular foot inside the segment
    assert _dist(spark, 5.0, 3.0, 0.0, 0.0, 10.0, 0.0) == 3.0
    # foot beyond the end → distance to endpoint
    assert _dist(spark, 13.0, 4.0, 0.0, 0.0, 10.0, 0.0) == 5.0
    # degenerate (zero-length) segment → point distance, no div-by-zero
    assert _dist(spark, 3.0, 4.0, 0.0, 0.0, 0.0, 0.0) == 5.0
    # point on the segment
    assert _dist(spark, 4.0, 0.0, 0.0, 0.0, 10.0, 0.0) == 0.0


def test_distance_join_plan_is_broadcast_equi_join(spark):
    from posting_lines_spark.queries.spatial_q import geo_distance_join

    df = geo_distance_join(spark, SF0001)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text and "BroadcastNestedLoopJoin" not in text


def test_bbox_closed_bounds(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (1.0000001, 1.0), (-0.0000001, 0.5)], "x double, y double"
    )
    pred = geo.point_in_bbox_sql("x", "y", 0.0, 0.0, 1.0, 1.0)
    assert df.filter(F.expr(pred)).count() == 2


def test_random_segment_distances_match_numpy(spark):
    """120 seeded random (point, segment) cases in ONE DataFrame: the
    layered Spark expression must match a NumPy clamp-projection reference
    to float ulps."""
    import numpy as np

    rng = np.random.default_rng(20260813)
    m = rng.uniform(-100.0, 100.0, size=(120, 6))
    rows = [tuple(map(float, r)) for r in m]
    df = spark.createDataFrame(
        rows, "xs double, ys double, x1 double, y1 double, x2 double, y2 double"
    )
    layers = geo.point_segment_dist_layers("xs", "ys", "x1", "y1", "x2", "y2")
    got = [
        r.dist_m
        for r in geo.with_layers(df.withColumn("i", F.monotonically_increasing_id()), layers)
        .orderBy("xs", "ys", "x1")
        .collect()
    ]
    order = np.lexsort((m[:, 2], m[:, 1], m[:, 0]))
    m = m[order]
    dx, dy = m[:, 4] - m[:, 2], m[:, 5] - m[:, 3]
    wx, wy = m[:, 0] - m[:, 2], m[:, 1] - m[:, 3]
    len2 = dx * dx + dy * dy
    t = np.clip(np.divide(wx * dx + wy * dy, len2, out=np.zeros_like(len2), where=len2 > 0), 0, 1)
    want = np.sqrt((wx - t * dx) ** 2 + (wy - t * dy) ** 2)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
