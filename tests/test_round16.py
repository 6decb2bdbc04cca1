"""Round-16 optimization-round tests: changed operator internals only
(no new features) — stream-partition env validation and the lazy
round-cut loop helper."""

import pytest

from posting_lines_spark.streaming.tuning import stream_partitions


def test_stream_shuffle_env_honored(monkeypatch):
    # the env path returns before the session conf is read
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "24")
    assert stream_partitions(None, "/nonexistent") == 24


@pytest.mark.parametrize("bad", ["abc", "1.5", ""])
def test_stream_shuffle_env_malformed_raises(monkeypatch, bad):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", bad)
    if bad == "":
        # empty env var means "unset" (falsy) — falls through to sizing,
        # which needs a session; just assert it doesn't take the env path
        # by checking it raises the AttributeError of the None session,
        # not a ValueError about the variable.
        with pytest.raises(AttributeError):
            stream_partitions(None, "/nonexistent")
    else:
        with pytest.raises(ValueError, match="SPARK_GRAFT_STREAM_SHUFFLE"):
            stream_partitions(None, "/nonexistent")


@pytest.mark.parametrize("bad", ["0", "-4"])
def test_stream_shuffle_env_nonpositive_rejected(monkeypatch, bad):
    # round-15 behavior silently clamped these to 1; they now fail loudly
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", bad)
    with pytest.raises(ValueError, match="positive"):
        stream_partitions(None, "/nonexistent")


def test_round_cut_is_lazy_and_truncates(spark):
    """round_cut must cut lineage (LogicalRDD) without materializing
    eagerly, and preserve rows exactly."""
    from posting_lines_spark.operators.graph import round_cut

    df = spark.range(100).selectExpr("id AS u", "id % 7 AS v")
    cut = round_cut(df)
    plan = cut._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan
    assert sorted(r["v"] for r in cut.collect()) == sorted(
        r["v"] for r in df.collect()
    )
