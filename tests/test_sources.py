"""Connector-surface tests that can run without a database server: the
JDBC reader/writer builder chains are exercised against mocks and the
recorded options asserted (the environment has no JDBC endpoint — the
real round-trip is documented as untestable here)."""

from __future__ import annotations

from unittest.mock import MagicMock

from posting_lines_spark.sources import load_jdbc, write_jdbc


def _chained_mock():
    m = MagicMock()
    m.format.return_value = m
    m.option.return_value = m
    m.schema.return_value = m
    m.mode.return_value = m
    return m


def test_load_jdbc_partitioned_options():
    spark = MagicMock()
    reader = _chained_mock()
    spark.read = reader
    load_jdbc(
        spark,
        "jdbc:postgresql://host/db",
        "segments",
        partition_column="segmentid",
        num_partitions=16,
        lower_bound=0,
        upper_bound=1_000_000,
        user="u",
    )
    opts = {c.args[0]: c.args[1] for c in reader.option.call_args_list}
    assert opts["url"] == "jdbc:postgresql://host/db"
    assert opts["dbtable"] == "segments"
    assert opts["partitionColumn"] == "segmentid"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["user"] == "u"
    reader.load.assert_called_once()


def test_write_jdbc_caps_connections_and_batches():
    df = MagicMock()
    writer = _chained_mock()
    df.coalesce.return_value = df
    df.write = writer
    write_jdbc(
        df,
        "jdbc:postgresql://host/db",
        "segments_out",
        mode="overwrite",
        num_partitions=8,
        batch_size=5000,
        isolationLevel="READ_COMMITTED",
    )
    df.coalesce.assert_called_once_with(8)
    opts = {c.args[0]: c.args[1] for c in writer.option.call_args_list}
    assert opts["url"] == "jdbc:postgresql://host/db"
    assert opts["dbtable"] == "segments_out"
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    writer.mode.assert_called_once_with("overwrite")
    writer.save.assert_called_once()


def test_write_jdbc_no_coalesce_by_default():
    df = MagicMock()
    writer = _chained_mock()
    df.write = writer
    write_jdbc(df, "jdbc:x", "t")
    df.coalesce.assert_not_called()
    writer.mode.assert_called_once_with("append")
