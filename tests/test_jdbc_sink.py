"""Unit tests for the JDBC sink config/shaping layer (no DB in env —
SURVEY.md §2.A sink_jdbc_gp is doc+unit only)."""

from __future__ import annotations

from insight_gp_import_spark.sources import JdbcSinkConfig, prepare_jdbc_write
from insight_gp_import_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_jdbc_properties_batching():
    cfg = JdbcSinkConfig(url="jdbc:postgresql://gp:5432/insight", table="t")
    props = cfg.jdbc_properties()
    assert props["batchsize"] == "10000"
    assert props["reWriteBatchedInserts"] == "true"


def test_jdbc_properties_override():
    cfg = JdbcSinkConfig(
        url="jdbc:postgresql://gp:5432/insight",
        table="t",
        batch_size=500,
        properties={"user": "gpadmin"},
    )
    props = cfg.jdbc_properties()
    assert props["batchsize"] == "500"
    assert props["user"] == "gpadmin"


def test_prepare_shrinks_with_coalesce(spark):
    df = load_table(spark, SF, "lineitem").repartition(16)
    cfg = JdbcSinkConfig(url="jdbc:x", table="t", num_partitions=4)
    shaped = prepare_jdbc_write(df, cfg)
    assert shaped.rdd.getNumPartitions() == 4


def test_prepare_widens_with_repartition(spark):
    df = load_table(spark, SF, "region").coalesce(1)
    cfg = JdbcSinkConfig(url="jdbc:x", table="t", num_partitions=8)
    shaped = prepare_jdbc_write(df, cfg)
    assert shaped.rdd.getNumPartitions() == 8
