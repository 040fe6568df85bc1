"""Tests for the JDBC sink (SURVEY.md §2.A sink_jdbc_gp): config/
shaping units plus a real write→read-back round trip through embedded
Derby (the JDBC driver Spark ships for its Hive metastore)."""

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


def test_jdbc_round_trip_derby(spark):
    """sink_jdbc_gp: every (nationkey, count, sum) group after the
    Derby round trip equals the same aggregate computed parquet-side,
    and the read-back is split across parallel range partitions."""
    from pyspark.sql import functions as F

    from insight_gp_import_spark.operators.scans import sink_jdbc_gp

    got = {
        r.c_nationkey: (r.n_customers, round(r.sum_acctbal, 2))
        for r in sink_jdbc_gp(spark, SF).collect()
    }
    want = {
        r.c_nationkey: (r.n, round(r.s, 2))
        for r in load_table(spark, SF, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), F.sum("c_acctbal").alias("s"))
        .collect()
    }
    assert got == want
