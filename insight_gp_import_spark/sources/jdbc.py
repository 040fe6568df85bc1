"""JDBC batch sink — the Greenplum/Postgres load path (SURVEY.md §2.A
``sink_jdbc_gp``).

The reference loads CSV batches into Greenplum through gpfdist-backed
external tables: GP segments pull rows in parallel, so load bandwidth
scales with segments, not with the loader process. The Spark-native
equivalent keeps the same property from the other side: ``numPartitions``
concurrent executor connections, each INSERTing its own partition with
``batchsize``-row batches. For Greenplum specifically, JDBC is the
portable path; the fast path on a real deployment is staging parquet/CSV
to the segments and using gpfdist — out of scope here (no Greenplum in
the test environment).

The plumbing IS exercised end-to-end, though: Spark ships Apache Derby
(an embedded JDBC database), so ``operators/scans.py::sink_jdbc_gp``
runs the full write→read-back round trip through a real JDBC driver —
same ``df.write.jdbc`` / ``spark.read.jdbc`` code paths a Greenplum
deployment would use, just a different url/driver pair.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

DEFAULT_BATCH_SIZE = 10_000


@dataclass(frozen=True)
class JdbcSinkConfig:
    url: str  # e.g. jdbc:postgresql://gp-master:5432/insight
    table: str
    mode: str = "append"  # append | overwrite (snapshot replace)
    num_partitions: int = 8  # concurrent writer connections
    batch_size: int = DEFAULT_BATCH_SIZE
    properties: dict[str, str] = field(default_factory=dict)

    def jdbc_properties(self) -> dict[str, str]:
        props = {
            "batchsize": str(self.batch_size),
            # GP/Postgres: multi-row INSERTs per round trip
            "reWriteBatchedInserts": "true",
            **self.properties,
        }
        return props


def prepare_jdbc_write(df: DataFrame, cfg: JdbcSinkConfig) -> DataFrame:
    """Shape a DataFrame for the JDBC sink: exactly ``num_partitions``
    writer tasks (= concurrent connections). Coalesce when shrinking
    (no shuffle); repartition only when widening."""
    n = df.rdd.getNumPartitions()
    if n == cfg.num_partitions:
        return df
    if n > cfg.num_partitions:
        return df.coalesce(cfg.num_partitions)
    return df.repartition(cfg.num_partitions)


def write_jdbc(df: DataFrame, cfg: JdbcSinkConfig) -> None:
    """Execute the batched parallel JDBC write (requires a reachable DB)."""
    shaped = prepare_jdbc_write(df, cfg)
    (
        shaped.write.mode(cfg.mode).jdbc(
            url=cfg.url, table=cfg.table, properties=cfg.jdbc_properties()
        )
    )


def read_jdbc_partitioned(
    spark,
    cfg: JdbcSinkConfig,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
) -> DataFrame:
    """Parallel JDBC source: ``num_partitions`` concurrent range-scan
    queries over ``partition_column`` (the standard Spark JDBC split —
    each task reads WHERE lo <= col < hi). Without this, a JDBC read is
    a single connection and the whole table serializes through it."""
    return spark.read.jdbc(
        url=cfg.url,
        table=cfg.table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=cfg.num_partitions,
        properties=cfg.jdbc_properties(),
    )
