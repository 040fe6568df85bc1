"""Python Data Source API (Spark 4, SPARK-44076): the pure-Python
extension point for custom connectors — how a proprietary-protocol
reader (the class of source a gpfdist-style parallel loader exposes)
plugs into the DataFrame API without JVM code.

`SyntheticManifestSource` is a deterministic batch source: it
synthesizes a file-manifest relation (file_id, shard, size_bytes)
entirely from its options, partitioned into independent splits so
Spark schedules one task per split — the same partition-planning
contract a real network source implements (each split carries enough
state for its task to fetch its slice independently; no driver-side
data materialization). Values are a fixed integer hash of file_id, so
the relation is reproducible anywhere — which is what lets the op
wrapping this source be ORACLE-CHECKED: DuckDB rebuilds the identical
relation from generate_series.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MANIFEST_SOURCE_NAME = "igis_manifest"
# Knuth multiplicative hash constant — deterministic, SQL-expressible.
_HASH_MULT = 2654435761
_HASH_MOD = 1_000_000


class _RangeSplit(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _ManifestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 4096))
        self.splits = int(options.get("splits", 8))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.n // self.splits)  # ceil-div
        return [
            _RangeSplit(i * per, min((i + 1) * per, self.n))
            for i in range(self.splits)
            if i * per < self.n
        ]

    def read(self, partition: _RangeSplit) -> Iterator[tuple]:
        for file_id in range(partition.start, partition.end):
            yield (
                file_id,
                file_id % 16,
                (file_id * _HASH_MULT) % _HASH_MOD,
            )


class SyntheticManifestSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return MANIFEST_SOURCE_NAME

    def schema(self) -> str:
        return "file_id BIGINT, shard INT, size_bytes BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _ManifestReader(self.options)


def register_manifest_source(spark) -> None:
    """Idempotent registration (re-registering the same name is safe)."""
    spark.dataSource.register(SyntheticManifestSource)
