"""Sources / scans / sinks (SURVEY.md §2.A) — the insight-gp-import
capability layer, re-expressed Spark-native.

The reference's job: watch staging directories of CSV batches, load
each exactly once into Greenplum, tolerate malformed rows, evolve
schemas add-only, replace full-table snapshots. Mapping:

- tolerant CSV      → PERMISSIVE mode + columnNameOfCorruptRecord
- batch idempotence → left-anti join against a load manifest
- schema evolution  → unionByName(allowMissingColumns=True)
- snapshot replace  → latest-per-key window
- partitioned sink  → write.partitionBy (date partitioning analog)
- Greenplum load    → sources/jdbc.py (repartition + batched JDBC)

File-writing ops (csv/jsonl/sink) build their fixture in a temp dir on
each call — deterministic content, so declared rows-only but stable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table

CAT = "scans"


@op(
    "scan_parquet",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    category=CAT,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain parquet scan with schema projection — the base source.
    Column pruning reaches the reader (ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@op(
    "scan_events_ns",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events
    """,
    category=CAT,
)
def scan_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP(NANOS) parquet read — the §1.3 recipe end-to-end.
    Exact µs parity including the integer-div truncation fix."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )


CSV_GOOD_ROWS = 8
CSV_BAD_ROWS = 2


@op("scan_csv_tolerant", oracle=None, category=CAT)
def scan_csv_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV batch load with row-level error tolerance (the Greenplum
    SEGMENT REJECT LIMIT analog): malformed rows are quarantined into a
    corrupt-record column, good rows survive. Returns the good rows;
    the bad ones stay inspectable via ``_bad IS NOT NULL``."""
    tmp = tempfile.mkdtemp(prefix="igis-csv-")
    path = os.path.join(tmp, "batch.csv")
    lines = [f"{i},name_{i},{i * 10}" for i in range(CSV_GOOD_ROWS)]
    lines.insert(3, "not_an_int,oops,nope")  # type-malformed
    lines.insert(6, "5,missing_value")  # arity-malformed (short row)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.LongType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    # cache before filtering on _bad: Spark disallows plans whose only
    # referenced column is the internal corrupt-record column (a count()
    # over the filter would prune down to exactly that), and caching the
    # parsed batch is the documented workaround.
    raw = spark.read.csv(
        path, schema=schema, mode="PERMISSIVE", columnNameOfCorruptRecord="_bad"
    ).cache()
    return raw.filter(F.col("_bad").isNull()).select("id", "name", "amount")


@op("scan_jsonl", oracle=None, category=CAT)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingest with explicit schema (serverlogs analog).
    Schema is never inferred (inference is a correctness hazard);
    unparseable lines quarantine into _bad like the CSV path."""
    tmp = tempfile.mkdtemp(prefix="igis-jsonl-")
    path = os.path.join(tmp, "logs.jsonl")
    lines = [
        f'{{"req_id": {i}, "status": {200 + (i % 3) * 100}, "latency_ms": {i * 7 % 90}}}'
        for i in range(10)
    ]
    lines.insert(4, "{this is not json")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("req_id", T.LongType()),
            T.StructField("status", T.LongType()),
            T.StructField("latency_ms", T.LongType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    # cache: same corrupt-record-column pruning restriction as the CSV op
    raw = spark.read.json(
        path, schema=schema, mode="PERMISSIVE", columnNameOfCorruptRecord="_bad"
    ).cache()
    return raw.filter(F.col("_bad").isNull()).select("req_id", "status", "latency_ms")


@op("sink_parquet_partitioned", oracle=None, category=CAT)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned append sink: write events partitioned by day,
    read back, return per-partition counts. Partition pruning on the
    read-back is the 100 TB access path (a day-filter scans one dir);
    the read-back here proves round-trip fidelity."""
    out = tempfile.mkdtemp(prefix="igis-sink-")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_date")
        .agg(F.count("*").alias("cnt"), F.countDistinct("event_id").alias("n_ids"))
        .withColumn("event_date", F.col("event_date").cast("string"))
    )


MANIFEST_LOADED = [f"src{i}" for i in range(10)]


@op(
    "ingest_manifest_dedup",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE source NOT IN ({", ".join(f"'{s}'" for s in MANIFEST_LOADED)})
    """,
    category=CAT,
)
def ingest_manifest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-granular idempotence: load only batches absent from the
    manifest (left-anti join) — the reference's exactly-once file load.
    The manifest is tiny → broadcast anti-join, no shuffle of the
    incoming data."""
    docs = load_table(spark, sf_dir, "documents")
    manifest = spark.createDataFrame(
        [(s,) for s in MANIFEST_LOADED], T.StructType([T.StructField("source", T.StringType())])
    )
    return docs.join(F.broadcast(manifest), "source", "left_anti").select(
        "doc_id", "source"
    )


@op(
    "schema_evolution_union",
    oracle="""
    SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source, n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, source, n_chars
    FROM documents WHERE doc_id % 2 = 1
    """,
    category=CAT,
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-only schema evolution: old batches lack the new column and
    surface NULL for it (ALTER TABLE ADD COLUMN semantics).
    ``unionByName(allowMissingColumns=True)`` is the whole
    implementation — name-based, order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    new = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return old.unionByName(new, allowMissingColumns=True).select(
        "doc_id", "lang", "source", "n_chars"
    )


@op(
    "full_snapshot_latest",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS latest_date,
           o_totalprice AS latest_price
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
    category=CAT,
)
def full_snapshot_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table snapshot replace: latest snapshot per key wins — the
    reference's dimension-refresh semantic (users/sites/projects
    re-uploaded whole; newest upload is the table)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_date"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )
