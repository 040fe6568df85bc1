"""RocksDB-vs-HDFS state-store stress (round-4 item #3, carried to r6).

Streams the events table through the three stateful queries that
carry real state at scale — session windows (stream_session's shape),
keyed dedup within a watermark (stream_dedup_within_watermark's
shape), and the watermarked stream-stream interval join
(stream_stream_join's shape, added r8: its state-expiry claim now has
a measured row) — under BOTH state-store providers, and records
per-provider:

- wall time for the identical availableNow run,
- peak stateOperators.memoryUsedBytes (the provider's own accounting:
  JVM-heap bytes for the default HDFS provider, block-cache+memtable
  bytes for RocksDB),
- peak stateOperators.numRowsTotal (state volume driven through),
- on-disk checkpoint state size,
- driver JVM heap delta across the run.

Events are written time-ordered into N chunk files and streamed one
file per trigger with a 1-hour watermark, so sessions/dedup keys are
evicted as the watermark advances — the realistic bounded-state
configuration; the numbers show WHERE the bounded state lives (heap
vs off-heap disk).

Usage: python tools/rocksdb_stress.py [sf_dir] [n_chunks]
Appends nothing; prints one JSON line per (query, provider) plus a
summary — paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from insight_gp_import_spark.session import get_session  # noqa: E402
from insight_gp_import_spark.streaming.runtime import (  # noqa: E402
    read_events_stream,
    rocksdb_state_store,
)

# module-level so tests can override; main() re-reads argv (importing
# this module under pytest must not parse pytest's own flags)
SF_DIR = "/tmp/igis_sf1"
N_CHUNKS = 8


def dir_size(p: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fns in os.walk(p)
        for f in fns
        if os.path.exists(os.path.join(dp, f))
    )


def heap_used(spark) -> int:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return int(rt.totalMemory() - rt.freeMemory())


def chunked_events_dir(spark) -> str:
    """Write events time-ordered into N_CHUNKS parquet files so the
    file-source stream replays them roughly in event-time order and the
    watermark actually advances between micro-batches."""
    out = tempfile.mkdtemp(prefix="igis-stress-events-")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts")))
        .repartitionByRange(N_CHUNKS, "chunk")
        .sortWithinPartitions("ts")
        .drop("chunk")
        .write.mode("overwrite")
        .parquet(out + "/staged")
    )
    # one file per chunk, named in time order for deterministic pickup
    files = sorted(
        f for f in os.listdir(out + "/staged") if f.endswith(".parquet")
    )
    os.makedirs(out + "/stream")
    for i, f in enumerate(files):
        shutil.copy(
            os.path.join(out, "staged", f),
            os.path.join(out, "stream", f"chunk_{i:03d}.parquet"),
        )
    return out + "/stream"


def build_query(src, which: str):
    if which == "session":
        return (
            src.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "10 minutes"), "user_id")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
            .select("user_id", "cnt", "sum_value")
        )
    if which == "interval_join":
        # stream_stream_join's exact shape (r8 verdict item 6): both
        # sides watermarked, time-range condition lets Spark expire a
        # view row once the watermark passes v_ts + 1h — the claim
        # "state bounded exactly like stream_stream_join" gets its
        # measured sf1 row here.
        v = (
            src.filter(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        p = (
            src.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        return v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("user_id", "view_id", "purchase_id")
    return src.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_one(spark, events_dir: str, which: str, provider: str) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"igis-stress-{which}-{provider}-")
    src = read_events_stream(spark, events_dir, max_files=1)
    out = build_query(src, which)
    heap0 = heap_used(spark)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(900)
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    if not finished:
        raise TimeoutError(f"{which}/{provider} did not drain in 900s")
    wall = time.time() - t0
    mem_peak = rows_peak = 0
    for p in progresses:
        for so in p.get("stateOperators", []):
            mem_peak = max(mem_peak, so.get("memoryUsedBytes", 0))
            rows_peak = max(rows_peak, so.get("numRowsTotal", 0))
    rec = {
        "query": which,
        "provider": provider,
        "wall_sec": round(wall, 1),
        "state_mem_peak_mb": round(mem_peak / 2**20, 1),
        "state_rows_peak": rows_peak,
        "ckpt_state_disk_mb": round(
            dir_size(os.path.join(ckpt, "state")) / 2**20, 1
        ),
        "driver_heap_delta_mb": round((heap_used(spark) - heap0) / 2**20, 1),
        "batches": sum(1 for p in progresses if p.get("batchId") is not None),
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return rec


def main() -> int:
    global SF_DIR, N_CHUNKS
    if len(sys.argv) > 1:
        SF_DIR = sys.argv[1]
    if len(sys.argv) > 2:
        N_CHUNKS = int(sys.argv[2])
    spark = get_session(app_name="igis-rocksdb-stress", shuffle_partitions=32)
    events_dir = chunked_events_dir(spark)
    results = []
    try:
        for which in ("session", "dedup", "interval_join"):
            for provider in ("hdfs-default", "rocksdb"):
                if provider == "rocksdb":
                    with rocksdb_state_store(spark):
                        rec = run_one(spark, events_dir, which, provider)
                else:
                    rec = run_one(spark, events_dir, which, provider)
                print(json.dumps(rec), flush=True)
                results.append(rec)
    finally:
        shutil.rmtree(os.path.dirname(events_dir), ignore_errors=True)
    by = {(r["query"], r["provider"]): r for r in results}
    for which in ("session", "dedup", "interval_join"):
        h, r = by[(which, "hdfs-default")], by[(which, "rocksdb")]
        print(
            f"SUMMARY {which}: state mem {h['state_mem_peak_mb']}MB (heap) -> "
            f"{r['state_mem_peak_mb']}MB (rocksdb, off-heap-backed); "
            f"wall {h['wall_sec']}s -> {r['wall_sec']}s; "
            f"peak state rows {h['state_rows_peak']} vs {r['state_rows_peak']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
