"""Round-4 verdict item 7: the capstone pipelines driven through the
STREAMING runtime end to end — directory-watching ingest via
foreachBatch with a persistent checkpoint, exactly-once proven under a
re-upload and under a crash-replay, and the corpus-assembly chain run
over the streamed-in bronze table reproducing the batch op exactly.

This is the reference's core loop (SURVEY.md §1.1 items 4-5): staged
files land, each loads exactly once, the analytic chain runs over the
accumulated table.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from insight_gp_import_spark.streaming import (
    idempotent_parquet_writer,
    run_ingest_loop,
)
from insight_gp_import_spark.tables import load_events, load_table

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _stage_shards(spark, df, col, n, out_dir):
    """Write df as n single-file parquet shards (shard i = col % n == i)
    into out_dir as shard_i.parquet; returns the shard paths."""
    tmp = tempfile.mkdtemp(prefix="igis-shardtmp-")
    paths = []
    for i in range(n):
        df.filter(F.col(col) % n == i).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/s{i}"
        )
        part = next(Path(f"{tmp}/s{i}").glob("part-*.parquet"))
        dst = Path(out_dir) / f"shard_{i}.parquet"
        shutil.copy2(part, dst)
        paths.append(dst)
    return paths


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return src, str(tmp_path / "ckpt"), str(tmp_path / "bronze")


def _events_stream(spark, src):
    from insight_gp_import_spark.streaming import read_events_stream

    return read_events_stream(spark, str(src), max_files=1)


def test_ingest_loop_exactly_once_under_reupload(spark, dirs):
    src, ckpt, bronze = dirs
    ev = load_events(spark, SF)
    shards = _stage_shards(spark, ev, "event_id", 3, src)
    # phase 1: two shards visible
    shards[2].unlink()
    run_ingest_loop(_events_stream(spark, src), ckpt, idempotent_parquet_writer(bronze))
    got1 = spark.read.parquet(bronze)
    n1 = got1.count()
    assert 0 < n1 < 1000 and got1.select("event_id").distinct().count() == n1

    # phase 2: shard_0 is RE-UPLOADED (same path lands again) and
    # shard_2 arrives late; the loop must pick up ONLY shard_2.
    _stage_shards(spark, ev, "event_id", 3, src)  # rewrites all three
    run_ingest_loop(_events_stream(spark, src), ckpt, idempotent_parquet_writer(bronze))
    got2 = spark.read.parquet(bronze)
    assert got2.count() == 1000
    assert got2.select("event_id").distinct().count() == 1000


def test_ingest_loop_crash_replay_is_idempotent(spark, dirs):
    """Crash AFTER the batch's data write but BEFORE the checkpoint
    commit: the restart replays the batch and the partition-overwrite
    writer clobbers the orphaned attempt instead of duplicating it."""
    src, ckpt, bronze = dirs
    ev = load_events(spark, SF)
    _stage_shards(spark, ev, "event_id", 2, src)

    chaos = idempotent_parquet_writer(bronze, fail_once_on={0})
    with pytest.raises(Exception, match="simulated crash|Query .* terminated"):
        run_ingest_loop(_events_stream(spark, src), ckpt, chaos)
    # the orphaned batch-0 data IS on disk (that's the hazard)
    assert spark.read.parquet(bronze).count() > 0

    run_ingest_loop(_events_stream(spark, src), ckpt, idempotent_parquet_writer(bronze))
    got = spark.read.parquet(bronze)
    assert got.count() == 1000
    assert got.select("event_id").distinct().count() == 1000


def test_corpus_assembly_over_streamed_bronze_matches_batch(spark, dirs):
    """pipeline_corpus_assembly re-expressed over the ingest loop: the
    docs land exactly-once via foreachBatch, then the SAME df-level
    assembly chain runs over the bronze table — and must reproduce the
    batch op's relation row for row."""
    src, ckpt, bronze = dirs
    docs = load_table(spark, SF, "documents")
    _stage_shards(spark, docs, "doc_id", 3, src)
    stream = spark.readStream.schema(DOCS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    run_ingest_loop(stream, ckpt, idempotent_parquet_writer(bronze))

    from insight_gp_import_spark.operators.corpus_ops import (
        assemble_corpus,
        pipeline_corpus_assembly,
    )

    streamed = assemble_corpus(
        spark.read.parquet(bronze).select("doc_id", "source", "text")
    )
    batch = pipeline_corpus_assembly(spark, SF)
    cols = batch.columns
    assert sorted(streamed.columns) == sorted(cols)
    got = {tuple(r) for r in streamed.select(*cols).collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0
