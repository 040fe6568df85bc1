"""Structured Streaming runtime (SURVEY.md §2.H).

The reference's ingest loop — watch a staging directory, load each new
file exactly once, move on — maps 1:1 onto Spark's file-source
streaming: ``readStream`` over a directory + checkpointed progress
gives exactly-once file granularity without the archive/retry
choreography the reference needed.

Everything here reuses the SAME DataFrame transformations as the batch
operators; only the source/sink differ. That is the point of Structured
Streaming, and it is why the batch DuckDB oracle is a valid check of
the streaming transformations.
"""

from insight_gp_import_spark.streaming.runtime import (  # noqa: F401
    idempotent_parquet_writer,
    read_events_stream,
    run_ingest_loop,
    run_to_memory,
    upsert_merge,
)
from insight_gp_import_spark.streaming.stateful import (  # noqa: F401
    running_user_totals,
    running_user_totals_tws,
)
