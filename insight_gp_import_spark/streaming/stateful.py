"""Custom stateful streaming operator via ``applyInPandasWithState``.

This is the extension point for stateful logic Spark's built-in
windows/dedup can't express: per-key state lives in the state store
(RocksDB-backed per partition at scale), Arrow batches stream through
Python grouped by key, and the operator decides what to emit and when.

``running_user_totals`` is the canonical shape: cumulative per-user
count/sum maintained across micro-batches, emitting the updated totals
for every key seen in the batch (update semantics). A fraud-score
accumulator, per-session feature builder, or CUSUM detector is the same
skeleton with different state."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, cnt bigint, total_value double"
STATE_SCHEMA = "cnt bigint, total_value double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, total = state.get
    else:
        cnt, total = 0, 0.0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "cnt": [cnt], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative (count, sum(value)) per user_id, updated every
    micro-batch. Works on a streaming DataFrame (state-store-backed)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
