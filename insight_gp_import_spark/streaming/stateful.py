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


from pyspark.sql.streaming.stateful_processor import StatefulProcessor

# transformWithState's state-server wire protocol is protobuf-based;
# without the package the driver-side schema worker crashes at import.
try:  # pragma: no cover - environment probe
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithState processor: same cumulative per-user totals as
    ``_update_totals``, on the NEW typed-state API (one named
    ValueState here; the handle also offers List/Map state and timers
    — the surface applyInPandasWithState lacks)."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            DoubleType, LongType, StructField, StructType,
        )

        self._state = handle.getValueState(
            "totals",
            StructType([
                StructField("cnt", LongType()),
                StructField("total_value", DoubleType()),
            ]),
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        prior = self._state.get()
        cnt, total = (prior[0], prior[1]) if prior is not None else (0, 0.0)
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "cnt": [cnt], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on transformWithStateInPandas (Spark 4's
    arbitrary-state API, SPARK-49121): typed named state slots in the
    state store, timer support, and the same update semantics."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        OUTPUT_SCHEMA,
        "Update",
        "None",
    )
