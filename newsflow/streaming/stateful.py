"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.11 beyond-reference surface).

`running_user_totals` maintains per-user running (event count, value
total) across micro-batches — the canonical arbitrary-state shape that
windowed aggregation can't express (state lives across ALL time, not a
window; emission happens every batch, not at watermark close).

Correctness contract (tested in tests/test_streaming_stateful.py): after
a full replay, the LAST emitted row per user equals the batch
`groupBy(user).agg(count, sum)` over the same events — the batch twin is
the oracle, per the streaming test strategy in streaming/windows.py.

Scale notes: state is (2 numbers + key) per user — the state store scales
with |users|, not event volume. The shuffle is on user_id (same key the
batch agg shuffles on). For unbounded key spaces add a state TTL via
GroupStateTimeout.ProcessingTimeTimeout and drop idle users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals, one emission per user per micro-batch.
    Works only on streaming frames (batch twin: groupBy + count/sum)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
