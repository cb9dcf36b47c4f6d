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


# Integer-cents twin: state is (count, cents) — both integers, so the
# accumulated total is independent of row order WITHIN and ACROSS
# micro-batches (float accumulation order would drift bits and break the
# value-hash contract of the oracled query `running_user_totals_stream`).

CENTS_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)

CENTS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _update_user_cents(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_cents": [cents],
        }
    )


def running_user_cents(events: DataFrame) -> DataFrame:
    """Per-user running (count, integer-cents total) over a stream with a
    ``cents`` long column. Same state shape as ``running_user_totals``
    but hash-deterministic — the form the driver-checked streaming query
    executes."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas form of the same operator.
#
# applyInPandasWithState (above) is the Spark 3.x arbitrary-state API; the
# StatefulProcessor API is its Spark 4 successor and the one new pipelines
# should target: typed named state slots (value/list/map) instead of one
# tuple, built-in per-state TTL (the idle-key eviction the old API left to
# hand-rolled timeouts), event-time timers, and a RocksDB-backed state
# store. Both forms are kept: same semantics, verified against the same
# batch twin in tests/test_streaming_stateful.py.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard for older PySpark
    from pyspark.sql.streaming import StatefulProcessor

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually execute.

    Requires PySpark >= 4.0 AND the ``protobuf`` package — the TWS
    Python worker speaks a protobuf protocol to the JVM state server and
    crashes at stream start without it. The plan still BUILDS without
    protobuf (failure is at runtime), so callers should check this
    before starting the query.
    """
    if not _HAS_TWS:
        return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    except ImportError:
        return False
    return True


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, total) with optional state TTL.

    State: one ValueState slot holding (n_events, total_value). With
    ``ttl_ms`` set, a user idle longer than the TTL is evicted from the
    store and restarts from zero on its next event — bounded state for
    unbounded key spaces, declared instead of hand-implemented.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        prior = self._totals.get()
        n, total = prior if prior is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """transformWithStateInPandas twin of `running_user_totals`.

    Requires the RocksDB state store (set by the caller's session conf:
    ``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``); emits one row per user per
    micro-batch in update mode, exactly like the Spark 3 form.
    """
    if not _HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires PySpark >= 4.0"
        )
    # Spark 4 rejects state TTL under timeMode="none" — TTL needs a clock.
    # Switch to processing time exactly when a TTL is requested.
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none" if ttl_ms is None else "processingTime",
    )
