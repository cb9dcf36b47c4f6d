"""Stream-stream interval join: view→purchase conversion attribution.

The one streaming shape the engine lacked: joining two streams on a key
plus an event-time interval, the standard attribution/funnel pattern.
Unlike the stream-static enrichment (enrich.py — stateless), BOTH sides
buffer state; the watermark plus the interval bound is what lets Spark
evict it: a buffered view can only ever match purchases within
``max_lag``, so once the purchase-side watermark passes ``view.ts +
max_lag`` the row is dropped from the state store. Without the time
bound the state would grow forever — that is the 100 TB design
constraint this module encodes.

Timestamps compare as integer microseconds (``unix_micros``) so the
batch twin's DuckDB oracle (ns-precision timestamps truncated with
``epoch_ns(ts)//1000``) is bit-identical — no float time arithmetic.

Works identically on batch DataFrames (the oracled query
``view_purchase_conversions``) and on streaming ones
(tests/test_streaming_join.py asserts stream == batch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HOUR_US = 3_600_000_000


def conversion_pairs(
    events: DataFrame,
    max_lag_us: int = HOUR_US,
    watermark: str | None = None,
) -> DataFrame:
    """(view, purchase) pairs per user with 0 < lag ≤ ``max_lag_us``.

    ``events`` may be a batch or streaming frame with (event_id, ts,
    user_id, event_type). Pass ``watermark`` (e.g. ``"2 hours"``) for
    streaming input — required for state eviction and append output.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    lag = F.unix_micros("p_ts") - F.unix_micros("v_ts")
    # Equality on user + event-time interval, written as raw timestamp
    # arithmetic — the condition shape Spark's streaming joiner analyzes
    # to derive state-eviction bounds. (An equivalent unix_micros()
    # integer comparison would compute the same pairs but hide the range
    # from the analyzer, leaving state unbounded.) Both sides are
    # µs-precision timestamps, so this is bit-identical to the oracle's
    # integer-µs arithmetic.
    pairs = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {max_lag_us} MICROSECOND")
        ),
        "inner",
    )
    return pairs.select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        lag.alias("lag_us"),
    )


def conversion_stats(pairs: DataFrame) -> DataFrame:
    """Per-user conversion rollup over the pair stream (batch form)."""
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
    )
