"""Registered batch-equivalent window queries (events table).

These run the SAME window expressions as the streaming module on the
static events table, with DuckDB oracles computed from raw nanosecond
epochs (timezone-free)."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.registry import register
from newsflow.streaming import windows as W
from newsflow.tables import load_table

_HOUR_NS = 3_600_000_000_000
_HALF_NS = 1_800_000_000_000

# Shared by the batch twin AND the stream-executed variant
# (exec_queries.py) — identical result contract, one oracle.
TUMBLING_ORACLE = f"""
    SELECT strftime(make_timestamp(
             CAST(epoch_ns(ts) // {_HOUR_NS} AS BIGINT) * 3600000000),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           (cast(sum(cast(value AS DECIMAL(25,4))) as double) + 0.0)
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """


@register(
    "tumbling_window_counts",
    oracle=TUMBLING_ORACLE,
    tags=("streaming", "window"),
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type (batch twin of the streaming
    aggregation; epoch-aligned in both engines)."""
    return W.tumbling_counts(load_table(spark, sf_dir, "events"))


SLIDING_ORACLE = f"""
    SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           count(*) AS n_events
    FROM (
      SELECT unnest([
        CAST(epoch_ns(ts) // {_HALF_NS} AS BIGINT) * 1800000000,
        (CAST(epoch_ns(ts) // {_HALF_NS} AS BIGINT) - 1) * 1800000000
      ]) AS ws_us
      FROM events
    )
    GROUP BY 1
    """


@register(
    "sliding_window_counts",
    oracle=SLIDING_ORACLE,
    tags=("streaming", "window"),
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event contributes to
    two windows (oracle materializes both window starts per event)."""
    return W.sliding_counts(load_table(spark, sf_dir, "events"))


SESSION_ORACLE = """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM seq
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, session_id
    """


@register(
    "session_window_stats",
    oracle=SESSION_ORACLE,
    tags=("streaming", "session"),
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) per user. The
    oracle is the classic gaps-and-islands SQL; Spark's session_window
    end = last event + gap, mirrored in the oracle."""
    return W.session_stats(load_table(spark, sf_dir, "events"))


@register(
    "running_user_totals_stream",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def running_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator EXECUTED as a stream — not a
    batch twin. Replays the events table through ``readStream`` →
    ``applyInPandasWithState`` (per-user running count + integer-cents
    total) → memory sink with an availableNow trigger, then reduces each
    user's emissions to the final state row. Integer state makes the
    totals independent of row order within/between micro-batches, so the
    result is value-hash-equal to the batch GROUP BY oracle.

    This is the driver-visible hard signal for the arbitrary-state
    streaming surface (VERDICT r1 §7); multi-batch state carry-over is
    additionally covered in tests/test_streaming_stateful.py.
    """
    from newsflow.streaming.ingest import sized_shuffle
    from newsflow.streaming.stateful import running_user_cents

    events = load_table(spark, sf_dir, "events")
    stream = W.read_events_stream(
        spark, sf_dir, schema=events.schema,
        path_glob_filter="events.parquet",
    ).select(
        "user_id", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    sink = f"rut_stream_{uuid.uuid4().hex[:8]}"
    # State partitions sized to the replay volume (shared `sized_shuffle`
    # rule, clamped to the session value — guide §2.2); results are
    # partitioning-independent.
    with sized_shuffle(spark, events.count()):
        q = (
            running_user_cents(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # One emission per (user, micro-batch); the final state row is the
    # one with the largest n_events.
    return spark.table(sink).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_cents", "n_events").alias("total_cents"),
    )


@register(
    "view_purchase_conversions",
    oracle="""
    SELECT user_id,
           count(*) AS n_conversions,
           min(lag_us) AS min_lag_us,
           max(lag_us) AS max_lag_us
    FROM (
      SELECT v.user_id,
             (epoch_ns(p.ts)//1000 - epoch_ns(v.ts)//1000) AS lag_us
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
       AND epoch_ns(p.ts)//1000 > epoch_ns(v.ts)//1000
       AND epoch_ns(p.ts)//1000 <= epoch_ns(v.ts)//1000 + 3600000000
    )
    GROUP BY user_id
    """,
    tags=("streaming", "join"),
)
def view_purchase_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (streaming/join.py):
    view→purchase pairs within 1 hour per user, rolled up per user. The
    oracle truncates ns→µs with integer arithmetic, matching Spark's µs
    timestamps exactly. The streaming execution of the identical pair
    join (watermarked both sides, bounded state) is asserted equal in
    tests/test_streaming_join.py."""
    from newsflow.streaming.join import conversion_pairs, conversion_stats

    return conversion_stats(
        conversion_pairs(load_table(spark, sf_dir, "events"))
    )
