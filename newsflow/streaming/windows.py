"""Structured Streaming surface over the events table (SURVEY.md §7
phase 5 — beyond-reference; the reference is batch-only, §2.11).

Design: every streaming aggregation here has a batch twin in
``streaming/queries.py`` computed by the SAME window expressions — the
batch result over identical input is the correctness oracle for the
stream (no SQL oracle can replay a watermark). tests/test_streaming.py
replays events as ordered micro-batches (one file per trigger) to
exercise watermark advancement and late-data drop deterministically.

Scale notes: stateful window aggregation shuffles on (window, key); state
store size is bounded by watermark horizon × key cardinality. At 100 TB
equivalents, widen ``spark.sql.shuffle.partitions`` for the stateful
stage and keep the watermark as tight as the latency SLA allows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from newsflow.tables import load_table


def events_schema(spark: SparkSession, sf_dir: str):
    """Schema for streaming reads (parquet streaming requires an explicit
    schema). ts arrives as raw nanosecond longs (nanosAsLong)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """readStream over parquet event files with the ns→µs normalization.

    ``path`` must be a directory (streaming file source constraint);
    ``path_glob_filter`` selects files within it — the way to stream one
    table's file out of a directory that holds several.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    df = reader.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Same µs instants under the pinned UTC session zone (mirrors
        # tables.load_table's batch-side normalization).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event_type (works on batch AND stream)."""
    return (
        events.groupBy(F.window("ts", size), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            (F.col("sum_value") + F.lit(0.0)).alias("sum_value"),
        )
    )


def sliding_counts(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts (each event lands in size/slide windows)."""
    return (
        events.groupBy(F.window("ts", size, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based). On a stream this is the
    stateful session-window operator; in batch the same expression is
    computed with a sort-based aggregation."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> StreamingQuery:
    """Materialize a streaming aggregation into an in-memory table with
    Trigger.AvailableNow (process everything available, then stop)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def load_batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
