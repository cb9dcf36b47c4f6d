"""Structured Streaming equivalence + watermark semantics tests.

Strategy (SURVEY.md §5: no SQL oracle can replay a watermark): the batch
result of the same window expression over the same rows is the oracle.
Late-data handling is exercised by replaying events as ordered micro-batch
files (maxFilesPerTrigger=1) so the watermark actually advances between
triggers."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.streaming import windows as W
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_batch(spark):
    return W.load_batch_events(spark, SF_SMOKE).cache()


@pytest.fixture(scope="module")
def events_dir(spark, events_batch, tmp_path_factory):
    """Parquet streaming sources must be directories — stage the events
    table into one (µs timestamps, so no nanosAsLong dance on the stream)."""
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_batch.coalesce(2).write.parquet(d)
    return d


def _collect_sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark, events_batch, events_dir):
    stream = W.read_events_stream(
        spark, events_dir, schema=events_batch.schema
    )
    q = W.run_stream_to_memory(
        W.tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    q.awaitTermination()
    got = _collect_sorted(
        spark.table("t_tumbling"),
        ["window_start", "event_type", "n_events", "sum_value"],
    )
    want = _collect_sorted(
        W.tumbling_counts(events_batch),
        ["window_start", "event_type", "n_events", "sum_value"],
    )
    assert got == want


def test_stream_sliding_equals_batch(spark, events_batch, events_dir):
    stream = W.read_events_stream(
        spark, events_dir, schema=events_batch.schema
    )
    q = W.run_stream_to_memory(
        W.sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    q.awaitTermination()
    got = _collect_sorted(spark.table("t_sliding"), ["window_start", "n_events"])
    want = _collect_sorted(
        W.sliding_counts(events_batch), ["window_start", "n_events"]
    )
    assert got == want


@pytest.fixture()
def staged_files(spark, events_batch, tmp_path):
    """Split events into time-ordered files + a late row + a sentinel.

    file-00: hours < 240 of the month; file-01: the rest; file-02: one
    LATE event (ts back at the start, arriving after the watermark has
    passed it); file-03: a far-future sentinel that pushes the watermark
    past everything so append-mode windows finalize.
    """
    t0 = events_batch.agg(F.min("ts")).first()[0]
    split = "2024-01-11 00:00:00"
    base = str(tmp_path / "staged")
    early = events_batch.filter(F.col("ts") < split)
    late_src = events_batch.filter(F.col("ts") >= split)

    early.coalesce(1).write.parquet(base + "/batch=00")
    late_src.coalesce(1).write.parquet(base + "/batch=01")
    # the late arrival: one synthetic event at t0 (watermark long past);
    # reserved user_id 9999 keeps synthetic rows separable from real ones.
    late_row = spark.createDataFrame(
        [(999_999, t0, 9999, "late", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    late_row.coalesce(1).write.parquet(base + "/batch=02")
    # TWO sentinel files: the first advances the watermark past all real
    # sessions; the watermark only takes effect at the NEXT micro-batch,
    # so a second sentinel batch must run — and it must carry actual rows
    # into the stateful operator, since state eviction only runs for
    # batches with input.
    for i, day in enumerate(["2024-06-01", "2024-06-02"]):
        sentinel = spark.createDataFrame(
            [(999_998 - i, f"{day} 00:00:00", 9999, "sentinel", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sentinel.coalesce(1).write.parquet(base + f"/batch=0{3 + i}")
    return base


def test_watermark_drops_late_event(spark, events_batch, staged_files):
    """Append-mode + watermark: the late event must NOT appear in its
    (long-finalized) window, and finalized windows must match batch."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_files)
        .withWatermark("ts", "2 hours")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_watermark")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.table("t_watermark").collect()
    }
    # batch truth over the original events only (no late row, no sentinel)
    want = {
        r["window_start"]: r["n_events"]
        for r in (
            events_batch.groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n_events",
            )
        ).collect()
    }
    first_window = min(want)
    # The late event fell into the first window; watermark had passed →
    # dropped, so the finalized count equals the batch count (without the
    # late row, which would have made it +1).
    assert got[first_window] == want[first_window]
    # All original windows finalized and match batch exactly.
    for wstart, n in want.items():
        assert got.get(wstart) == n, f"window {wstart}: {got.get(wstart)} != {n}"


def test_stream_session_append_equals_batch(spark, events_batch, staged_files):
    """Sessionization on a stream (append + watermark): sessions for the
    original users must equal the batch sessionization."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_files)
        # The sentinel rows flow INTO the session aggregation: the first
        # advances the watermark; the second gives the following batch
        # non-empty input so the state store evicts (emits) every real
        # session. Their own sessions live under user_id 9999.
        .withWatermark("ts", "2 hours")
    )
    q = W.run_stream_to_memory(
        W.session_stats(stream), "t_sessions", output_mode="append"
    )
    q.awaitTermination()
    got = _collect_sorted(
        spark.table("t_sessions").filter(F.col("user_id") != 9999),
        ["user_id", "session_start", "session_end", "n_events"],
    )
    want = _collect_sorted(
        W.session_stats(events_batch),
        ["user_id", "session_start", "session_end", "n_events"],
    )
    assert got == want
