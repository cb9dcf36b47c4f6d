"""Stream-EXECUTED query variants: the same window aggregations the
batch twins in ``streaming/queries.py`` declare, actually run through
``readStream`` → Structured Streaming → a sink, then compared against
the identical DuckDB oracle. Registered in a late module (see
registry.py ordering note) so they queue behind the current driver
check window.

Together with ``running_user_totals_stream`` (applyInPandasWithState)
this gives the streaming surface hard end-to-end signals for BOTH the
built-in windowed-aggregation path and the arbitrary-state path.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from newsflow.registry import register
from newsflow.streaming import windows as W
from newsflow.streaming.queries import (
    SESSION_ORACLE,
    SLIDING_ORACLE,
    TUMBLING_ORACLE,
)
from newsflow.tables import load_table


@register(
    "tumbling_window_counts_stream",
    oracle=TUMBLING_ORACLE,
    tags=("streaming", "window", "executed"),
)
def tumbling_window_counts_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-hour tumbling windows × event_type EXECUTED as a stream:
    events replayed via readStream (pathGlobFilter over the sf dir),
    aggregated by Structured Streaming in complete output mode, drained
    with an availableNow trigger into a memory sink. The final sink
    table equals the batch aggregate, so the batch oracle applies
    verbatim. Complete mode is safe here because the key space (hours ×
    event types) is horizon-bounded, not row-bounded."""
    schema = load_table(spark, sf_dir, "events").schema
    stream = W.read_events_stream(
        spark, sf_dir, schema=schema, path_glob_filter="events.parquet"
    )
    sink = f"twc_stream_{uuid.uuid4().hex[:8]}"
    q = (
        W.tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "session_window_stats_stream",
    oracle=SESSION_ORACLE,
    tags=("streaming", "session", "executed"),
)
def session_window_stats_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gap-based sessionization (30-min gap, per user) EXECUTED as a
    stream — the MERGING-window stateful operator, where a late-arriving
    event can fuse two open sessions; a strictly harder state shape than
    the fixed tumbling windows above. Replayed via readStream, complete
    output mode, availableNow trigger, memory sink; the final table
    equals the batch sessionization, so the gaps-and-islands oracle
    applies verbatim. Complete mode is the bounded-replay form; a
    production stream would run append mode with a watermark and let
    closed sessions emit incrementally (state evicted at watermark)."""
    schema = load_table(spark, sf_dir, "events").schema
    stream = W.read_events_stream(
        spark, sf_dir, schema=schema, path_glob_filter="events.parquet"
    )
    sink = f"sess_stream_{uuid.uuid4().hex[:8]}"
    q = (
        W.session_stats(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "sliding_window_counts_stream",
    oracle=SLIDING_ORACLE,
    tags=("streaming", "window", "executed"),
)
def sliding_window_counts_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-hour windows sliding every 30 minutes EXECUTED as a stream —
    the overlapping-assignment window operator (each event updates two
    window states). Same replay harness as the tumbling/session
    variants: readStream, complete mode, availableNow, memory sink; the
    drained table equals the batch twin so SLIDING_ORACLE applies
    verbatim. With tumbling + sliding + session + applyInPandasWithState
    + the stream-stream interval join, every Structured Streaming state
    shape the engine ships is execution-verified, not just batch-twinned."""
    schema = load_table(spark, sf_dir, "events").schema
    stream = W.read_events_stream(
        spark, sf_dir, schema=schema, path_glob_filter="events.parquet"
    )
    sink = f"swc_stream_{uuid.uuid4().hex[:8]}"
    q = (
        W.sliding_counts(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "exact_dedup_stream",
    oracle="SELECT DISTINCT md5(text) AS text_hash FROM documents",
    tags=("streaming", "dedup", "executed"),
)
def exact_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup EXECUTED as a stream: documents replayed via
    readStream, reduced to md5 keys row-locally, deduplicated with the
    streaming ``dropDuplicates`` state store, appended to a memory sink.
    The drained sink holds exactly the distinct hash set, so the batch
    DISTINCT oracle applies verbatim. Only the 16-byte hash enters
    state — the streaming twin of ``dedup_exact_keep_min``'s scale
    argument. Bounded replay keeps unlimited state safe here; the
    production form is ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` so keys age out (documented,
    same operator surface)."""
    import pyspark.sql.functions as F

    schema = load_table(spark, sf_dir, "documents").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    hashes = stream.select(F.md5("text").alias("text_hash")).dropDuplicates(
        ["text_hash"]
    )
    sink = f"dedup_stream_{uuid.uuid4().hex[:8]}"
    q = (
        hashes.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "user_event_keys_stream_watermarked",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup", "executed", "watermark"),
)
def user_event_keys_stream_watermarked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-AGED streaming dedup EXECUTED: readStream →
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` on (user_id,
    event_type) → append memory sink — the production form of streaming
    dedup, where key state is evicted once the watermark passes instead
    of growing forever (the state shape `exact_dedup_stream`'s plain
    dropDuplicates documents as unbounded).

    Only the KEY columns are emitted, which makes the operator
    deterministic under bounded replay (which concrete first row wins is
    engine-internal, the surviving key set is not): the availableNow
    drain sees every event before the watermark advances past it, so the
    sink equals the batch DISTINCT key set and the oracle is exact."""
    from newsflow.streaming.dedup import dedup_events_within_watermark
    from newsflow.streaming.windows import read_events_stream

    schema = load_table(spark, sf_dir, "events").schema
    stream = read_events_stream(
        spark, sf_dir, schema=schema, path_glob_filter="events.parquet"
    )
    keys = dedup_events_within_watermark(
        stream, ["user_id", "event_type"], watermark="2 hours"
    ).select("user_id", "event_type")
    sink = f"wmdedup_stream_{uuid.uuid4().hex[:8]}"
    q = (
        keys.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
