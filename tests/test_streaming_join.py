"""Stream-stream interval join: the watermarked streaming execution must
emit exactly the batch join's pairs (append mode, bounded state)."""

from __future__ import annotations

from newsflow.streaming import windows as W
from newsflow.streaming.join import conversion_pairs
from tests.conftest import SF_SMOKE


def test_stream_stream_join_equals_batch(spark, tmp_path):
    batch = W.load_batch_events(spark, SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "events")
    # One file per time slice, written in time order → micro-batches see
    # non-decreasing event time (matches must still form across
    # micro-batch boundaries through state). A random row→file split
    # would advance the watermark past most rows after the first batch
    # and drop the rest as late — the realistic failure mode this
    # arrangement documents.
    import pyspark.sql.functions as F

    week = F.weekofyear("ts")
    for wk in sorted(
        r[0] for r in batch.select(week.alias("w")).distinct().collect()
    ):
        batch.filter(week == wk).coalesce(1).write.mode("append").parquet(src)

    stream = W.read_events_stream(
        spark, src, schema=batch.schema, max_files_per_trigger=1
    )
    q = (
        conversion_pairs(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_conversions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.table("t_conversions").collect())
    want = sorted(tuple(r) for r in conversion_pairs(batch).collect())
    assert got == want
    assert len(got) > 0
