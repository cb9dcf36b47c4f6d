"""Streaming dedup: dropDuplicatesWithinWatermark must reproduce batch
dropDuplicates when duplicates arrive inside the watermark delay."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.streaming import windows as W
from newsflow.streaming.dedup import dedup_events_within_watermark
from tests.conftest import SF_SMOKE


def test_within_watermark_dedup_equals_batch(spark, tmp_path):
    base = (
        W.load_batch_events(spark, SF_SMOKE)
        .select("event_id", "ts", "user_id", "event_type")
        .filter(F.col("event_id") < 500)
    )
    # Inject duplicates: every row appears twice with the same key/time —
    # the retry/replay shape streaming dedup exists for.
    batch = base.union(base)
    src = str(tmp_path / "events")
    week = F.weekofyear("ts")
    for wk in sorted(
        r[0] for r in batch.select(week.alias("w")).distinct().collect()
    ):
        batch.filter(week == wk).coalesce(1).write.mode("append").parquet(src)

    stream = W.read_events_stream(
        spark, src, schema=batch.schema, max_files_per_trigger=1
    )
    q = (
        dedup_events_within_watermark(stream, ["event_id"], "2 hours")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.table("t_dedup").collect())
    want = sorted(tuple(r) for r in base.collect())
    assert got == want and len(got) == base.count()
