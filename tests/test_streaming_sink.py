"""Idempotent foreachBatch sink: a replayed micro-batch must not
duplicate rows in the parquet output."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.streaming import windows as W
from newsflow.streaming.sink import (
    start_idempotent_parquet_sink,
    write_batch_idempotent,
)
from tests.conftest import SF_SMOKE


def test_stream_lands_exactly_once(spark, tmp_path):
    batch = (
        W.load_batch_events(spark, SF_SMOKE)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .filter(F.col("event_id") < 600)
    )
    src = str(tmp_path / "src")
    batch.coalesce(2).write.parquet(src)

    out = str(tmp_path / "out")
    q = start_idempotent_parquet_sink(
        W.read_events_stream(spark, src, schema=batch.schema),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = spark.read.parquet(out).drop("_batch_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # Simulate the at-least-once failure window: the same micro-batch id
    # re-runs after its write but before the checkpoint commit. The
    # dynamic partition overwrite must replace, not append.
    replay = spark.read.parquet(src)
    write_batch_idempotent(replay, 0, out)
    write_batch_idempotent(replay, 0, out)
    again = spark.read.parquet(out).drop("_batch_id")
    assert again.count() == batch.count()
