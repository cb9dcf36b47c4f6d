"""Idempotent streaming parquet sink via foreachBatch.

``writeStream.format("parquet")`` is append-only: when a micro-batch is
replayed after a failure (the at-least-once window between sink write
and checkpoint commit), its rows land twice. Delta/Iceberg solve this
with transactional commits; on plain parquet the same guarantee falls
out of dynamic partition overwrite keyed by the deterministic
``batch_id`` Spark passes to ``foreachBatch``:

* every batch writes to partition ``_batch_id=N``;
* ``partitionOverwriteMode=dynamic`` + ``mode("overwrite")`` replaces
  ONLY the partitions present in the batch — a replay of batch N
  rewrites ``_batch_id=N`` in place instead of appending a second copy.

Readers ``spark.read.parquet(path)`` as usual and drop (or ignore) the
``_batch_id`` column; at 100 TB the per-batch partitioning also gives
retention jobs a trivial unit to expire.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_batch_idempotent(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """The foreachBatch body: dynamic-overwrite this batch's partition."""
    (
        batch_df.withColumn("_batch_id", F.lit(batch_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def start_idempotent_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query writing exactly-once to plain parquet."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, path)
        ).option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
