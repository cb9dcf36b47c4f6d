"""Exactly-once streaming ingestion into a plain-parquet corpus:
``foreachBatch`` + the partition-pruned idempotent MERGE
(`newsflow.ops.merge.merge_upsert`).

The composition is the standard exactly-once recipe for sinks without
native transactions:

- Structured Streaming guarantees AT-LEAST-ONCE delivery of each
  micro-batch to ``foreachBatch`` (a batch can be re-run after a
  failure, with the SAME batch_id and the same data — the source offsets
  are checkpointed before the sink runs);
- ``merge_upsert`` is IDEMPOTENT: the post-state is a pure function of
  (target, batch) — an upsert replaces the key's row, a replayed delete
  deletes nothing new, untouched partitions are never read;
- at-least-once delivery x idempotent apply = exactly-once RESULT, the
  same argument Delta's ``txnVersion``/foreachBatch dedup formalizes.

Scale notes: each micro-batch rewrites only the hive partitions its
rows touch (incremental batches touch the current day, not the lake);
the checkpoint directory carries source progress, so a restarted query
resumes at the first unprocessed file. ``check_key_moves`` stays ON —
a malformed batch aborts the micro-batch (and the query) BEFORE
anything is written, which is the fail-loud contract an unattended
ingestion job needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from newsflow.ops.merge import merge_upsert


def stream_merge_to_corpus(
    spark: SparkSession,
    stream: DataFrame,
    target_path: str,
    key: str,
    partition_col: str,
    checkpoint_dir: str,
    check_key_moves: bool = True,
) -> StreamingQuery:
    """Drain ``stream`` into the parquet corpus at ``target_path`` with
    one idempotent MERGE per micro-batch (availableNow trigger — process
    everything currently available, then stop; rerun later to pick up
    new files from the same checkpoint)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch.isEmpty():
            return
        merge_upsert(
            spark,
            target_path,
            batch,
            key=key,
            partition_col=partition_col,
            check_key_moves=check_key_moves,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
