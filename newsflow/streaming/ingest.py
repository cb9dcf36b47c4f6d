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


def neardup_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> None:
    """One micro-batch of the streaming near-dup ingest, module-level so
    the at-least-once replay path (sink ran, checkpoint commit lost,
    batch re-delivered with the same batch_id) is directly testable."""
    import os

    import pyspark.sql.functions as F

    from newsflow.dedup import minhash
    from newsflow.dedup.core import doc_shingle_arrays

    if batch.isEmpty():
        return
    internal_pairs = minhash.native_minhash_near_dup_pairs(
        batch, n=n, threshold=threshold
    ).select("doc_a", "doc_b")
    losers = (
        internal_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    )
    # DROP LOG: record WHY each doc was dropped (every matched partner,
    # internal and index). This is what makes takedown re-election a
    # delete-list-proportional lookup instead of a raw-corpus scan —
    # `corpus_takedown` finds re-admission candidates by semi-joining
    # the log's matched_doc_id against the (broadcast-sized)
    # delete-list. Append-only history; batch=<id> overwrite keeps the
    # at-least-once replay idempotent like every other write here.
    drop_rows = internal_pairs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("matched_doc_id"),
        F.lit("batch").alias("reason"),
    )
    survivors = batch.join(losers, "doc_id", "left_anti")
    sigs_path = os.path.join(index_dir, "sigs")
    arrays_path = os.path.join(index_dir, "arrays")
    if os.path.exists(sigs_path):
        # Replay safety: on at-least-once re-execution of a batch whose
        # index writes already landed (crash after the batch=<id>
        # parquet commits but before the streaming checkpoint commit),
        # the stored index CONTAINS this batch's own signatures —
        # probing against them would self-match every survivor at
        # jaccard=1 and silently drop the whole batch. Keep the batch
        # partition-discovery column long enough to exclude the current
        # batch_id, then project it away so the stored tables match the
        # in-flight frames' schemas. (incremental_neardup_from_index
        # additionally drops doc_a == doc_b pairs as defense in depth.)
        index_matches = minhash.incremental_neardup_from_index(
            spark.read.parquet(sigs_path)
            .filter(F.col("batch") != F.lit(batch_id))
            .select("doc_id", "band", "key"),
            spark.read.parquet(arrays_path)
            .filter(F.col("batch") != F.lit(batch_id))
            .select("doc_id", "shingles"),
            survivors,
            n=n,
            threshold=threshold,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        ).select("new_doc_id", "matched_doc_id")
        drop_rows = drop_rows.unionByName(
            index_matches.select(
                F.col("new_doc_id").alias("doc_id"),
                "matched_doc_id",
                F.lit("index").alias("reason"),
            )
        )
        matched = index_matches.select(
            F.col("new_doc_id").alias("doc_id")
        ).distinct()
        survivors = survivors.join(matched, "doc_id", "left_anti")
    drop_rows.write.mode("overwrite").parquet(
        os.path.join(index_dir, "drops", f"batch={batch_id}")
    )
    kept_arrays = doc_shingle_arrays(survivors, n).cache()
    kept_arrays.write.mode("overwrite").parquet(
        os.path.join(arrays_path, f"batch={batch_id}")
    )
    minhash.band_signatures(
        kept_arrays, num_hashes, rows_per_band
    ).write.mode("overwrite").parquet(
        os.path.join(sigs_path, f"batch={batch_id}")
    )
    survivors.withColumn(
        "ingest_batch", F.lit(batch_id).cast("long")
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}")
    )
    kept_arrays.unpersist()


def neardup_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> StreamingQuery:
    """STREAMING near-dup ingest — the deployment form of
    `incremental_neardup_new_docs`: each micro-batch (1) collapses
    batch-internal near-duplicates (any doc near-dup of a smaller-id doc
    in the same batch is dropped — the greedy doc_b-side rule, identical
    in trainer and oracle), (2) probes the STORED band-signature index
    and drops docs matching any already-indexed document, (3) appends
    the survivors' shingle arrays + band signatures to the index and the
    survivors themselves (tagged ``ingest_batch``) to ``out_dir``.

    Exactly-once: every write targets a ``batch=<id>`` subdirectory in
    overwrite mode, so a replayed micro-batch (at-least-once delivery)
    rewrites its own partition idempotently — the same recipe as
    `stream_merge_to_corpus`, without needing MERGE because batch ids
    partition the output naturally.

    Scale shape: per micro-batch cost = the batch's own shingle/
    signature computation + the index probe join (batch side broadcast,
    index scanned columnar, never shuffled) — cost tracks batch size,
    not corpus size, exactly the property the batch-mode stress table
    proves (BENCH_sf1.md round-6 section)."""
    def _apply(batch: DataFrame, batch_id: int) -> None:
        neardup_apply_batch(
            spark,
            batch,
            batch_id,
            index_dir=index_dir,
            out_dir=out_dir,
            n=n,
            threshold=threshold,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
