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
from newsflow.tables import local_df

# --- Micro-batch shuffle sizing (VERDICT r13 Next #5) ----------------------
#
# The round-13 executor sweep measured streaming ingest ANTI-scaling with
# core count: `streaming_ann_index_ingest` ran 15.1 s at local[8] vs
# 22.6 s at local[32] in all four sweeps (BENCH_sf1.md), because the
# session-level `spark.sql.shuffle.partitions` (sized for the BATCH
# workload: one wave per core) fans each tiny micro-batch's exchanges
# into 4x the tasks — pure scheduler overhead at 16-row deltas. The fix
# is sizing shuffles to the BATCH, not the session: every foreachBatch
# body below runs under a per-batch override computed from the observed
# batch row count, clamped to [1, session value] so a genuinely large
# batch keeps the session's parallelism. The one extra `count()` per
# micro-batch is a re-read of the batch's source files — noise next to
# the work it sizes (and exactly-once is untouched: the override changes
# physical partitioning only).
#
# Session-global caveat: `spark.conf` is shared, so two streams draining
# CONCURRENTLY in one session would race on the override. Every helper
# in this module triggers availableNow and callers await termination
# before starting the next stream; run truly concurrent streams from
# separate `spark.newSession()` handles (each has its own conf).

MICRO_BATCH_ROWS_PER_TASK = 65536
_SHUFFLE_KEY = "spark.sql.shuffle.partitions"


from contextlib import contextmanager


@contextmanager
def sized_shuffle(spark, n_rows: int, rows_per_task: int | None = None):
    """Scoped volume-aware shuffle partitioning: ceil(n_rows /
    rows_per_task) partitions, floor 1, ceiling the session setting
    (restored on exit). The single shared implementation of the sizing
    rule — the foreachBatch wrapper below and the watermarked-replay
    drain (streaming/exec_queries.py) both use it, so the batch and
    stream-start paths cannot drift."""
    per_task = rows_per_task or MICRO_BATCH_ROWS_PER_TASK
    try:
        session_n = int(spark.conf.get(_SHUFFLE_KEY))
    except (TypeError, ValueError):
        session_n = 200
    target = max(1, min(session_n, -(-int(n_rows) // per_task)))
    spark.conf.set(_SHUFFLE_KEY, str(target))
    try:
        yield target
    finally:
        spark.conf.set(_SHUFFLE_KEY, str(session_n))


def _adaptive_micro_batch(spark, apply_fn, rows_per_task=None):
    """Wrap a foreachBatch body so its jobs run with batch-volume-aware
    shuffle partitioning (`sized_shuffle` over the observed batch row
    count).

    ``rows_per_task`` defaults to MICRO_BATCH_ROWS_PER_TASK; pass a
    smaller value for bodies whose per-row work fans out (the NSW insert
    expands each vector into ~ef*M candidate rows per hop, so its call
    site sizes by post-expansion volume)."""

    def wrapped(batch, batch_id):
        with sized_shuffle(spark, batch.count(), rows_per_task):
            apply_fn(batch, batch_id)

    return wrapped


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
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
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
    from newsflow.fs import fs_exists

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
    # Lake-safe existence check (newsflow.fs): os.path.exists returns
    # False for s3a://hdfs:// URIs, which would silently skip the index
    # probe on the first stream run against an object-store index and
    # admit near-duplicates of already-indexed documents.
    if fs_exists(spark, sigs_path):
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
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ann_index_init(
    spark: SparkSession,
    base_vectors: DataFrame,
    *,
    vectors_path: str,
    graph_path: str,
    m: int | None = None,
    n_buckets: int | None = None,
) -> None:
    """Seed the persisted ANN-index state `ann_index_ingest_stream`
    appends to: the base (vec_id, embedding) slice lands as the
    ``batch=-1`` partition of the vector store, and the initial NSW
    graph (`nsw_graph_edges_df` over the base units) is written in the
    bucketed-by-src layout (`sim.nsw.write_graph_bucketed`) so every
    later micro-batch insert/takedown rewrites only its touched
    buckets. The codes table needs no seeding — the stream's encode
    step only ever appends batch partitions."""
    from newsflow.sim.knn import as_double_array
    from newsflow.sim.nsw import (
        GRAPH_BUCKETS,
        GRAPH_M,
        nsw_graph_edges_df,
        write_graph_bucketed,
    )
    from newsflow.sim.pq import _unit

    # Canonical store type is array<double>: the source table may carry
    # float32 embeddings while stream batches arrive as double — mixed
    # per-partition physical types would fail the unified read.
    base_vectors.select(
        "vec_id",
        as_double_array(base_vectors["embedding"]).alias("embedding"),
    ).write.mode("overwrite").parquet(f"{vectors_path}/batch=-1")
    units = _unit(base_vectors, "vec_id").localCheckpoint(eager=True)
    write_graph_bucketed(
        spark,
        graph_path,
        nsw_graph_edges_df(units, m=m or GRAPH_M),
        n_buckets=n_buckets or GRAPH_BUCKETS,
    )


def ann_index_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    *,
    vectors_path: str,
    graph_path: str,
    codes_path: str | None = None,
    pq_codebooks: dict | None = None,
    pq_perm: list[int] | None = None,
    m: int | None = None,
    ef: int | None = None,
    hops: int | None = None,
) -> None:
    """One micro-batch of the ANN-index append (the foreachBatch body of
    `ann_index_ingest_stream`, public like `neardup_apply_batch` so the
    batch path and redelivery semantics are directly testable):

    1. drop ids already ingested by OTHER batches (the ``batch != id``
       replay exclusion) and append the remainder to the ``batch=<id>``
       partition of the vector store (overwrite — idempotent under
       same-id redelivery);
    2. encode the new vectors against the STORED codebooks — permuted
       first with the stored OPQ rotation when ``pq_perm`` is given —
       into the ``batch=<id>`` partition of the code table;
       codebooks/rotation are never re-learned on the ingest path
       (the no-refit property);
    3. insert the new vectors into the persisted NSW graph
       (`nsw_insert_delta`: beam-search M-NN + forward/intra/reverse
       edges + bounded-degree re-prune), then rewrite ONLY the bucket
       partitions holding a changed src's list — the bucketed-by-src
       layout (`sim.nsw.write_graph_bucketed`) keeps the per-batch
       persist change-set-proportional; a legacy single-dir graph is
       migrated on first touch. Redelivery is handled by an
       applied-batch marker (skip when the prior attempt completed —
       strict no-op) with strip-then-reinsert as the convergent
       fallback for a crash before the marker landed; see the inline
       note for why the fallback is valid-but-not-bitwise.
       tests/test_streaming_ann_ingest.py exercises both cases."""
    import pyspark.sql.functions as F

    from newsflow.sim.knn import as_double_array
    from newsflow.sim.nsw import (
        GRAPH_M,
        NSW_EF_CONSTRUCTION,
        NSW_HOPS_CONSTRUCTION,
    )
    from newsflow.sim.pq import _assign_codes, _unit

    new = batch.select(
        "vec_id", as_double_array(batch["embedding"]).alias("embedding")
    ).dropDuplicates(["vec_id"])
    stored = spark.read.parquet(vectors_path)
    new = new.join(
        stored.filter(F.col("batch") != batch_id).select("vec_id"),
        "vec_id",
        "left_anti",
    ).localCheckpoint(eager=True)
    if new.isEmpty():
        return
    new.write.mode("overwrite").parquet(f"{vectors_path}/batch={batch_id}")
    spark.catalog.refreshByPath(vectors_path)

    new_units = _unit(new, "vec_id").localCheckpoint(eager=True)
    if pq_codebooks is not None:
        if codes_path is None:
            raise ValueError("pq_codebooks given without codes_path")
        enc = new_units
        if pq_perm is not None:
            from newsflow.sim.opq import permute_expr

            enc = enc.select("vec_id", permute_expr(pq_perm).alias("u"))
        # Geometry is read off the codebook dict itself (keyed
        # (sub, codeword) -> dsub floats), same as corpus_takedown.
        n_subs = 1 + max(s for s, _ in pq_codebooks)
        k = 1 + max(c for _, c in pq_codebooks)
        dsub = len(next(iter(pq_codebooks.values())))
        _assign_codes(enc, pq_codebooks, n_subs, dsub, k).selectExpr(
            "vec_id",
            "array_join(transform(codes, c -> cast(c as string)),"
            " '-') AS code_string",
        ).write.mode("overwrite").parquet(f"{codes_path}/batch={batch_id}")

    # Applied-batch marker (sibling dir): a redelivery after a
    # COMPLETED graph update skips the graph step entirely, making the
    # common at-least-once case a strict no-op. A crash in the narrow
    # write→marker gap falls through to the strip-then-reinsert below,
    # which converges to a VALID graph (all nodes present, degree ≤ M,
    # floors hold) though not necessarily the bitwise-identical one —
    # bounded-degree in-place mutation discards pruned-out edges, so
    # the exact pre-state is unrecoverable (the same property HNSW
    # implementations have). The bucket overwrite stages files and
    # swaps per partition at commit, so a crash INSIDE that commit
    # window can lose a touched bucket's BASE edges, which
    # strip-then-reinsert cannot re-derive — that tear is DETECTED
    # before every graph read (`validate_graph_buckets` against the
    # post-commit manifest) and repaired automatically by
    # `ann_index_rebuild_graph` from the vector store (bucketing
    # shrinks the blast radius; the manifest turns the residual
    # non-atomic swap from a silent hazard into a detected,
    # self-healing one — tests/test_graph_bucketed.py tears a bucket
    # mid-swap and watches the next batch recover). Marker
    # partitions grow O(batches), the same family the takedown drop
    # logs compact (`takedown.takedown_maintenance`).
    from newsflow.fs import fs_exists

    if fs_exists(spark, f"{graph_path}_applied/batch={batch_id}"):
        return

    from newsflow.sim.nsw import (
        GRAPH_BUCKETS,
        _no_constraint_propagation,
        _reprune_affected,
        graph_bucket_expr,
        graph_layout_buckets,
        nsw_insert_delta,
        overwrite_touched_graph_buckets,
        read_graph_edges,
        touched_bucket_ids,
        write_graph_bucketed,
    )

    from newsflow.sim.nsw import validate_graph_buckets

    # Validate-on-read (VERDICT r11 Next #4): a crash inside a prior
    # batch's bucket-overwrite commit window can have lost a touched
    # bucket's base edges. The manifest check is metadata-only; on a
    # detected tear the graph is re-derived from the vector store (the
    # durable source of truth) BEFORE this batch's insert — recovery is
    # automatic, not manual.
    torn = validate_graph_buckets(spark, graph_path)
    if torn:
        ann_index_rebuild_graph(spark, vectors_path, graph_path)

    # Scoped Union-constraint-rewrite workaround — see
    # sim.nsw._no_constraint_propagation (same shape as the takedown).
    with _no_constraint_propagation(spark):
        edges = read_graph_edges(spark, graph_path)
        new_ids = F.broadcast(new.select("vec_id"))
        # Strip any prior attempt's rows for these ids (both directions)
        # BEFORE re-inserting — replay safety. Srcs that lose a dst to the
        # strip belong to the touched-bucket write set (empty on a clean
        # first run — only a replay fallback strips anything).
        strip_lost = edges.join(
            new_ids.select(F.col("vec_id").alias("dst")), "dst", "left_semi"
        ).select("src")
        base = edges.join(
            new_ids.select(F.col("vec_id").alias("src")), "src", "left_anti"
        ).join(
            new_ids.select(F.col("vec_id").alias("dst")), "dst", "left_anti"
        )
        # Member set = the vector store minus this batch's ids: every
        # stored vector was inserted into the graph by construction
        # (init seeds batch=-1, each apply inserts its batch), so the
        # store IS the node set — reading it avoids two full edge-table
        # scans (src∪dst distinct) per micro-batch, and matches the
        # oracle's member relations (u_m0/u_m1 in insert_wave_ctes)
        # exactly.
        member_units = _unit(
            spark.read.parquet(vectors_path)
            .select("vec_id", "embedding")
            .join(new_ids, "vec_id", "left_anti"),
            "vec_id",
        )
        # Change set: beam-searched forward/intra/reverse candidate edges +
        # the srcs whose neighbor lists re-rank. The PERSIST below rewrites
        # only the buckets those srcs hash into — per-batch write cost is
        # change-set-proportional, never index-proportional (VERDICT r10 #1).
        # On the bucketed layout the beam's hop READS are pruned the same
        # way: each hop scans only the buckets the current frontier hashes
        # into (frontier-proportional I/O instead of one full graph scan
        # per hop — the 100 TB lever), with the batch-id strip applied to
        # the pruned relation so it matches `base` exactly.
        layout = graph_layout_buckets(spark, graph_path)
        hop_edges = None
        if layout is not None:
            bucketed = spark.read.parquet(graph_path)

            def hop_edges(bucket_ids, _b=bucketed):  # noqa: E306
                if not bucket_ids:
                    return base.filter(F.lit(False))
                pr = _b.filter(
                    F.col("bucket").isin([int(x) for x in bucket_ids])
                ).select("src", "dst", "cosine_sim")
                return pr.join(
                    new_ids.select(F.col("vec_id").alias("src")),
                    "src",
                    "left_anti",
                ).join(
                    new_ids.select(F.col("vec_id").alias("dst")),
                    "dst",
                    "left_anti",
                )

        added, affected = nsw_insert_delta(
            member_units,
            base,
            new_units,
            m=m or GRAPH_M,
            ef=ef or NSW_EF_CONSTRUCTION,
            hops=hops or NSW_HOPS_CONSTRUCTION,
            hop_edges=hop_edges,
            n_buckets=layout,
        )
        added = added.localCheckpoint(eager=True)
        affected = added.select("src").distinct().localCheckpoint(eager=True)
        if layout is None:
            # Legacy single-dir graph: migrate to the bucketed layout with
            # this batch's one-time whole rewrite.
            repruned = _reprune_affected(base, added, affected, m or GRAPH_M)
            updated = (
                base.join(F.broadcast(affected), "src", "left_anti")
                .unionByName(repruned)
                .localCheckpoint(eager=True)
            )
            write_graph_bucketed(spark, graph_path, updated)
        else:
            touched = affected.unionByName(strip_lost).unionByName(
                new_ids.select(F.col("vec_id").alias("src"))
            )
            tb = touched_bucket_ids(touched, layout)
            # Touched buckets' post-change content, built from a
            # partition-PRUNED read (bucket is the hive partition column):
            # surviving non-affected rows of those buckets ∪ the re-ranked
            # affected lists. Affected srcs' rows live in touched buckets
            # by construction, so the restriction is lossless.
            pruned = (
                spark.read.parquet(graph_path)
                .filter(F.col("bucket").isin(tb))
                .select("src", "dst", "cosine_sim")
            )
            pruned_base = pruned.join(
                new_ids.select(F.col("vec_id").alias("src")), "src", "left_anti"
            ).join(
                new_ids.select(F.col("vec_id").alias("dst")), "dst", "left_anti"
            )
            repruned = _reprune_affected(
                pruned_base, added, affected, m or GRAPH_M
            )
            write_rows = (
                pruned_base.join(F.broadcast(affected), "src", "left_anti")
                .unionByName(repruned)
                .localCheckpoint(eager=True)
            )
            overwrite_touched_graph_buckets(
                spark, graph_path, write_rows, tb, layout
            )
    local_df(spark, [(batch_id,)], "batch_id long").coalesce(
        1
    ).write.mode("overwrite").parquet(
        f"{graph_path}_applied/batch={batch_id}"
    )


def ann_index_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    *,
    vectors_path: str,
    graph_path: str,
    checkpoint_dir: str,
    codes_path: str | None = None,
    pq_codebooks: dict | None = None,
    pq_perm: list[int] | None = None,
    m: int | None = None,
    ef: int | None = None,
    hops: int | None = None,
) -> StreamingQuery:
    """STREAMING ANN-index append — the deployment form of the batch
    no-refit append pair (`sim.nsw.nsw_insert_batch` +
    `opq_encode_new_vectors`): a stream of (vec_id, embedding) rows
    drains through ``foreachBatch``, each micro-batch running
    `ann_index_apply_batch` (vector-store append + OPQ encode against
    stored codebooks/rotation + NSW graph insert).

    Exactly-once: at-least-once micro-batch delivery x idempotent apply
    (partition-scoped overwrites for vectors/codes; strip-then-reinsert
    for the graph, whose result is a pure function of (graph without
    the batch's ids, member vectors, batch vectors)) = exactly-once
    effect — the redelivery case Structured Streaming actually produces
    is the LAST uncommitted batch re-running against the state its
    prior attempt may have partially written, which the strip step
    makes convergent.

    Cost shape per micro-batch: encode is |batch| x codebook work;
    graph insert is |batch| beam searches (each |batch| x ef x M rows
    per hop, corpus-independent) + a re-prune window over the touched
    srcs only; the graph PERSIST rewrites only the touched buckets of
    the bucketed-by-src layout — batch-proportional in compute AND
    write, never index-proportional, matching the batch-mode stress
    table (BENCH_sf1.md)."""
    def _apply(batch: DataFrame, batch_id: int) -> None:
        ann_index_apply_batch(
            spark,
            batch,
            batch_id,
            vectors_path=vectors_path,
            graph_path=graph_path,
            codes_path=codes_path,
            pq_codebooks=pq_codebooks,
            pq_perm=pq_perm,
            m=m,
            ef=ef,
            hops=hops,
        )

    # rows_per_task=64: the insert's beam search expands each batch
    # vector into ~ef*M (~512) candidate rows per hop, so shuffles are
    # sized by post-expansion volume — a 16-vector wave still runs its
    # exchanges in ONE task (the r13 sweep's anti-scaling case) while a
    # 2k+-vector batch regains the session's full parallelism.
    return (
        stream.writeStream.foreachBatch(
            _adaptive_micro_batch(spark, _apply, rows_per_task=64)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ann_index_maintenance(
    spark: SparkSession, graph_path: str, *, settled_before: int
) -> dict[str, int]:
    """Bound the applied-batch marker family `ann_index_apply_batch`
    grows (one ``batch=<id>`` dir per micro-batch — the same
    O(batches)-listings decay `takedown.takedown_maintenance` compacts
    for the tombstone/drop logs). Markers exist only to short-circuit
    same-id redelivery, and Structured Streaming can never redeliver a
    batch below the checkpoint's committed offset — so every marker
    with ``batch_id < settled_before`` (the caller's committed-offset
    watermark) is dead and is deleted through the Hadoop FileSystem
    API (file://, s3a:// and hdfs:// lakes alike)."""
    from newsflow.fs import fs_delete, fs_list_subdirs

    root = f"{graph_path}_applied"
    deleted = 0
    for name in fs_list_subdirs(spark, root, "batch="):
        if int(name.split("=", 1)[1]) < settled_before:
            fs_delete(spark, f"{root}/{name}")
            deleted += 1
    return {"markers_deleted": deleted}


def ann_index_rebuild_graph(
    spark: SparkSession,
    vectors_path: str,
    graph_path: str,
    *,
    m: int | None = None,
    n_buckets: int | None = None,
    use_ivf: bool = True,
) -> dict[str, int]:
    """Disaster-recovery rebuild of the persisted NSW graph from the
    vector store — the stated fallback for the one failure the
    incremental paths cannot repair: a crash inside a bucket-overwrite
    commit window that loses base edges (see `ann_index_apply_batch`'s
    inline note). The vector store is the durable source of truth
    (append-only ``batch=<id>`` partitions, never rewritten in place),
    so the graph is always re-derivable: IVF-pruned construction
    (`nsw_graph_edges_ivf`, ~n^1.5 — the at-scale path) or the exact
    all-pairs build for small indexes, written fresh in the bucketed
    layout. Returns {"nodes": n, "edges": n}."""
    from newsflow.sim.nsw import (
        GRAPH_BUCKETS,
        GRAPH_M,
        nsw_graph_edges_df,
        nsw_graph_edges_ivf,
        write_graph_bucketed,
    )
    from newsflow.sim.pq import _unit

    vecs = (
        spark.read.parquet(vectors_path)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    units = _unit(vecs, "vec_id").localCheckpoint(eager=True)
    n_nodes = units.count()
    build = nsw_graph_edges_ivf if use_ivf else nsw_graph_edges_df
    edges = build(units, m=m or GRAPH_M).localCheckpoint(eager=True)
    write_graph_bucketed(
        spark, graph_path, edges, n_buckets=n_buckets or GRAPH_BUCKETS
    )
    return {"nodes": int(n_nodes), "edges": int(edges.count())}


def cms_apply_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, sketch_dir: str
) -> None:
    """One micro-batch of Count-Min sketch maintenance: sketch the
    batch's OWN bigram counts and write the delta into a
    ``batch=<id>`` partition of the sketch table. Exactly-once by the
    `neardup_ingest_stream` recipe — a replayed batch overwrites its
    own partition idempotently; no marker, no read-modify-write. The
    "merge" is the sketch's additive property applied at READ time
    (`read_cms_sketch` sums cells across batch partitions), so the
    per-batch write cost is the batch's own D x W-bounded delta —
    never the corpus, never the accumulated sketch.
    """
    from newsflow.sketch import _bigram_counts, cms_sketch

    delta = cms_sketch(_bigram_counts(batch))
    # One file per batch partition: the delta is <= D*W rows by
    # construction (16,384 at the defaults).
    delta.coalesce(1).write.mode("overwrite").parquet(
        f"{sketch_dir}/batch={int(batch_id)}"
    )


def cms_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """STREAMING Count-Min maintenance — the deployment form of
    `cms_incremental_update`: each micro-batch appends its delta
    sketch as an idempotent ``batch=<id>`` partition. State never
    grows past (batches x D x W) rows and old batch partitions can be
    compacted into one (same lifecycle as `ann_index_maintenance`'s
    marker compaction) without changing any read."""
    def _apply(batch: DataFrame, batch_id: int) -> None:
        cms_apply_batch(spark, batch, batch_id, sketch_dir)

    return (
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _cms_base_watermark(spark: SparkSession, sketch_dir: str) -> int:
    """Watermark of the newest VALID compacted base partition.

    `cms_maintenance` compacts settled deltas into ``batch=-W`` where
    W is the settled-before watermark — the partition id IS the
    manifest, so no side file can go missing. Valid = has a _SUCCESS
    marker (a base whose write crashed midway is ignored; its source
    deltas are still on disk because deletion happens strictly after
    the write, so falling back to the previous base loses nothing)."""
    from newsflow.fs import fs_exists, fs_list_subdirs

    best = 0
    for name in fs_list_subdirs(spark, sketch_dir, "batch=-"):
        w = -int(name.split("=", 1)[1])
        if w > best and fs_exists(spark, f"{sketch_dir}/{name}/_SUCCESS"):
            best = w
    return best


def _live_sketch_dirs(spark: SparkSession, sketch_dir: str) -> list[str]:
    """The explicit directory list a sketch read may open: the newest
    valid compacted base (``batch=-W``) plus every delta at or above
    its watermark W. Shared by every sketch family so the
    crash-window reasoning in `read_cms_sketch`'s docstring holds for
    all of them verbatim."""
    from newsflow.fs import fs_list_subdirs

    w = _cms_base_watermark(spark, sketch_dir)
    dirs = []
    for name in fs_list_subdirs(spark, sketch_dir, "batch="):
        b = int(name.split("=", 1)[1])
        if (b == -w and w > 0) or b >= w:
            dirs.append(f"{sketch_dir}/{name}")
    return dirs


def _sketch_maintenance(
    spark: SparkSession,
    sketch_dir: str,
    *,
    settled_before: int,
    schema: str,
    fold,
) -> dict[str, int]:
    """The ONE watermark/debris/merge compaction lifecycle for every
    additive sketch store (CMS / Bloom / KMV / planning-CMS),
    parameterized by the store's delta ``schema`` and its associative
    ``fold`` (DataFrame -> folded DataFrame). Extracted per ADVICE r12
    (three verbatim copies of ~40 lines of crash-window logic were one
    edit away from drifting).

    ``settled_before`` is the caller's committed-offset promise: no
    batch with a smaller id can ever replay. The merge reads the
    current base (watermark W) plus deltas in [W, settled_before),
    materializes the folded rows BEFORE any write (the standing
    replay-safety rule), writes them to ``batch=-settled_before``, and
    only then deletes the merged sources. Crash anywhere in between is
    absorbed by the `_live_sketch_dirs` watermark read rule; leftover
    source dirs below the new watermark are debris, deleted (never
    re-merged — they are already IN the base) by the next pass."""
    from newsflow.fs import fs_delete, fs_exists, fs_list_subdirs

    if settled_before <= 0 or not fs_exists(spark, sketch_dir):
        return {"merged_deltas": 0, "debris_deleted": 0, "watermark": 0}
    w = _cms_base_watermark(spark, sketch_dir)
    if settled_before <= w:
        # Nothing newly settled; still sweep sub-watermark debris.
        settled_before = w
    merge_dirs, debris = [], []
    for name in fs_list_subdirs(spark, sketch_dir, "batch="):
        b = int(name.split("=", 1)[1])
        if b < 0:
            if -b < settled_before or not fs_exists(
                spark, f"{sketch_dir}/{name}/_SUCCESS"
            ):
                debris.append(name)  # older/invalid base generation
            if -b == w and w < settled_before:
                merge_dirs.append(name)
        elif b < w:
            debris.append(name)  # already folded into the base
        elif b < settled_before:
            merge_dirs.append(name)
    if merge_dirs and settled_before > w:
        merged = fold(
            spark.read.schema(schema).parquet(
                *[f"{sketch_dir}/{d}" for d in merge_dirs]
            )
        ).localCheckpoint(eager=True)
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{sketch_dir}/batch=-{settled_before}"
        )
        debris.extend(d for d in merge_dirs if d not in debris)
    for name in set(debris):
        fs_delete(spark, f"{sketch_dir}/{name}")
    return {
        "merged_deltas": len(merge_dirs),
        "debris_deleted": len(set(debris)),
        "watermark": max(settled_before, w),
    }


_CMS_SCHEMA = "salt string, bucket bigint, cell bigint"


def _cms_fold(df: DataFrame) -> DataFrame:
    import pyspark.sql.functions as F

    return df.groupBy("salt", "bucket").agg(
        F.sum("cell").cast("long").alias("cell")
    )


def read_cms_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The current sketch: cells summed across the newest compacted
    base (if any) and every batch delta at or above its watermark.
    Columnar scan of a <= (base + live-batches) x D x W-row table —
    broadcast-sized for estimation joins regardless of corpus size.

    The watermark read rule is what makes `cms_maintenance` crash-safe
    for ADDITIVE state (where the tombstone compaction's
    merge+distinct recipe would double-count): any partition the rule
    excludes — an older base generation, or a settled delta whose
    deletion crashed — contributes nothing, so every crash window
    between the base write and the source deletes reads exactly once.

    The read opens ONLY the directories the watermark rule selects
    (the same explicit-list discipline as `cms_maintenance`'s merge),
    with an explicit schema: reading the whole table and filtering on
    the partition column afterwards would let file listing / schema
    inference touch an EXCLUDED partition, so a torn data file inside
    a crashed base write could fail the read during exactly the crash
    window the rule exists to absorb (ADVICE r11)."""
    dirs = _live_sketch_dirs(spark, sketch_dir)
    if not dirs:
        return local_df(spark, [], _CMS_SCHEMA)
    return _cms_fold(spark.read.schema(_CMS_SCHEMA).parquet(*dirs))


def bloom_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    bloom_dir: str,
    n_shards: int | None = None,
) -> None:
    """One micro-batch of Bloom-bitmap maintenance: build the batch's
    OWN bitmap delta over md5(text) keys and overwrite its
    ``batch=<id>`` partition (idempotent under redelivery, the
    `cms_apply_batch` recipe). The fold is bit_or — associative AND
    idempotent, so the streamed bitmap is even more forgiving than the
    additive CMS: re-merging a delta can never corrupt it.

    ``n_shards`` selects the PRODUCTION-sized sharded form
    (`bloom_build_sharded`, ~12 bits/key at any key count): deltas are
    (shard, word, bits) and every consumer must be called with the
    same ``n_shards`` — shard ids are hash-stable, so deltas built at
    equal shard counts fold freely. None keeps the fixed 4096-bit
    check-scale geometry."""
    import pyspark.sql.functions as F

    from newsflow.sketch import bloom_build, bloom_build_sharded

    keys = batch.select(F.md5("text").alias("k"))
    delta = (
        bloom_build(keys)
        if n_shards is None
        else bloom_build_sharded(keys, n_shards=n_shards)
    )
    delta.coalesce(1).write.mode("overwrite").parquet(
        f"{bloom_dir}/batch={int(batch_id)}"
    )


def bloom_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    bloom_dir: str,
    checkpoint_dir: str,
    n_shards: int | None = None,
) -> StreamingQuery:
    """STREAMING Bloom membership maintenance — the deployment form of
    the `bloom_dedup_prefilter` index side: each micro-batch appends
    its own <= BLOOM_WORDS-row bitmap delta; `read_bloom` OR-folds at
    read time, `bloom_maintenance` compacts settled deltas. State is
    (batches x W) rows bounded, per-batch write cost is the batch's own
    key pass — corpus-size-independent."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        bloom_apply_batch(spark, batch, batch_id, bloom_dir, n_shards)

    return (
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _bloom_delta_schema(sharded: bool) -> str:
    return (
        "shard int, word int, bits bigint"
        if sharded
        else "word int, bits bigint"
    )


def _bloom_fold(df: DataFrame, sharded: bool) -> DataFrame:
    import pyspark.sql.functions as F

    keys = ["shard", "word"] if sharded else ["word"]
    return df.groupBy(*keys).agg(
        F.expr("bit_or(bits)").cast("long").alias("bits")
    )


def read_bloom(
    spark: SparkSession, bloom_dir: str, sharded: bool = False
) -> DataFrame:
    """The current bitmap: bit_or across the newest compacted base and
    every live delta, via the same explicit-directory watermark read as
    `read_cms_sketch` (a torn excluded partition is never opened).
    Because bit_or is idempotent, every crash window is absorbed even
    without the exclusion — the rule here buys bounded listing and
    uniform lifecycle, not correctness. ``sharded=True`` reads a store
    of `bloom_build_sharded` deltas ((shard, word, bits), the
    production geometry) — pass it consistently with the writer's
    ``n_shards``."""
    dirs = _live_sketch_dirs(spark, bloom_dir)
    if not dirs:
        return local_df(spark, [], _bloom_delta_schema(sharded))
    return _bloom_fold(
        spark.read.schema(_bloom_delta_schema(sharded)).parquet(*dirs),
        sharded,
    )


def bloom_maintenance(
    spark: SparkSession,
    bloom_dir: str,
    *,
    settled_before: int,
    sharded: bool = False,
) -> dict[str, int]:
    """Compact settled Bloom deltas into one OR-folded base partition —
    `_sketch_maintenance`'s lifecycle with bit_or in place of sum (the
    idempotent fold makes every crash window here benign, but the
    watermark discipline keeps reads bounded and the sketch stores
    symmetric)."""
    return _sketch_maintenance(
        spark,
        bloom_dir,
        settled_before=settled_before,
        schema=_bloom_delta_schema(sharded),
        fold=lambda df: _bloom_fold(df, sharded),
    )


def kmv_apply_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, kmv_dir: str
) -> None:
    """One micro-batch of per-source KMV maintenance: the batch's OWN
    k-smallest (source, h) summary, overwritten into ``batch=<id>``.
    K(A u B) is the k smallest DISTINCT values of K(A) u K(B), so the
    merge (`read_kmv`) is associative and idempotent — a replayed or
    re-merged delta can never move an estimate."""
    import pyspark.sql.functions as F

    from newsflow.sketch import KMV_K, _source_grams, kmv_sketch

    delta = kmv_sketch(_source_grams(batch)).filter(
        F.col("rn") <= KMV_K
    ).select("source", "h")
    delta.coalesce(1).write.mode("overwrite").parquet(
        f"{kmv_dir}/batch={int(batch_id)}"
    )


def kmv_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    kmv_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """STREAMING per-source KMV distinct-sketch maintenance — the
    deployment form of `source_vocab_kmv`'s sketch side: per-batch
    k-row-per-source deltas, k-smallest-distinct merge at read time,
    watermark compaction. Per-batch cost is the batch's own distinct
    pass; stored state is (batches x sources x k) rows bounded."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        kmv_apply_batch(spark, batch, batch_id, kmv_dir)

    return (
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv(spark: SparkSession, kmv_dir: str) -> DataFrame:
    """The current merged sketch: per source, the k smallest DISTINCT
    md5 values across the base and live deltas (rank attached — the
    same (source, h, rn) shape `kmv_sketch` produces, so every
    downstream estimator works unchanged on streamed state). DISTINCT
    before ranking is what makes the merge idempotent: the same gram
    seen by two batches lands the same md5 in both deltas."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from newsflow.sketch import KMV_K

    dirs = _live_sketch_dirs(spark, kmv_dir)
    if not dirs:
        return local_df(spark, [], "source string, h string, rn int")
    win = Window.partitionBy("source").orderBy("h")
    return (
        spark.read.schema("source string, h string")
        .parquet(*dirs)
        .distinct()
        .withColumn("rn", F.row_number().over(win).cast("int"))
        .filter(F.col("rn") <= KMV_K)
    )


def kmv_maintenance(
    spark: SparkSession, kmv_dir: str, *, settled_before: int
) -> dict[str, int]:
    """Compact settled KMV deltas into one k-smallest-distinct base —
    `_sketch_maintenance` with the idempotent KMV merge, so every
    crash window is benign (re-merging debris cannot change the k
    smallest distinct values)."""

    def _kmv_fold(df: DataFrame) -> DataFrame:
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from newsflow.sketch import KMV_K

        win = Window.partitionBy("source").orderBy("h")
        return (
            df.distinct()
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= KMV_K)
            .select("source", "h")
        )

    return _sketch_maintenance(
        spark,
        kmv_dir,
        settled_before=settled_before,
        schema="source string, h string",
        fold=_kmv_fold,
    )



def cms_maintenance(
    spark: SparkSession, sketch_dir: str, *, settled_before: int
) -> dict[str, int]:
    """Compact settled CMS batch deltas into one base partition,
    bounding the O(batches) directory listing the stream accrues —
    `_sketch_maintenance` with the additive cell-sum fold (see that
    helper for the settled-before / crash-window contract)."""
    return _sketch_maintenance(
        spark,
        sketch_dir,
        settled_before=settled_before,
        schema=_CMS_SCHEMA,
        fold=_cms_fold,
    )


# --- MinHash planning-sketch maintenance (VERDICT r12 Next #6) -------------
#
# The CMS that routes `native_minhash_candidates_cms_planned`'s band keys
# (dedup/minhash.py) under the same additive batch=<id> delta lifecycle as
# the oracled sketch tier, so the routing estimate in the deployment shape
# comes from PERSISTED state maintained alongside the corpus — not an
# in-query extra pass over the signatures.

_PLAN_CMS_SCHEMA = "d int, bkt int, cell bigint"


def _plan_cms_fold(df: DataFrame) -> DataFrame:
    import pyspark.sql.functions as F

    return df.groupBy("d", "bkt").agg(
        F.sum("cell").cast("long").alias("cell")
    )


def plan_cms_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    sketch_dir: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> None:
    """One micro-batch of planning-sketch maintenance: shingle the
    batch's documents, compute their band signatures with EXACTLY the
    parameters the query-time plan will use, sketch the band-key row
    frequencies, and overwrite the delta into ``batch=<id>``. Additive
    across batches because each doc_id's signature rows land in
    exactly one batch; idempotent under replay because the partition
    is overwritten whole. Delta size is <= D*W rows (32,768 at the
    planning defaults) regardless of batch size."""
    import pyspark.sql.functions as F

    from newsflow.dedup.minhash import (
        _plan_cms_build,
        band_signatures,
        doc_shingle_arrays,
    )

    sigs = band_signatures(
        doc_shingle_arrays(batch, n), num_hashes, rows_per_band
    ).withColumn(
        "ck",
        F.concat_ws(
            ":",
            F.col("band").cast("string"),
            F.col("key").cast("array<string>"),
        ),
    )
    delta = _plan_cms_build(sigs)
    delta.coalesce(1).write.mode("overwrite").parquet(
        f"{sketch_dir}/batch={int(batch_id)}"
    )


def plan_cms_ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> StreamingQuery:
    """STREAMING maintenance of the MinHash planning sketch — the
    `cms_ingest_stream` lifecycle applied to band-key frequencies, so
    `minhash_near_dup_pairs_cms_streamed` can route its candidate plan
    from stored state instead of an in-query sketch build."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        plan_cms_apply_batch(
            spark,
            batch,
            batch_id,
            sketch_dir,
            n=n,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        )

    return (
        stream.writeStream.foreachBatch(_adaptive_micro_batch(spark, _apply))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_plan_cms(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The current planning sketch: (d, bkt, cell) cells summed across
    the newest compacted base and live deltas under the shared
    watermark read rule — the exact frame
    `native_minhash_candidates_cms_planned` accepts as ``sketch``."""
    dirs = _live_sketch_dirs(spark, sketch_dir)
    if not dirs:
        return local_df(spark, [], _PLAN_CMS_SCHEMA)
    return _plan_cms_fold(
        spark.read.schema(_PLAN_CMS_SCHEMA).parquet(*dirs)
    )


def plan_cms_maintenance(
    spark: SparkSession, sketch_dir: str, *, settled_before: int
) -> dict[str, int]:
    """`_sketch_maintenance` with the planning sketch's cell-sum fold."""
    return _sketch_maintenance(
        spark,
        sketch_dir,
        settled_before=settled_before,
        schema=_PLAN_CMS_SCHEMA,
        fold=_plan_cms_fold,
    )
