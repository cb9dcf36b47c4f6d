"""Takedown / deletion propagation — the inverse of incremental ingest.

A 100 TB training corpus carries a standing legal obligation the append
path never exercises: given a delete-list of doc_ids (copyright claim,
PII notice, opt-out), remove every trace of those documents from the
corpus AND from every derived artifact, while touching as little of the
lake as possible. This module propagates one delete-list through the
four derived-table families the engine maintains:

1. the deduped corpus itself (``batch=N``-partitioned survivor parquet,
   the `neardup_ingest_stream` output layout);
2. the MinHash signature index (``sigs``/``arrays``, same layout);
3. vector code tables (PQ / IVF-PQ codes keyed by vec_id = doc_id);
4. packed training sequences (shard-partitioned placements whose
   offsets shift when a document vanishes mid-stream).

Plus the genuinely hard case: **near-dup keeper re-election**. Deleting
a keeper orphans every document that was dropped for matching it; a
correct takedown re-admits any dropped document whose every matching
keeper is now gone (re-running dedup among the re-admission candidates
themselves — two orphans of one deleted keeper must not BOTH come
back). Re-election reuses `neardup_apply_batch` verbatim: candidates
form a batch, the batch probes the post-delete index, survivors append
under a caller-supplied takedown batch id.

Scale shape: the delete-list is broadcast (takedown lists are
human-generated — thousands of rows, not billions); dirty partitions
are found with a column-pruned key scan and only they are rewritten
(dynamic partition overwrite + explicit tombstones for partitions the
deletion empties, the `ops/merge.py::merge_upsert` recipe); the
re-election probe costs one index scan + candidate-sized joins, the
`incremental_neardup_from_index` shape. Nothing corpus-proportional
runs on the driver.

Idempotency: every step is a pure function of (stored state ∖
delete-list), and the re-election batch excludes its OWN output
partition when computing candidates and probing the index — a crashed
takedown re-run with the same ``takedown_id`` rewrites identical bytes
(tests/test_takedown.py replays it).

Reference parity: the reference engine has no deletion story at all
(append-only `build_datasets.py`); this is a scale-mandated extension
in the spirit of its corpus-maintenance ETL.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.curation import pack_shard_expr, sql_pack_shard
from newsflow.fs import fs_delete, fs_exists, fs_list_subdirs
from newsflow.functions.text import sql_shingles_rel, sql_tokens
from newsflow.registry import register
from newsflow.tables import load_table


def _key_frame(delete_ids: DataFrame, key: str) -> DataFrame:
    """Normalize a delete-list to one distinct column named ``key``."""
    col = delete_ids.columns[0]
    return delete_ids.select(F.col(col).alias(key)).distinct()


def takedown_partitioned(
    spark: SparkSession,
    path: str,
    delete_ids: DataFrame,
    key: str = "doc_id",
    partition_col: str | None = "batch",
) -> dict[str, int]:
    """Delete ``delete_ids`` rows from the parquet table at ``path``,
    rewriting only the hive partitions that contain a deleted key.

    ``partition_col=None`` degrades to a whole-table rewrite (for small
    unpartitioned side tables like a code table); partitioned targets
    pay one column-pruned (key, partition) scan to find dirty
    partitions, then rewrite exactly those — partitions the deletion
    empties are tombstoned explicitly, since dynamic overwrite cannot
    emit an empty partition (see ops/merge.py for the full argument).

    Returns {"deleted": n, "partitions": n_dirty}.
    """
    if not fs_exists(spark, path):
        return {"deleted": 0, "partitions": 0}
    dels = F.broadcast(_key_frame(delete_ids, key))
    target = spark.read.parquet(path)

    if partition_col is None or partition_col not in target.columns:
        kept = target.join(dels, key, "left_anti").localCheckpoint(eager=True)
        n_deleted = target.count() - kept.count()
        if n_deleted:
            kept.write.mode("overwrite").parquet(path)
            spark.catalog.refreshByPath(path)
        return {"deleted": int(n_deleted), "partitions": 1 if n_deleted else 0}

    dirty = [
        r[0]
        for r in target.join(dels, key, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not dirty:
        return {"deleted": 0, "partitions": 0}
    affected = target.filter(F.col(partition_col).isin(dirty))
    kept = affected.join(dels, key, "left_anti").localCheckpoint(eager=True)
    n_deleted = affected.count() - kept.count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        emptied = set(dirty) - {
            r[0] for r in kept.select(partition_col).distinct().collect()
        }
        for p in emptied:
            (
                kept.filter(F.lit(False))
                .drop(partition_col)
                .write.mode("overwrite")
                .parquet(f"{path}/{partition_col}={p}")
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(path)
    return {"deleted": int(n_deleted), "partitions": len(dirty)}


def takedown_repack(
    spark: SparkSession,
    packs_path: str,
    delete_ids: DataFrame,
    added: DataFrame | None = None,
) -> dict[str, int]:
    """Propagate a takedown through the stored sequence-packing table
    (`corpus_pack_sequences` layout: doc_id, shard, pack_id,
    pack_offset, n_tokens — hive-partitioned by shard).

    Removing (or re-admitting) a document shifts the pack offsets of
    every LATER document in its md5 shard, so the dirty unit is the
    shard, not the row: dirty shards = shards of deleted ∪ added docs;
    each is rebuilt from (its surviving rows ∪ the added rows) with the
    prefix-sum offsets recomputed in the canonical (md5(doc_id),
    doc_id) order. Untouched shards — the overwhelming majority under
    any realistic delete-list — are never read. ``added`` needs only
    (doc_id, n_tokens); shard is re-derived from doc_id.
    """
    from newsflow.curation import SEQ_LEN, pack_shard_expr
    from pyspark.sql import Window

    if not fs_exists(spark, packs_path):
        return {"deleted": 0, "added": 0, "partitions": 0}
    dels = F.broadcast(_key_frame(delete_ids, "doc_id"))
    packs = spark.read.parquet(packs_path)
    shard_of = pack_shard_expr()

    dirty_del = packs.join(dels, "doc_id", "left_semi").select("shard")
    added_rows = None
    if added is not None:
        added_rows = added.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            shard_of.alias("shard"),
        ).localCheckpoint(eager=True)
        dirty_shards = {
            r[0]
            for r in dirty_del.union(added_rows.select("shard"))
            .distinct()
            .collect()
        }
    else:
        dirty_shards = {r[0] for r in dirty_del.distinct().collect()}
    if not dirty_shards:
        return {"deleted": 0, "added": 0, "partitions": 0}

    affected = packs.filter(F.col("shard").isin(list(dirty_shards)))
    kept = affected.join(dels, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "shard"
    )
    n_added = 0
    if added_rows is not None:
        adds = added_rows.filter(F.col("shard").isin(list(dirty_shards)))
        n_added = adds.count()
        # Upsert semantics: on a same-takedown-id replay the re-elected
        # docs already sit in the stored table — replacing (not
        # appending) their rows keeps the repack idempotent.
        kept = kept.join(
            F.broadcast(adds.select("doc_id")), "doc_id", "left_anti"
        ).unionByName(adds)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rebuilt = (
        kept.withColumn(
            "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            "shard",
            F.expr(f"offset div {SEQ_LEN}").alias("pack_id"),
            (F.col("offset") % SEQ_LEN).alias("pack_offset"),
            "n_tokens",
        )
        .localCheckpoint(eager=True)
    )
    n_deleted = affected.join(dels, "doc_id", "left_semi").count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt.write.mode("overwrite").partitionBy("shard").parquet(
            packs_path
        )
        emptied = dirty_shards - {
            r[0] for r in rebuilt.select("shard").distinct().collect()
        }
        for p in emptied:
            (
                rebuilt.filter(F.lit(False))
                .drop("shard")
                .write.mode("overwrite")
                .parquet(f"{packs_path}/shard={p}")
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(packs_path)
    return {
        "deleted": int(n_deleted),
        "added": int(n_added),
        "partitions": len(dirty_shards),
    }


def takedown_repack_ffd(
    spark: SparkSession,
    ffd_path: str,
    delete_ids: DataFrame,
    added: DataFrame | None = None,
) -> dict[str, int]:
    """Propagate a takedown through the stored FFD pack table
    (`packing.persist_ffd_packs` layout: shard-partitioned
    (doc_id, n_tokens, bin_idx)).

    FFD is a per-shard fold over (n_tokens DESC, doc_id) — removing or
    re-admitting one document can reshuffle every bin assignment in its
    shard but CANNOT affect any other shard, so the dirty unit is the
    shard, exactly as in `takedown_repack`: dirty shards = shards of
    deleted ∪ added docs; each is re-packed from its surviving
    (doc_id, n_tokens) rows ∪ the added rows by re-running the same
    deterministic first-fit (`packing._ffd_assigns` — the Arrow
    per-shard fold), then dynamic-partition-overwritten. Untouched
    shards are never read; determinism makes a same-list replay rewrite
    byte-identical logical content. ``added`` needs (doc_id, n_tokens);
    shard is re-derived from doc_id so callers can't desync the
    mapping.
    """
    from newsflow.curation import pack_shard_expr
    from newsflow.packing import _ffd_assigns

    if not fs_exists(spark, ffd_path):
        return {"deleted": 0, "added": 0, "partitions": 0}
    dels = F.broadcast(_key_frame(delete_ids, "doc_id"))
    packs = spark.read.parquet(ffd_path)
    shard_of = pack_shard_expr()

    dirty_del = packs.join(dels, "doc_id", "left_semi").select("shard")
    added_rows = None
    if added is not None:
        added_rows = added.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            shard_of.alias("shard"),
        ).localCheckpoint(eager=True)
        dirty_shards = {
            r[0]
            for r in dirty_del.union(added_rows.select("shard"))
            .distinct()
            .collect()
        }
    else:
        dirty_shards = {r[0] for r in dirty_del.distinct().collect()}
    if not dirty_shards:
        return {"deleted": 0, "added": 0, "partitions": 0}

    affected = packs.filter(F.col("shard").isin(list(dirty_shards)))
    kept = affected.join(dels, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "shard"
    )
    n_added = 0
    if added_rows is not None:
        adds = added_rows.filter(F.col("shard").isin(list(dirty_shards)))
        n_added = adds.count()
        # Upsert semantics for same-takedown-id replay, as in
        # `takedown_repack`.
        kept = kept.join(
            F.broadcast(adds.select("doc_id")), "doc_id", "left_anti"
        ).unionByName(adds)
    rebuilt = _ffd_assigns(kept).localCheckpoint(eager=True)
    n_deleted = affected.join(dels, "doc_id", "left_semi").count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt.write.mode("overwrite").partitionBy("shard").parquet(
            ffd_path
        )
        emptied = dirty_shards - {
            r[0] for r in rebuilt.select("shard").distinct().collect()
        }
        for p in emptied:
            (
                rebuilt.filter(F.lit(False))
                .drop("shard")
                .write.mode("overwrite")
                .parquet(f"{ffd_path}/shard={p}")
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(ffd_path)
    return {
        "deleted": int(n_deleted),
        "added": int(n_added),
        "partitions": len(dirty_shards),
    }


#: Reserved hive-partition value the maintenance pass merges settled
#: tombstone/drop-log batches into. Negative, so it can never collide
#: with an ingest batch id or a takedown id (TAKEDOWN_BATCH_BASE+).
COMPACTED_BATCH = -1


def _compact_batch_partitions(
    spark: SparkSession,
    path: str,
    settled_before: int,
    min_partitions: int = 2,
) -> dict[str, int]:
    """Merge every hive ``batch=<id>`` partition with id <
    ``settled_before`` (plus any prior compaction output) into the
    single reserved ``batch={COMPACTED_BATCH}`` partition, then delete
    the merged directories. Rows are projected off their batch column
    and made distinct — both consumers of these tables (the re-election
    candidate lookup and `_purge_drop_log`) read set semantics, never
    per-batch provenance.

    Crash safety: the merged rows are materialized (localCheckpoint)
    BEFORE the compacted partition is overwritten (the plan reads the
    partition it replaces — the standing replay-safety rule), and the
    write lands before any source directory is deleted; a crash between
    the two leaves duplicate rows across partitions, which distinct()
    semantics absorb and the next maintenance pass re-merges.

    The ``settled_before`` watermark is the caller's promise that no
    takedown/ingest with a smaller batch id can ever replay (e.g. the
    streaming checkpoint's committed offset): partitions at or above it
    are left alone so the per-batch ``batch != id`` replay exclusions
    in the ingest/takedown paths keep working. Directory deletion goes
    through the Hadoop FileSystem API so the same code maintains
    file://, s3a:// or hdfs:// lakes.
    """
    # Existence check + partition listing via the path's own Hadoop
    # FileSystem (newsflow.fs) — os.path.exists silently no-ops on
    # s3a:// / hdfs:// URIs, which would disable compaction entirely
    # on object-store lakes.
    if not fs_exists(spark, path):
        return {"merged_partitions": 0, "rows": 0}
    # Enumerate partitions from the FILESYSTEM, not from row values: a
    # partition the PII purge emptied (explicit empty-parquet tombstone
    # dir) has no rows to list a batch id from, yet is exactly the
    # listing debris this maintenance exists to clear.
    batches = []
    for name in fs_list_subdirs(spark, path, "batch="):
        b = int(name.split("=", 1)[1])
        if b < settled_before:
            batches.append(b)
    if len(batches) < min_partitions:
        return {"merged_partitions": 0, "rows": 0}
    df = spark.read.parquet(path)
    settled = df.filter(F.col("batch") < F.lit(settled_before))
    merged = (
        settled.drop("batch").distinct().coalesce(1).localCheckpoint(
            eager=True
        )
    )
    merged.write.mode("overwrite").parquet(
        f"{path}/batch={COMPACTED_BATCH}"
    )
    for b in batches:
        if b != COMPACTED_BATCH:
            fs_delete(spark, f"{path}/batch={b}")
    spark.catalog.refreshByPath(path)
    return {
        "merged_partitions": len(batches),
        "rows": merged.count(),
    }


def takedown_maintenance(
    spark: SparkSession,
    index_dir: str,
    *,
    settled_before_batch: int,
    min_partitions: int = 2,
) -> dict[str, int]:
    """Bound the two per-batch-forever partition families the takedown
    machinery grows: ``{index_dir}/tombstones`` (one partition per
    takedown) and ``{index_dir}/drops`` (one per ingest batch AND per
    takedown's re-election). Without this, a corpus ingesting thousands
    of micro-batches pays O(batches) file-listing on EVERY re-election
    candidate lookup and tombstone-union scan — the classic small-files
    decay `ops/layout.py::compact_files` exists for, here in its
    hive-partition form with the replay-safety watermark this module's
    invariants require (see `_compact_batch_partitions`).

    Semantics preserved exactly: re-election reads the tombstone UNION
    and the drop log's (doc_id, matched_doc_id) SET — both invariant
    under merge+distinct. Retention-by-age (dropping old drop-log rows
    outright) is deliberately NOT done here: a drop row is the only
    pointer from a deleted keeper to its re-admissible orphans, so
    discarding it silently weakens future takedowns; PII removal
    already prunes the rows that must go (`_purge_drop_log`).

    Returns per-family merged-partition and surviving-row counts.
    """
    t = _compact_batch_partitions(
        spark,
        os.path.join(index_dir, "tombstones"),
        settled_before_batch,
        min_partitions,
    )
    d = _compact_batch_partitions(
        spark,
        os.path.join(index_dir, "drops"),
        settled_before_batch,
        min_partitions,
    )
    return {
        "tombstone_partitions_merged": t["merged_partitions"],
        "tombstone_rows": t["rows"],
        "drop_partitions_merged": d["merged_partitions"],
        "drop_rows": d["rows"],
    }


def _purge_drop_log(
    spark: SparkSession, drops_dir: str, dels: DataFrame
) -> int:
    """Remove every drop-log row that references a deleted doc on
    EITHER side (the dropped doc or its matched partner) — the
    two-column form `takedown_partitioned` can't express. Same
    partition-pruned recipe: find dirty batch partitions with a
    column-pruned scan, rewrite only those, tombstone emptied ones."""
    dels_b = F.broadcast(dels)
    log = spark.read.parquet(drops_dir)
    hit = log.join(dels_b, "doc_id", "left_semi").select("batch").union(
        log.join(
            dels_b.select(F.col("doc_id").alias("matched_doc_id")),
            "matched_doc_id",
            "left_semi",
        ).select("batch")
    )
    dirty = [r[0] for r in hit.distinct().collect()]
    if not dirty:
        return 0
    affected = log.filter(F.col("batch").isin(dirty))
    kept = (
        affected.join(dels_b, "doc_id", "left_anti")
        .join(
            dels_b.select(F.col("doc_id").alias("matched_doc_id")),
            "matched_doc_id",
            "left_anti",
        )
        .localCheckpoint(eager=True)
    )
    n_purged = affected.count() - kept.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy("batch").parquet(drops_dir)
        emptied = set(dirty) - {
            r[0] for r in kept.select("batch").distinct().collect()
        }
        for p in emptied:
            (
                kept.filter(F.lit(False))
                .drop("batch")
                .write.mode("overwrite")
                .parquet(f"{drops_dir}/batch={p}")
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(drops_dir)
    return int(n_purged)


def corpus_takedown(
    spark: SparkSession,
    delete_ids: DataFrame,
    *,
    out_dir: str,
    index_dir: str,
    takedown_id: int,
    raw_docs: DataFrame | None = None,
    codes_path: str | None = None,
    packs_path: str | None = None,
    ffd_packs_path: str | None = None,
    embeddings: DataFrame | None = None,
    pq_codebooks: dict | None = None,
    pq_perm: list[int] | None = None,
    graph_edges_path: str | None = None,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> dict[str, int]:
    """Propagate one delete-list through every derived artifact.

    Steps, in dependency order:

    1. delete from the survivor corpus (``out_dir``) and both MinHash
       index tables (``index_dir``/sigs, /arrays) — partition-pruned;
    2. **keeper re-election** (only when ``raw_docs``, the retained raw
       ingest layer, is supplied): candidates = raw ∖ current survivors
       ∖ delete-list, pushed through `neardup_apply_batch` under
       ``batch=takedown_id`` — batch-internal greedy collapse, probe of
       the post-delete index, survivors + their signatures appended;
    3. delete from the vector code table (``codes_path``) — and, when
       ``embeddings`` (vec_id = doc_id rows for at least the raw layer)
       and ``pq_codebooks`` (the stored `subspace_fit` codebook dict)
       are supplied, RE-ENCODE the re-elected docs' vectors against the
       existing codebooks (no refit — the `pq_encode_new_vectors`
       append path) and upsert their code rows, so codes(vec_ids)
       tracks the survivor set exactly; for an OPQ-coded table pass
       ``pq_perm`` (the stored rotation, `sim.opq`) and vectors are
       permuted before assignment — rotation is index state, never
       re-learned here;
    4. rebuild dirty shards of the packing table (``packs_path``),
       dropping deleted docs and inserting re-elected ones;
    5. rebuild dirty shards of the FFD pack table (``ffd_packs_path``,
       the `packing.persist_ffd_packs` artifact) via
       `takedown_repack_ffd` — deterministic per-shard re-pack over
       survivors ∪ re-elected;
    6. update the persisted NSW ANN graph (``graph_edges_path``):
       zero-trace edge delete + deleted-hub bridge repair, then the
       no-rebuild insert of re-elected vectors — the graph twin of
       the codes step; on the bucketed-by-src layout only the touched
       bucket partitions rewrite (see `sim.nsw.nsw_takedown_update`).

    ``takedown_id`` must be unique per logical takedown (it namespaces
    the re-election output partition) but a crashed run may be REPLAYED
    with the same id: candidate computation excludes ``batch=
    takedown_id`` from the survivor set, and `neardup_apply_batch`
    excludes it from the index probe, so the replay recomputes and
    rewrites the identical partition. Returns per-artifact counts.

    **Tombstones.** Every takedown appends its delete-list to
    ``{index_dir}/tombstones/batch=<takedown_id>`` and re-election
    candidates exclude the UNION of all stored tombstones — without
    this, a LATER takedown would re-elect docs a PREVIOUS takedown
    deleted (they still exist in the raw layer, they're absent from the
    survivor set, and only the current delete-list excludes them): the
    zombie-resurrection hole every deletion system with a retained raw
    layer must close. Tombstones are takedown-list-sized, broadcast in
    the exclusion join, and the partitioned layout makes the write
    idempotent under same-id replay.
    """
    from newsflow.functions.text import tokens_expr
    from newsflow.streaming.ingest import neardup_apply_batch

    dels = _key_frame(delete_ids, "doc_id").localCheckpoint(eager=True)
    audit = {
        "corpus_deleted": takedown_partitioned(
            spark, out_dir, dels, partition_col="batch"
        )["deleted"],
        "index_sigs_deleted": takedown_partitioned(
            spark, os.path.join(index_dir, "sigs"), dels,
            partition_col="batch",
        )["deleted"],
        "index_arrays_deleted": takedown_partitioned(
            spark, os.path.join(index_dir, "arrays"), dels,
            partition_col="batch",
        )["deleted"],
        "reelected": 0,
    }
    tombstones_dir = os.path.join(index_dir, "tombstones")
    dels.write.mode("overwrite").parquet(
        os.path.join(tombstones_dir, f"batch={takedown_id}")
    )

    reelected_docs = None
    # Re-election needs an existing survivor corpus: with no out_dir
    # there is nothing to have lost to — takedown on an empty corpus is
    # just the tombstone write above.
    if raw_docs is not None and fs_exists(spark, out_dir):
        survivors_now = (
            spark.read.parquet(out_dir)
            .filter(F.col("batch") != F.lit(takedown_id))
            .select("doc_id")
        )
        all_tombstones = (
            spark.read.parquet(tombstones_dir).select("doc_id").distinct()
        )
        base = raw_docs
        drops_dir = os.path.join(index_dir, "drops")
        if fs_exists(spark, drops_dir):
            # DROP-LOG fast path: only docs that were dropped FOR a
            # now-deleted partner can possibly be re-elected (a doc
            # with any surviving recorded match re-fails the index
            # probe immediately). The log lookup is one column-pruned
            # scan semi-joined against the broadcast delete-list —
            # delete-list-proportional output — where the fallback
            # below anti-joins the ENTIRE raw layer. Completeness
            # holds because `neardup_apply_batch` logs every drop
            # decision, including re-election batches' own internal
            # collapses (so transitive chains — delete A, re-elect B,
            # later delete B, re-elect C — stay discoverable).
            cand_ids = (
                spark.read.parquet(drops_dir)
                # Replay safety: this takedown's OWN drops partition
                # (written by a prior attempt of the same id) is this
                # run's output, not history — and `neardup_apply_batch`
                # will overwrite it mid-run, so it must never be in the
                # candidate plan's lineage (partition-pruned out here).
                .filter(F.col("batch") != F.lit(takedown_id))
                .join(
                    F.broadcast(
                        dels.select(
                            F.col("doc_id").alias("matched_doc_id")
                        )
                    ),
                    "matched_doc_id",
                    "left_semi",
                )
                .select("doc_id")
                .distinct()
            )
            base = raw_docs.join(cand_ids, "doc_id", "left_semi")
        # Materialize before the apply: the apply rewrites the very
        # partitions (out/, drops/, index batch=takedown_id) this plan
        # reads, and a lazy re-execution after those writes would read
        # replaced files.
        candidates = (
            base.join(
                F.broadcast(all_tombstones), "doc_id", "left_anti"
            )
            .join(survivors_now, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        neardup_apply_batch(
            spark,
            candidates,
            takedown_id,
            index_dir=index_dir,
            out_dir=out_dir,
            n=n,
            threshold=threshold,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        )
        reelect_path = os.path.join(out_dir, f"batch={takedown_id}")
        if fs_exists(spark, reelect_path):
            reelected_docs = (
                spark.read.parquet(reelect_path)
                .select(
                    "doc_id",
                    F.size(tokens_expr("text")).cast("long").alias(
                        "n_tokens"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            audit["reelected"] = reelected_docs.count()

    # PII scrub of the drop log: a takedown must remove the deleted
    # docs' identifiers from EVERY stored table, including history —
    # rows naming a deleted doc on either side are purged
    # (partition-pruned, like every delete here). Safe for future
    # re-elections because this runs AFTER the re-election apply: any
    # candidate that failed re-verification just had its CURRENT
    # blockers freshly logged under batch=takedown_id, so the purged
    # rows carry no information a later takedown still needs.
    drops_dir = os.path.join(index_dir, "drops")
    if fs_exists(spark, drops_dir):
        audit["drop_log_purged"] = _purge_drop_log(spark, drops_dir, dels)

    if codes_path is not None:
        del_vecs = dels.select(F.col("doc_id").alias("vec_id"))
        reencoded = None
        if (
            reelected_docs is not None
            and embeddings is not None
            and pq_codebooks is not None
        ):
            # Re-encode the re-elected docs' vectors against the STORED
            # codebooks — the no-refit append path of a production PQ
            # index (`pq_encode_new_vectors`). Upsert semantics: the
            # re-elected vec_ids join the delete pass below (on a first
            # run they aren't in the table — they were dropped docs; on
            # a same-id replay this replaces the rows the prior attempt
            # appended), then the fresh codes append. Cost is
            # re-elected-batch-local: assignment is row-local against
            # the broadcast codebook literal, no corpus scan.
            from newsflow.sim.pq import _assign_codes, _unit

            re_ids = reelected_docs.select(
                F.col("doc_id").alias("vec_id")
            )
            units = _unit(
                embeddings.join(
                    F.broadcast(re_ids), "vec_id", "left_semi"
                ),
                "vec_id",
            )
            if pq_perm is not None:
                # OPQ-coded table: apply the STORED rotation (the
                # permutation the codebooks were fit under) before
                # assignment — the rotation is index state, never
                # re-learned here (sim/opq.py).
                from newsflow.sim.opq import permute_expr

                units = units.select(
                    "vec_id", permute_expr(pq_perm).alias("u")
                )
            # Geometry is read off the codebook dict itself, so any
            # `subspace_fit` parameterization round-trips unchanged.
            n_subs = 1 + max(s for s, _ in pq_codebooks)
            k = 1 + max(c for _, c in pq_codebooks)
            dsub = len(next(iter(pq_codebooks.values())))
            reencoded = (
                _assign_codes(units, pq_codebooks, n_subs, dsub, k)
                .select(
                    "vec_id",
                    F.expr(
                        "array_join(transform(codes,"
                        " c -> cast(c as string)), '-')"
                    ).alias("code_string"),
                )
                .localCheckpoint(eager=True)
            )
            del_vecs = del_vecs.union(re_ids).distinct()
        audit["codes_deleted"] = takedown_partitioned(
            spark,
            codes_path,
            del_vecs,
            key="vec_id",
            partition_col=None,
        )["deleted"]
        if reencoded is not None:
            reencoded.write.mode("append").parquet(codes_path)
            spark.catalog.refreshByPath(codes_path)
            audit["codes_reencoded"] = reencoded.count()
    if packs_path is not None:
        rp = takedown_repack(spark, packs_path, dels, added=reelected_docs)
        audit["packs_deleted"] = rp["deleted"]
        audit["packs_added"] = rp["added"]
        audit["packs_dirty_shards"] = rp["partitions"]
    if ffd_packs_path is not None:
        rf = takedown_repack_ffd(
            spark, ffd_packs_path, dels, added=reelected_docs
        )
        audit["ffd_deleted"] = rf["deleted"]
        audit["ffd_added"] = rf["added"]
        audit["ffd_dirty_shards"] = rf["partitions"]
    if graph_edges_path is not None:
        from newsflow.sim.nsw import nsw_takedown_update

        gr = nsw_takedown_update(
            spark,
            graph_edges_path,
            dels.select(F.col("doc_id").alias("vec_id")),
            embeddings=embeddings,
            reelected_ids=(
                reelected_docs.select(
                    F.col("doc_id").alias("vec_id")
                )
                if reelected_docs is not None
                else None
            ),
        )
        audit["graph_edges_removed_net"] = gr["edges_removed_net"]
        audit["graph_nodes_inserted"] = gr["inserted"]
    return audit


# ---------------------------------------------------------------------------
# Oracled audit query: the SEMANTIC contract of takedown, replayed by
# DuckDB from the base tables. The physical operator above is tested
# against planted artifacts (tests/test_takedown.py); this query pins
# the batch-mode meaning of "takedown + keeper re-election" so both
# engines agree on WHAT the post-delete state must be.
# ---------------------------------------------------------------------------

#: Deterministic planted delete-list, derivable in any engine: every
#: even-id KEEPER side of a near-dup pair (forces re-election of the
#: losers that matched only deleted keepers) plus every 97th doc
#: (plain rows with no dup involvement — the untouched-partition case).
#: Delete-rule constants, interpolated into BOTH the Spark builders and
#: the SQL oracles (takedown audit + streaming cascade) — the
#: builder/oracle drift guard ADVICE r6 asked for on this pattern.
DEL_KEEPER_MOD = 2   # even-id keeper side of a near-dup pair
DEL_PLAIN_EVERY = 97  # every 97th doc: plain rows, no dup involvement

_TAKEDOWN_DEL_SQL = f"""
  SELECT DISTINCT doc_a AS doc_id FROM pairs
  WHERE doc_a % {DEL_KEEPER_MOD} = 0
  UNION
  SELECT doc_id FROM documents WHERE doc_id % {DEL_PLAIN_EVERY} = 0
"""


@register(
    "corpus_takedown_audit",
    oracle=f"""
    WITH sh AS ({sql_shingles_rel(n=3)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    del AS ({_TAKEDOWN_DEL_SQL}),
    survivors AS (
      SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM del)
    ),
    losers_before AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
    pairs_after AS (
      SELECT * FROM pairs
      WHERE doc_a NOT IN (SELECT doc_id FROM del)
        AND doc_b NOT IN (SELECT doc_id FROM del)
    ),
    losers_after AS (SELECT DISTINCT doc_b AS doc_id FROM pairs_after),
    reelected AS (
      SELECT doc_id FROM losers_before
      WHERE doc_id NOT IN (SELECT doc_id FROM losers_after)
        AND doc_id NOT IN (SELECT doc_id FROM del)
    )
    SELECT 'deleted_docs' AS metric, count(*)::BIGINT AS value FROM del
    UNION ALL SELECT 'docs_after', count(*)::BIGINT FROM survivors
    UNION ALL SELECT 'pairs_before', count(*)::BIGINT FROM pairs
    UNION ALL SELECT 'pairs_after', count(*)::BIGINT FROM pairs_after
    UNION ALL SELECT 'losers_before', count(*)::BIGINT FROM losers_before
    UNION ALL SELECT 'losers_after', count(*)::BIGINT FROM losers_after
    UNION ALL SELECT 'reelected_keepers', count(*)::BIGINT FROM reelected
    UNION ALL SELECT 'keepers_after',
      (SELECT count(*) FROM survivors)::BIGINT
      - (SELECT count(*) FROM losers_after)::BIGINT
    UNION ALL SELECT 'deleted_traces_after', count(*)::BIGINT FROM del
      WHERE doc_id IN (SELECT doc_id FROM survivors)
    UNION ALL SELECT 'survivor_checksum',
      sum(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 8))
          ::BIGINT)::BIGINT
      FROM survivors
    UNION ALL SELECT 'dirty_pack_shards',
      count(DISTINCT {sql_pack_shard()})
      ::BIGINT FROM del
    UNION ALL SELECT 'pack_tokens_after',
      sum(len({sql_tokens()}))::BIGINT FROM survivors
    """,
    tags=("curation", "takedown", "dedup"),
)
def corpus_takedown_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode takedown semantics, audited end to end for a planted
    deterministic delete-list (every even-id near-dup keeper + every
    97th doc): corpus/pair/loser counts before and after, the count of
    RE-ELECTED keepers (losers whose every matching keeper was
    deleted), a zero-trace check derived as an actual intersection (not
    asserted by construction), an md5 checksum over every surviving
    (doc_id, text) — the untouched-rows-byte-identical proxy both
    engines must reproduce — and the dirty-shard / token totals the
    repack step must land on.

    Scale shape: ONE cached shingle projection feeds the pair
    self-join (the only expensive stage, shared with the other dedup
    audits via `_shared_shingle_arrays`); the pair table is
    materialized once (`localCheckpoint`) and re-filtered for the
    before/after views; the delete-list and loser sets are
    pair-bounded, so every join against them broadcasts. The survivor
    scan runs once, computing count + checksum + token total in a
    single aggregate.
    """
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    from newsflow.dedup import core
    from newsflow.dedup.queries import _shared_shingle_arrays
    from newsflow.functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    arrays = _shared_shingle_arrays(spark, sf_dir)
    pairs = (
        core.jaccard_pairs_from_arrays(arrays, threshold=0.8)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    dels = (
        pairs.filter(F.col("doc_a") % DEL_KEEPER_MOD == 0)
        .select(F.col("doc_a").alias("doc_id"))
        .union(
            docs.filter(F.col("doc_id") % DEL_PLAIN_EVERY == 0).select(
                "doc_id"
            )
        )
        .distinct()
    )
    dels_b = F.broadcast(dels)
    survivors = docs.join(dels_b, "doc_id", "left_anti")
    losers_before = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    pairs_after = pairs.join(
        dels_b.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_anti"
    ).join(
        dels_b.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_anti"
    )
    losers_after = pairs_after.select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    reelected = losers_before.join(losers_after, "doc_id", "left_anti").join(
        dels_b, "doc_id", "left_anti"
    )

    checksum_term = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "text")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    surv_agg = survivors.agg(
        F.count(F.lit(1)).alias("docs_after"),
        F.sum(checksum_term).alias("survivor_checksum"),
        F.sum(F.size(tokens_expr("text")).cast("long")).alias(
            "pack_tokens_after"
        ),
    )
    del_agg = dels.agg(
        F.count(F.lit(1)).alias("deleted_docs"),
        F.countDistinct(pack_shard_expr()).alias("dirty_pack_shards"),
    )
    traces = dels.join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("deleted_traces_after"))

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    wide = (
        surv_agg.crossJoin(del_agg)
        .crossJoin(_cnt(pairs, "pairs_before"))
        .crossJoin(_cnt(pairs_after, "pairs_after"))
        .crossJoin(_cnt(losers_before, "losers_before"))
        .crossJoin(_cnt(losers_after, "losers_after"))
        .crossJoin(_cnt(reelected, "reelected_keepers"))
        .crossJoin(traces)
    )
    metrics = [
        "deleted_docs",
        "docs_after",
        "pairs_before",
        "pairs_after",
        "losers_before",
        "losers_after",
        "reelected_keepers",
        "deleted_traces_after",
        "survivor_checksum",
        "dirty_pack_shards",
        "pack_tokens_after",
    ]
    stack = ", ".join(
        f"'{m}', cast({m} as bigint)" for m in metrics
    ) + ", 'keepers_after', cast(docs_after - losers_after as bigint)"
    return wide.selectExpr(
        f"stack({len(metrics) + 1}, {stack}) as (metric, value)"
    )


def _ffd_oracle_sql() -> str:
    """Oracle for `corpus_takedown_ffd_audit`: replay the planted
    delete-list + keeper re-election semantics, then replay FFD packing
    (the recursive-CTE fold from packing.py) over the keeper set BEFORE
    and AFTER the takedown, and compare clean-shard assignments
    directly."""
    from newsflow.curation import SEQ_LEN
    from newsflow.packing import sql_ffd_ctes

    chk = (
        "('0x' || substr(md5(shard::VARCHAR || ':' || doc_id::VARCHAR"
        " || ':' || bin_idx::VARCHAR), 1, 8))::BIGINT"
    )
    return f"""
    WITH RECURSIVE sh AS ({sql_shingles_rel(n=3)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    del AS ({_TAKEDOWN_DEL_SQL}),
    losers_before AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
    pairs_after AS (
      SELECT * FROM pairs
      WHERE doc_a NOT IN (SELECT doc_id FROM del)
        AND doc_b NOT IN (SELECT doc_id FROM del)
    ),
    losers_after AS (SELECT DISTINCT doc_b AS doc_id FROM pairs_after),
    keepers_before AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM losers_before)
    ),
    keepers_after AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM del)
        AND doc_id NOT IN (SELECT doc_id FROM losers_after)
    ),
    reelected AS (
      SELECT doc_id FROM keepers_after
      WHERE doc_id NOT IN (SELECT doc_id FROM keepers_before)
    ),
    dirty AS (
      SELECT DISTINCT {sql_pack_shard()} AS shard FROM (
        SELECT doc_id FROM del
        WHERE doc_id IN (SELECT doc_id FROM keepers_before)
        UNION ALL SELECT doc_id FROM reelected
      )
    ),
    toks_b AS (
      SELECT doc_id, len({sql_tokens()}) AS n_tokens,
             {sql_pack_shard()} AS shard
      FROM documents
      WHERE doc_id IN (SELECT doc_id FROM keepers_before)
    ),
    toks_a AS (
      SELECT doc_id, len({sql_tokens()}) AS n_tokens,
             {sql_pack_shard()} AS shard
      FROM documents
      WHERE doc_id IN (SELECT doc_id FROM keepers_after)
    ),
    {sql_ffd_ctes("toks_b", "b")},
    {sql_ffd_ctes("toks_a", "a")},
    aseqs AS (
      SELECT shard, bin_idx, sum(n_tokens) AS st
      FROM aassigns GROUP BY 1, 2
    ),
    achk AS (
      SELECT count(*)::BIGINT AS packed_docs_after,
             sum({chk})::BIGINT AS assign_checksum_after,
             sum(CASE WHEN shard NOT IN (SELECT shard FROM dirty)
                 THEN {chk} ELSE 0 END)::BIGINT AS clean_after
      FROM aassigns
    ),
    bchk AS (
      SELECT sum(CASE WHEN shard NOT IN (SELECT shard FROM dirty)
                 THEN {chk} ELSE 0 END)::BIGINT AS clean_before
      FROM bassigns
    )
    SELECT 'deleted_docs' AS metric, count(*)::BIGINT AS value FROM del
    UNION ALL SELECT 'reelected_keepers', count(*)::BIGINT FROM reelected
    UNION ALL SELECT 'packed_docs_after', packed_docs_after FROM achk
    UNION ALL SELECT 'dirty_ffd_shards', count(*)::BIGINT FROM dirty
    UNION ALL SELECT 'ffd_seqs_after', count(*)::BIGINT FROM aseqs
    UNION ALL SELECT 'ffd_padded_after',
      CAST(sum(greatest(0, {SEQ_LEN} - st)) AS BIGINT) FROM aseqs
    UNION ALL SELECT 'assign_checksum_after', assign_checksum_after
      FROM achk
    UNION ALL SELECT 'clean_shard_drift',
      (SELECT clean_after FROM achk) - (SELECT clean_before FROM bchk)
    """


@register(
    "corpus_takedown_ffd_audit",
    oracle=_ffd_oracle_sql(),
    tags=("curation", "takedown", "packing"),
)
def corpus_takedown_ffd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown propagation through the FFD pack table, audited
    semantically: for the planted delete-list (same rule as
    `corpus_takedown_audit`), the post-takedown packed universe is the
    keeper set AFTER deletion + re-election, and the FFD layout over it
    must (a) land on exact sequence/padding totals, (b) hash to an
    exact per-assignment checksum, and (c) be IDENTICAL to the
    pre-takedown layout on every clean shard — ``clean_shard_drift``
    is computed as an actual before/after checksum difference (both
    engines re-pack both states), not asserted by construction. The
    physical dirty-shard rebuild (`takedown_repack_ffd`) is pinned to
    this semantics by tests/test_takedown.py, which also asserts
    untouched shard partitions stay byte-identical on disk.

    Scale shape: the pair stage reuses the shared cached shingle
    projection; every keeper/delete set join broadcasts (pair-bounded);
    the two FFD re-packs move only (doc_id, n_tokens, shard) ints
    through the Arrow per-shard fold — text is read once for
    tokenization and never shuffled."""
    from newsflow.curation import SEQ_LEN
    from newsflow.dedup import core
    from newsflow.dedup.queries import _shared_shingle_arrays
    from newsflow.functions.text import tokens_expr
    from newsflow.packing import _ffd_assigns

    docs = load_table(spark, sf_dir, "documents")
    arrays = _shared_shingle_arrays(spark, sf_dir)
    pairs = (
        core.jaccard_pairs_from_arrays(arrays, threshold=0.8)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    dels = (
        pairs.filter(F.col("doc_a") % DEL_KEEPER_MOD == 0)
        .select(F.col("doc_a").alias("doc_id"))
        .union(
            docs.filter(F.col("doc_id") % DEL_PLAIN_EVERY == 0).select(
                "doc_id"
            )
        )
        .distinct()
    )
    dels_b = F.broadcast(dels)
    losers_before = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    pairs_after = pairs.join(
        dels_b.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_anti"
    ).join(
        dels_b.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_anti"
    )
    losers_after = pairs_after.select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    reelected = losers_before.join(
        F.broadcast(losers_after), "doc_id", "left_anti"
    ).join(dels_b, "doc_id", "left_anti")

    toks = docs.select(
        "doc_id",
        F.size(tokens_expr("text")).cast("long").alias("n_tokens"),
        pack_shard_expr().alias("shard"),
    ).localCheckpoint(eager=True)
    toks_before = toks.join(
        F.broadcast(losers_before), "doc_id", "left_anti"
    )
    toks_after = toks.join(dels_b, "doc_id", "left_anti").join(
        F.broadcast(losers_after), "doc_id", "left_anti"
    )
    dirty = (
        toks_before.join(dels_b, "doc_id", "left_semi")
        .select("shard")
        .union(
            toks.join(F.broadcast(reelected), "doc_id", "left_semi").select(
                "shard"
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    assigns_a = _ffd_assigns(
        toks_after.select("doc_id", "n_tokens", "shard")
    ).localCheckpoint(eager=True)
    assigns_b = _ffd_assigns(toks_before.select("doc_id", "n_tokens", "shard"))

    chk = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("shard").cast("string"),
                    F.col("doc_id").cast("string"),
                    F.col("bin_idx").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    dirty_flag = F.broadcast(dirty.withColumn("d", F.lit(1)))
    a_agg = assigns_a.join(dirty_flag, "shard", "left").agg(
        F.count(F.lit(1)).alias("packed_docs_after"),
        F.sum(chk).alias("assign_checksum_after"),
        F.sum(F.when(F.col("d").isNull(), chk).otherwise(F.lit(0))).alias(
            "clean_after"
        ),
    )
    b_agg = assigns_b.join(dirty_flag, "shard", "left").agg(
        F.sum(F.when(F.col("d").isNull(), chk).otherwise(F.lit(0))).alias(
            "clean_before"
        )
    )
    seq_agg = (
        assigns_a.groupBy("shard", "bin_idx")
        .agg(F.sum("n_tokens").alias("st"))
        .agg(
            F.count(F.lit(1)).alias("ffd_seqs_after"),
            F.sum(F.greatest(F.lit(0), SEQ_LEN - F.col("st")))
            .cast("long")
            .alias("ffd_padded_after"),
        )
    )
    wide = (
        dels.agg(F.count(F.lit(1)).alias("deleted_docs"))
        .crossJoin(reelected.agg(F.count(F.lit(1)).alias("reelected_keepers")))
        .crossJoin(dirty.agg(F.count(F.lit(1)).alias("dirty_ffd_shards")))
        .crossJoin(a_agg)
        .crossJoin(b_agg)
        .crossJoin(seq_agg)
    )
    metrics = [
        "deleted_docs",
        "reelected_keepers",
        "packed_docs_after",
        "dirty_ffd_shards",
        "ffd_seqs_after",
        "ffd_padded_after",
        "assign_checksum_after",
    ]
    stack = ", ".join(f"'{m}', cast({m} as bigint)" for m in metrics) + (
        ", 'clean_shard_drift',"
        " cast(clean_after - clean_before as bigint)"
    )
    return wide.selectExpr(
        f"stack({len(metrics) + 1}, {stack}) as (metric, value)"
    )


TAKEDOWN_BATCH_BASE = 10_000_000_000


def takedown_stream(
    spark: SparkSession,
    delete_stream: DataFrame,
    *,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    raw_docs: DataFrame | None = None,
    codes_path: str | None = None,
    packs_path: str | None = None,
    ffd_packs_path: str | None = None,
    embeddings: DataFrame | None = None,
    pq_codebooks: dict | None = None,
    pq_perm: list[int] | None = None,
    graph_edges_path: str | None = None,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    rows_per_band: int = 2,
):
    """STREAMING takedown — the deployment form of `corpus_takedown`,
    and the exact inverse of `neardup_ingest_stream`: a stream of
    delete-lists (doc_id rows — the queue a legal/PII intake process
    feeds) drains through ``foreachBatch``, each micro-batch running
    one full takedown (corpus + index + codes + packs + graph +
    re-election) under ``takedown_id = TAKEDOWN_BATCH_BASE + batch_id``.
    The signature mirrors `corpus_takedown`'s artifact parameters
    exactly — in particular ``pq_perm`` (an OPQ-coded table re-encodes
    re-elected vectors under the stored rotation; omitting it against
    OPQ codes would silently write un-permuted code rows) and
    ``graph_edges_path`` (deletions propagate to the persisted NSW
    graph on the stream path just as on the batch path).

    The base offset keeps takedown partitions disjoint from ingest
    batch ids, so ingest and takedown streams can share one corpus
    layout. Exactly-once by the same argument as the ingest stream:
    at-least-once micro-batch delivery × an apply that is idempotent
    under same-takedown-id replay (partition-scoped overwrites,
    replay-safe candidate/probe exclusions, tombstone partition per
    batch) = exactly-once effect. Sequential-deletion correctness
    (takedown N must not resurrect takedown N-1's docs) is carried by
    the tombstone union — tests/test_takedown.py cascades two
    takedowns and asserts no zombie returns."""
    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        corpus_takedown(
            spark,
            batch,
            out_dir=out_dir,
            index_dir=index_dir,
            takedown_id=TAKEDOWN_BATCH_BASE + batch_id,
            raw_docs=raw_docs,
            codes_path=codes_path,
            packs_path=packs_path,
            ffd_packs_path=ffd_packs_path,
            embeddings=embeddings,
            pq_codebooks=pq_codebooks,
            pq_perm=pq_perm,
            graph_edges_path=graph_edges_path,
            n=n,
            threshold=threshold,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
        )

    return (
        delete_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
