"""MERGE (upsert/delete) into a partitioned parquet corpus WITHOUT a
table format — the consumer of `corpus_snapshot_diff`: apply a batch of
added/changed/removed documents to the stored corpus by rewriting ONLY
the partitions the batch touches.

Plain parquet has no row-level transaction log, so the unit of change
is the hive partition: the affected partition set is computed from the
batch's partition-column values (a tiny distinct over the batch — the
batch is incremental by definition), untouched partitions are never
read or written, and each touched partition is rebuilt as
(existing rows not keyed in the batch) ∪ (batch upserts). That is the
standard overwrite-by-partition idiom (`partitionOverwriteMode=dynamic`)
that Delta/Iceberg generalize to file granularity; at 100 TB with
day-partitioned corpora a daily merge rewrites one day, not the lake.

Crash semantics: Spark's dynamic partition overwrite stages each
partition's new files before swapping, so a failed merge leaves
untouched partitions intact; a retried merge is idempotent because the
result is a pure function of (target, batch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DELETE_COL = "_deleted"


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str,
    partition_col: str,
    check_key_moves: bool = True,
) -> dict[str, int]:
    """Apply ``batch`` to the parquet corpus at ``target_path``:

    - rows with ``_deleted = true`` remove the matching key
    - other rows upsert (replace the key's row, or insert it)

    Only partitions present in the batch's ``partition_col`` values are
    rewritten. Returns counts {"upserts", "deletes", "partitions"}.

    Constraint (documented AND asserted when ``check_key_moves``): a key
    must not move between partitions in a single batch — a move is a
    delete in the old partition plus an upsert in the new one, which the
    snapshot-diff producer emits as exactly that pair. The check is a
    left-semi join of the batch's keys against the key column of the
    UNTOUCHED partitions (column-pruned scan — at 100 TB this reads one
    dictionary-encoded key column, and partition stats/bloom filters cut
    it further); a hit means the batch references a key whose live row
    sits in a partition this merge will not rewrite, so the merge would
    either strand a stale duplicate (upsert) or silently no-op (delete).
    Violations raise before anything is written. Disable only when the
    producer is trusted (e.g. output of ``corpus_snapshot_diff``, which
    emits move pairs by construction).
    """
    has_delete = DELETE_COL in batch.columns
    if not has_delete:
        batch = batch.withColumn(DELETE_COL, F.lit(False))

    target_cols = set(
        spark.read.parquet(target_path).columns
    )
    missing = target_cols - set(batch.columns)
    if missing:
        raise ValueError(
            "merge batch is missing target columns "
            f"{sorted(missing)}: upserts must carry the full row "
            "(schema evolution is a separate, explicit migration, not "
            "an implicit merge side effect)"
        )

    touched = [
        r[0] for r in batch.select(partition_col).distinct().collect()
    ]
    # ONE validation pass over the batch (the batch plan may be an
    # unmaterialized computation — separate count/dup jobs would re-run
    # it once each, tripling per-micro-batch cost in streaming ingest):
    # per-key upsert/delete tallies, then a single driver row carrying
    # totals plus a ≤5-key sample of duplicate-upsert keys.
    #
    # A key may appear at most ONCE as a non-deleted row: two upserts of
    # the same key (same or different partitions — the upsert+upsert form
    # of a cross-partition move) would write the key twice, the exact
    # duplicate corruption this merge exists to prevent. A delete+upsert
    # pair for one key remains valid (that IS the move encoding).
    per_key = batch.groupBy(key).agg(
        F.count_if(~F.col(DELETE_COL)).alias("_ups"),
        F.count_if(F.col(DELETE_COL)).alias("_dels"),
    )
    summary = per_key.agg(
        F.sum("_ups").alias("n_upserts"),
        F.sum("_dels").alias("n_deletes"),
        # collect_list drops nulls, so only duplicate-upsert keys land
        # in the (batch-key-bounded) sample array.
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_ups") > 1, F.col(key))
                )
            ),
            1,
            5,
        ).alias("dup_sample"),
        # NULL keys are unmergeable: the left-anti replacement join never
        # matches NULL = NULL, so a NULL-key upsert can only APPEND (a
        # replay would then duplicate it), and the duplicate-upsert
        # sample above can't even name it (collect_list drops nulls).
        # per_key is grouped by key, so the NULL-key group is ONE row
        # here — sum its batch-row count (_ups + _dels) to report the
        # true number of offending rows, not the group count.
        F.coalesce(
            F.sum(
                F.when(
                    F.col(key).isNull(), F.col("_ups") + F.col("_dels")
                )
            ),
            F.lit(0),
        ).alias("n_null_keys"),
    ).first()
    if summary["n_null_keys"]:
        raise ValueError(
            f"merge batch contains {summary['n_null_keys']} row(s) with a "
            f"NULL {key!r} — NULL keys cannot be matched for replacement "
            "or deletion (NULL = NULL never joins); assign keys upstream "
            "or quarantine the rows"
        )
    if summary["dup_sample"]:
        raise ValueError(
            "merge batch upserts the same key more than once: "
            f"{list(summary['dup_sample'])} — a cross-partition move "
            "must be encoded as delete-in-old + upsert-in-new, and a "
            "same-partition double-upsert is ambiguous about which row "
            "wins"
        )
    n_deletes = int(summary["n_deletes"] or 0)
    n_upserts = int(summary["n_upserts"] or 0)

    target = spark.read.parquet(target_path)
    affected = target.filter(F.col(partition_col).isin(touched))
    batch_keys = batch.select(key).distinct()
    if check_key_moves:
        # Keys living OUTSIDE the touched partitions that this batch
        # references: each is a partition move (or a misrouted delete).
        moved = (
            batch_keys.join(
                target.filter(~F.col(partition_col).isin(touched)).select(key),
                key,
                "left_semi",
            )
            .limit(20)
            .collect()
        )
        if moved:
            sample = sorted(r[0] for r in moved)
            raise ValueError(
                f"merge batch moves key(s) across partitions: {sample[:5]} "
                "exist in partitions the batch does not touch. A move must "
                "be emitted as delete-in-old-partition + upsert-in-new "
                "(as corpus_snapshot_diff does); merging this batch as-is "
                "would strand stale duplicate rows."
            )
    survivors = affected.join(batch_keys, key, "left_anti")
    upserts = batch.filter(~F.col(DELETE_COL)).select(*target.columns)
    # Materialize BEFORE overwriting: the merged plan lazily reads the
    # very files the overwrite is about to replace; localCheckpoint cuts
    # the lineage to the source files (bounded — only the touched
    # partitions' survivors, not the corpus).
    merged = survivors.unionByName(upserts).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # Dynamic mode replaces ONLY the partitions present in `merged`.
        # A partition whose every row was deleted would vanish from
        # `merged` and thus survive stale — re-materialize it empty is
        # impossible in hive layout, so emit its tombstone by rewriting
        # it with zero rows via an explicit per-partition overwrite.
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
        emptied = set(touched) - {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        for p in emptied:
            # spark can't write an empty hive partition; drop its files
            # by overwriting the subdirectory with an empty frame.
            (
                merged.filter(F.lit(False))
                .drop(partition_col)
                .write.mode("overwrite")
                .parquet(f"{target_path}/{partition_col}={p}")
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
    spark.catalog.refreshByPath(target_path)
    return {
        "upserts": int(n_upserts),
        "deletes": int(n_deletes),
        "partitions": len(touched),
    }


def compact_partitions(
    spark: SparkSession,
    target_path: str,
    partition_col: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, int]:
    """Small-file compaction — the maintenance pass a merge-heavy corpus
    needs: every incremental ``merge_upsert`` writes its touched
    partitions with task-count granularity, so a hot partition
    accumulates files far smaller than a scan-efficient row group.

    Per partition with ≥ ``min_files`` files: rewrite to
    ceil(bytes / target_bytes) files via coalesce (a narrow, shuffle-free
    repack). Partitions already compact are not read or written — the
    same partition-pruning discipline as the merge itself. Returns
    {"partitions_compacted", "files_before", "files_after"}.
    """
    import math
    from pathlib import Path

    root = Path(target_path)
    work: list[tuple[str, int, int]] = []  # (partition value, files, bytes)
    for pdir in root.glob(f"{partition_col}=*"):
        files = list(pdir.glob("*.parquet"))
        if len(files) >= min_files:
            work.append(
                (
                    pdir.name.split("=", 1)[1],
                    len(files),
                    sum(f.stat().st_size for f in files),
                )
            )
    files_before = sum(n for _, n, _ in work)
    files_after = 0
    for value, _, nbytes in work:
        n_out = max(1, math.ceil(nbytes / target_bytes))
        part_path = f"{target_path}/{partition_col}={value}"
        df = spark.read.parquet(part_path).coalesce(n_out).localCheckpoint(
            eager=True
        )
        df.write.mode("overwrite").parquet(part_path)
        # Count the files actually on disk: coalesce(n_out) emits AT MOST
        # n_out files (empty/under-filled upstream partitions emit fewer),
        # so trusting the coalesce target would overstate the metric.
        files_after += len(list(Path(part_path).glob("*.parquet")))
    spark.catalog.refreshByPath(target_path)
    return {
        "partitions_compacted": len(work),
        "files_before": files_before,
        "files_after": files_after,
    }
