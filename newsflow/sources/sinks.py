"""Sinks (SURVEY.md §2.1 S5-S7): parquet / CSV writers and the report
boundary.

The reference writes parquet via pandas/pyarrow on the driver
(build_datasets.py:114-115) and CSV via `toPandas().to_csv`
(nlp_analysis.py:168-169) — both single-process bottlenecks. Here every
write is a distributed `df.write`; only `collect_report` (S7, the
intentional report boundary for ≤top-k rows) moves data to the driver,
Arrow-accelerated.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    cluster_by: tuple[str, ...] = (),
    options: dict[str, str] | None = None,
) -> None:
    """S5 — distributed parquet write, optionally hive-partitioned so
    per-partition predicates become pruned scans at 100 TB.

    ``cluster_by`` sorts rows WITHIN each write task before encoding
    (``sortWithinPartitions`` — narrow, no shuffle): row groups then
    carry tight min/max statistics on the clustered columns, so point
    and range predicates skip whole row groups at scan time — the
    sub-partition pruning level (what table formats market as
    clustering/Z-ordering, in its single-column Spark-native form).

    When ``partition_by`` is also set, the file writer itself re-sorts
    each task's rows by the partition columns (to group rows per output
    file) — a sort that is NOT stable and would destroy a bare
    ``cluster_by`` order. Sorting by (*partition_by, *cluster_by) makes
    the writer's required ordering a prefix of ours, so it detects the
    rows are already ordered and the cluster order survives into each
    partition's files.
    """
    if cluster_by:
        df = df.sortWithinPartitions(*partition_by, *cluster_by)
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S6 — distributed CSV write (nlp_analysis.py:168-169 replacement)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def write_sample_csv(df: DataFrame, path: str, n: int = 200) -> None:
    """S6 — first-N sample export (build_datasets.py:117's head(200)),
    written by one task (coalesce(1)) since N is small by contract."""
    df.limit(n).coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def collect_report(df: DataFrame, max_rows: int = 10_000) -> pd.DataFrame:
    """S7 — the guarded report boundary: refuses silently-unbounded
    collects (the reference toPandas()'d whole tables)."""
    limited = df.limit(max_rows + 1).toPandas()
    if len(limited) > max_rows:
        raise ValueError(
            f"collect_report: result exceeds max_rows={max_rows}; "
            "aggregate or limit before collecting"
        )
    return limited


def write_orc(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Columnar alternative to parquet (built into Spark, no extra jars):
    same pushdown/pruning properties; some lakes standardize on ORC."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Distributed JSON-lines export — the interchange format training
    pipelines hand to tokenizer/inspection tooling. One JSON object per
    line per row; optional codec (e.g. ``gzip``) for cold storage."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Schema-explicit JSONL read-back (inference is a full extra pass at
    scale — callers pass the schema they wrote)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_single_parquet_file(
    df: DataFrame, dest: str, mtime: float | None = None
) -> None:
    """Write ``df`` as exactly ONE parquet file at ``dest`` (a file
    path, not a directory) — the staging helper behind micro-batch
    replay harnesses and testdata synthesis, where file-source semantics
    (one file = one trigger, ordered by mtime) need a real file per
    batch. coalesce(1) + stage-dir + move; optional explicit mtime so
    the streaming file source's oldest-first ordering is deterministic.

    Replay/synthesis tooling only: a production write is `write_parquet`
    (distributed, many files). LOCAL FILESYSTEM ONLY by contract — the
    stage/move/utime steps are os-level; a lake URI fails loudly here
    instead of silently half-working through os.path guards."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    scheme = dest.split("://", 1)[0] if "://" in dest else "file"
    if scheme != "file":
        raise ValueError(
            "write_single_parquet_file is a local-FS replay/synthesis "
            f"helper; got a {scheme}:// URI — use write_parquet for lake "
            "writes"
        )

    # Underscore-prefixed stage dir: Spark's file listings (including a
    # FileStreamSource actively watching dest's directory) skip _-prefixed
    # paths, so in-flight part files are never seen before the atomic
    # move publishes the finished file.
    stage = _os.path.join(
        _os.path.dirname(dest) or ".",
        "_stage_" + _os.path.basename(dest),
    )
    try:
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        parts = _glob.glob(_os.path.join(stage, "part-*.parquet"))
        if not parts:
            raise RuntimeError(
                f"write_single_parquet_file: write to {stage} produced no "
                "part file (zero-partition input frame?)"
            )
        if _os.path.exists(dest):
            _os.remove(dest)
        _shutil.move(parts[0], dest)
    finally:
        # Never leak a stage dir into the (possibly stream-watched)
        # destination directory, even on failure.
        _shutil.rmtree(stage, ignore_errors=True)
    if mtime is not None:
        _os.utime(dest, (mtime, mtime))
