"""Data-layout operators: time clustering and small-file compaction.

At 100 TB the layout of data at rest decides scan cost before any query
runs — two maintenance operators every large lake needs:

* **Time clustering** (`write_time_clustered`) — ``repartitionByRange``
  on the event-time column plus a within-partition sort before writing.
  Each output file then covers a narrow, non-overlapping time range, so
  parquet row-group min/max statistics let ANY later time-range
  predicate skip whole files/row groups at scan time — the poor man's
  time index, with zero read-path machinery (the reader is still plain
  ``spark.read.parquet``). Range partitioning samples the column, so
  output files are balanced even when event volume is bursty — a plain
  ``partitionBy(day)`` hive layout would put 100x more data in a burst
  day's directory.

* **Compaction** (`compact_files`) — streaming ingestion and fine-
  grained partitioning accumulate small files; at scale, file-open and
  footer-read overhead then dominates scans (and crushes the driver's
  file listing). Rewrite a directory into ~``target_mb`` files,
  preserving the sort within each output file when asked.

Both are plain batch rewrites — idempotent, re-runnable, no table-format
dependency (the same pattern Delta/Iceberg OPTIMIZE implements, minus
the transaction log, which the driver testdata does not use).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_time_clustered(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files with non-overlapping
    ``ts_col`` ranges (globally range-partitioned, sorted within each
    file so row-group stats are tight)."""
    (
        df.repartitionByRange(n_files, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
    sort_by: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files;
    returns the output file count. With ``sort_by``, output stays
    range-clustered on that column (compaction then preserves the
    skipping property of `write_time_clustered`)."""
    df = spark.read.parquet(path)
    # Size from the source's actual on-disk bytes, not a row-count guess —
    # via the Hadoop FileSystem API so the same code sizes file://, s3a://
    # or hdfs:// paths.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n, F.col(sort_by)).sortWithinPartitions(
            sort_by
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return n
