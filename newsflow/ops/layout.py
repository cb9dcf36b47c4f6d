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


def zorder_value(cols: list, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of ``len(cols)`` pre-scaled integer
    columns (each already in [0, 2**bits)): bit b of column i lands at
    output position b * n_cols + i. Pure integer expressions — fully
    whole-stage-codegen, no UDF.

    bits * n_cols must stay <= 63 (long); 16 bits x 2-3 columns is the
    standard operating point (per-column resolution 65536 buckets, far
    finer than any row-group count)."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError("zorder_value: bits * n_cols must be <= 63")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, ...],
    n_files: int = 8,
    bits: int = 16,
    options: dict[str, str] | None = None,
) -> None:
    """Z-order-clustered parquet write (the Delta/Iceberg OPTIMIZE
    ZORDER pattern, table-format-free): each ``zorder_by`` column is
    min/max-scaled to a ``bits``-bit integer, the Morton interleave of
    those integers becomes the sort key, and the data is range-
    partitioned + sorted on it before writing.

    Why this beats single-column clustering for multi-predicate scans:
    sorting by (a, b) gives b no locality at all once a has any
    cardinality — row groups span b's full range, so predicates on b
    alone prune nothing. The Z-curve preserves locality in EVERY
    interleaved dimension simultaneously (a row group covers a small
    hyper-rectangle of the key space), so min/max stats prune scans on
    a, on b, or on both (tests/test_layout.py quantifies the per-column
    row-group range shrinkage vs a lexicographic sort).

    Scale shape: one 1-row min/max aggregate (broadcast as literals into
    the scaled expressions), then exactly the same rangepartition+sort
    write as `write_time_clustered`. Skewed columns degrade resolution
    (min/max scaling wastes bits on outliers) — winsorize first or use
    rank-based scaling when a column is heavy-tailed; documented, not
    automatic, because the stats pass that detects it is the caller's
    profile step (`documents_profile` / `orderkey_skew_profile`)."""
    from pyspark.sql import types as T

    def _as_double(c: str) -> F.Column:
        """Numeric-ify a zorder column: numerics cast directly, temporal
        types go through epoch seconds (timestamp→double is epoch
        seconds in Spark; dates via an intermediate timestamp cast)."""
        dt = df.schema[c].dataType
        if isinstance(dt, T.DateType):
            return F.col(c).cast("timestamp").cast("double")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.NumericType)):
            return F.col(c).cast("double")
        raise ValueError(
            f"write_zordered: column {c!r} has unsupported type {dt} — "
            "z-order columns must be numeric, timestamp, or date (for "
            "strings, z-order a numeric surrogate such as xxhash64)"
        )

    num_cols = {c: _as_double(c) for c in zorder_by}
    stats = df.agg(
        *[F.min(e).alias(f"_mn_{c}") for c, e in num_cols.items()],
        *[F.max(e).alias(f"_mx_{c}") for c, e in num_cols.items()],
    ).first()
    # An entirely-null column has no range to scale — drop IT, not the
    # clustering: the populated columns keep their promised layout.
    usable = [c for c in zorder_by if stats[f"_mn_{c}"] is not None]
    if not usable:
        # Empty input (or every column null): nothing to cluster on;
        # still honor the file-count contract instead of writing with
        # whatever upstream partitioning the frame happens to carry.
        w0 = df.coalesce(n_files).write.mode("overwrite")
        for k, v in (options or {}).items():
            w0 = w0.option(k, v)
        w0.parquet(path)
        return
    top = (1 << bits) - 1
    scaled = []
    for c in usable:
        mn = float(stats[f"_mn_{c}"])
        mx = float(stats[f"_mx_{c}"])
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor(
                    (num_cols[c] - F.lit(mn)) / F.lit(span) * F.lit(top + 1)
                ).cast("long"),
            )
        )
    zkey = zorder_value(scaled, bits)
    w = (
        df.withColumn("_z", zkey)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.parquet(path)
