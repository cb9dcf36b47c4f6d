"""Scale toolkit (SURVEY.md §4 / north-star "optimize for scale"):
bucketed co-located joins and skew salting.

These are the two knobs AQE cannot fully supply at 100 TB:

* **Bucketing** — a fact table joined repeatedly on the same key should
  be written bucketed by that key; both sides of the join then read
  pre-partitioned data and the sort-merge join runs WITHOUT any
  Exchange. At 100 TB the removed shuffle is usually the single largest
  cost in the pipeline. (`write_bucketed` + tests/test_scale.py assert
  the Exchange-free plan.)

* **Salting** — when one join key carries a disproportionate share of
  rows, the task holding it straggles. AQE's skew-join split handles
  sort-merge joins after the fact; explicit salting (`salted_join`)
  handles it at plan time and also covers aggregations: the hot key is
  split across `n_salt` subkeys, the small side replicated per subkey,
  results identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist `df` as an external bucketed (+sorted) table. Reads via
    spark.table(name) carry the bucket layout into join planning."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys split over `n_salt`
    subkeys and the RIGHT side replicated once per subkey.

    `salt_source` must be a deterministic expression over left columns
    (default: hash of the whole row) — determinism matters because Spark
    may recompute a partition after failure, and a nondeterministic salt
    would route the row to a different copy (harmless for inner joins,
    wrong for aggregations layered on top of cached results).

    Replication multiplies the right side by n_salt — use only when
    right is broadcast-small or the skew dwarfs the replication cost.
    """
    if salt_source is None:
        salt_source = F.hash(*[F.col(c) for c in left.columns])
    l_salted = left.withColumn("_salt", F.pmod(salt_source, F.lit(n_salt)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_salted.join(r_salted, [key, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salt: int = 8, salt_source: Column | None = None
) -> DataFrame:
    """Two-phase count for a skewed group key: pre-aggregate on
    (key, salt), then merge. Catalyst's partial aggregation already does
    this for simple counts; the explicit form matters for operations
    with no map-side combine (e.g. collect_list / exact distinct
    downstream) and documents the pattern."""
    if salt_source is None:
        salt_source = F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn("_salt", F.pmod(salt_source, F.lit(n_salt)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def distributed_rank(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global row_number over a total order WITHOUT the single-partition
    window (`Window.orderBy` with no partitionBy funnels the whole frame
    through one task, and Spark's WindowGroupLimit pushdown does not
    apply to an empty partition spec — verified in
    tests/test_plans.py::test_bm25_topk_has_no_corpus_sized_global_sort).

    TeraSort-style two-pass (shared with `ops/sampling.doc_corpus_shuffle`
    and `distributed_ntile` below): range-repartition on the order
    columns, eager localCheckpoint to PIN the sampled partitioning (the
    range partitioner's boundary sampling is execution-dependent, so the
    counts pass and the rank pass must read one materialized layout),
    an O(partitions) driver pass turning per-partition counts into
    global offsets, then rank = offset + per-partition row_number.
    Every window is partitioned; the only driver state is one int per
    partition. ``order_cols`` must be a total order (tie-break included).
    """
    ranked, _ = _distributed_rank_with_total(
        df, order_cols, out_col, num_partitions
    )
    return ranked


def _distributed_rank_with_total(
    df: DataFrame,
    order_cols: list,
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Rank machinery + the total row count (already known from the
    offsets pass — callers like `distributed_ntile` need n and must not
    pay a second full count job for it)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in arranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off_expr = F.coalesce(
            F.element_at(
                F.create_map(
                    *[
                        x
                        for pid, off in sorted(offsets.items())
                        for x in (F.lit(pid), F.lit(off))
                    ]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
    else:
        off_expr = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = arranged.withColumn(
        out_col, off_expr + F.row_number().over(w)
    ).drop("_pid")
    return ranked, acc


def distributed_ntile(
    df: DataFrame,
    k: int,
    order_cols: list,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ntile(k) over a global total order WITHOUT the
    single-partition window — `distributed_rank` plus the SQL ntile
    bucket formula (first n mod k buckets get ceil(n/k) rows), so a
    DuckDB/Spark ntile oracle applies verbatim. n comes from the rank
    pass's own offset bookkeeping — no extra count job. ``order_cols``
    must define a TOTAL order (tie-break included), the same
    precondition SQL ntile determinism has."""
    ranked, n = _distributed_rank_with_total(
        df, order_cols, "_rank", num_partitions
    )
    big = n % k
    small = n // k
    size_big = small + 1
    bucket = F.when(
        F.col("_rank") <= big * size_big,
        F.floor((F.col("_rank") - 1) / size_big) + 1,
    ).otherwise(
        big
        + F.floor((F.col("_rank") - big * size_big - 1) / max(small, 1))
        + 1
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop("_rank")
