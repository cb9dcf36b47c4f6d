"""AS-OF join — a custom temporal operator Spark lacks natively
(north-star custom-operator surface; DuckDB ships it as ASOF JOIN, which
supplies the exact oracle).

Semantics: for each left row, attach the single right row with the
greatest right_ts ≤ left_ts within the same key (left rows with no such
right row keep nulls).

Implementation is the scalable union-and-carry formulation, NOT a range
self-join: tag both sides, union, and carry the latest right values
forward with last(ignorenulls) over a (key, time) window. One shuffle on
the key, per-partition sort, zero candidate blow-up — the naive
inequality join would materialize |left| x |right-per-key| candidate
rows before picking the max.

Requirements: right must be unique per (key, right_ts) — pre-aggregate
ties (e.g. max_by) before calling, or the carried value at a tied
timestamp is partition-order-dependent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join; output = left columns + value_cols (nullable)."""
    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_is_left", F.lit(1)
    )
    r_tagged = (
        right.select(key, right_ts, *value_cols)
        .withColumn("_t", F.col(right_ts))
        .withColumn("_is_left", F.lit(0))
        .drop(right_ts)
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at an equal timestamp (0 < 1), so
    # a right row at exactly left_ts is visible to that left row — the
    # ASOF '<=' contract.
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("_is_left") == 1).drop("_t", "_is_left")
