"""Range join (interval containment) — the second custom non-equi
operator (north-star surface): attach to each row the dimension interval
containing its value.

Spark plans a raw `BETWEEN` join as BroadcastNestedLoopJoin — fine when
the interval table is tiny, quadratic disaster when it isn't. The scale
form here is BINNING: explode each interval into the fixed-width bins it
overlaps, equi-join on the bin id (hash join, shuffle-free when the
binned intervals broadcast), then post-filter the exact bounds. Cost is
O(|left| + |intervals| x bins-per-interval) instead of
O(|left| x |intervals|).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join_binned(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 50.0,
) -> DataFrame:
    """Inner range join: rows where lo <= value < hi.

    `intervals` must be non-overlapping for one-row-out semantics (not
    enforced — overlapping intervals yield one row per match, the
    standard join contract).
    """
    binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                # hi is exclusive: the last covered bin is the one
                # containing the largest value strictly below hi.
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bin_width
                ).cast("long"),
            )
        ),
    )
    tagged = left.withColumn(
        "_bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    return (
        tagged.join(F.broadcast(binned), "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bin")
    )
