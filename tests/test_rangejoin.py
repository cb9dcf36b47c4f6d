"""Binned range join: exact boundary semantics and parity with the
naive BETWEEN join."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.ops.rangejoin import range_join_binned


def test_boundaries_and_parity_with_naive(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 49.99, 50.0, 99.9, 100.0, 250.0, 999.9])],
        "id long, value double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 100.0), ("c", 100.0, 1000.0)],
        "tier string, lo double, hi double",
    )
    got = {
        r["id"]: r["tier"]
        for r in range_join_binned(left, intervals, "value", bin_width=30.0).collect()
    }
    # lo inclusive, hi exclusive.
    assert got == {0: "a", 1: "a", 2: "b", 3: "b", 4: "c", 5: "c", 6: "c"}
    naive = {
        r["id"]: r["tier"]
        for r in left.join(
            intervals,
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        ).collect()
    }
    assert got == naive
    # The plan is a broadcast HASH join on the bin id, not nested-loop.
    plan = (
        range_join_binned(left, intervals, "value", bin_width=30.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
