"""Approximate aggregates must land within their documented error bounds
of the exact twins (the check an oracle can't do)."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def test_approx_stats_within_bounds(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    exact = {
        r["status"]: r
        for r in o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("med"),
        )
        .collect()
    }
    from newsflow.ops.relational import orders_approx_stats

    for r in orders_approx_stats(spark, SF_ORACLE).collect():
        e = exact[r["status"]]
        # HLL++ default rsd = 5%; allow 3 sigma.
        assert abs(r["approx_customers"] - e["nd"]) <= 0.15 * e["nd"]
        # GK sketch with accuracy 10k: rank error 1/10k — price-space
        # tolerance of 2% is generous but catches real breakage.
        assert abs(r["approx_median_price"] - e["med"]) <= 0.02 * e["med"]
