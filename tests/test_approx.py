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
    from newsflow.ops.relational import orders_approx_stats_builtin

    for r in orders_approx_stats_builtin(spark, SF_ORACLE).collect():
        e = exact[r["status"]]
        # HLL++ default rsd = 5%; allow 3 sigma.
        assert abs(r["approx_customers"] - e["nd"]) <= 0.15 * e["nd"]
        # GK sketch with accuracy 10k: rank error 1/10k — price-space
        # tolerance of 2% is generous but catches real breakage.
        assert abs(r["approx_median_price"] - e["med"]) <= 0.02 * e["med"]


def test_engine_shared_approx_stats_within_bounds(spark):
    """The r14 registered `orders_approx_stats` (engine-shared KMV /
    threshold distinct estimate + bottom-k sample median) must land
    within ITS documented error envelopes of the exact stats — the
    oracle proves cross-engine equality; this proves the estimators
    estimate."""
    o = load_table(spark, SF_ORACLE, "orders")
    exact = {
        r["status"]: r
        for r in o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.count(F.lit(1)).alias("n"),
            F.percentile("o_totalprice", F.lit(0.40)).alias("q40"),
            F.percentile("o_totalprice", F.lit(0.60)).alias("q60"),
        )
        .collect()
    }
    from newsflow.ops.relational import orders_approx_stats

    rows = orders_approx_stats(spark, SF_ORACLE).collect()
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[r["status"]]
        assert r["n_orders"] == e["n"]
        # KMV branch rsd 1/sqrt(64) = 12.5%; 3 sigma ~ 37.5%. The
        # threshold branch at small SF is looser but still inside this.
        assert abs(r["est_customers"] - e["nd"]) <= 0.4 * e["nd"]
        # Sample median (k <= 256): rank sd ~ 3.1%; the estimate must
        # land inside the exact [0.40, 0.60]-quantile value band.
        assert e["q40"] <= r["est_median_price"] <= e["q60"]
