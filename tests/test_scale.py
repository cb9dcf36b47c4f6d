"""Scale-toolkit tests: bucketed joins must plan without an Exchange;
salted joins/aggregations must match their unsalted twins exactly."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.ops.scale import salted_count, salted_join, write_bucketed
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(
        orders, "orders_b", str(tmp_path / "orders_b"), "o_orderkey"
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(tmp_path / "lineitem_b"),
        "o_orderkey",
    )
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located bucketed sides: sort-merge join, zero shuffles.
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # Same rows as the shuffled join.
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_join(spark):
    # Skewed left: 80% of rows share one key.
    left = spark.range(2000).select(
        F.when(F.col("id") % 5 != 0, 7).otherwise(F.col("id") % 40).alias(
            "k"
        ),
        F.col("id").alias("val"),
    )
    right = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salt=8)
    assert salted.count() == plain.count()
    want = sorted((r["k"], r["val"], r["rv"]) for r in plain.collect())
    got = sorted((r["k"], r["val"], r["rv"]) for r in salted.collect())
    assert got == want


def test_salted_count_matches_groupby(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_type")
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["event_type"]: r["n"]
        for r in salted_count(ev, "event_type", n_salt=16).collect()
    }
    assert salted == plain
