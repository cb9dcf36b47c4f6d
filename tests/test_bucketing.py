"""Bucketed co-located joins — the shuffle-elimination technique for
REPEATED fact-fact joins at 100 TB: write both fact tables bucketed by
the join key once, and every subsequent join on that key reads
pre-partitioned data with NO Exchange on either side.

This is a scale-technique demonstration with a hard plan assertion, not
just prose: the bucketed orders ⋈ lineitem plan must contain zero
shuffle Exchanges, while the identical plain-parquet join shuffles both
sides."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.tables import load_table
from tests.conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucket_warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for name, df, key in (
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", li, "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .option("path", str(warehouse / name))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"buckdemo.{name}")
        )
    yield "buckdemo.orders_b", "buckdemo.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS buckdemo.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckdemo")


def _join_plan(spark, o_name, l_name) -> tuple:
    o = spark.table(o_name)
    li = spark.table(l_name)
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, plan


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    # Force the SMJ path (AQE broadcasts these tiny fixtures otherwise):
    # the point is the co-located shape a 100 TB fact-fact join takes.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, plan = _join_plan(spark, o_name, l_name)
        # Join inputs read bucket-aligned files: SortMergeJoin with NO
        # Exchange on either join key (the final 1-group aggregation may
        # still exchange — that's not the join).
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_parquet_join_shuffles_both_sides(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    # Disable auto-broadcast so the comparison shows the shuffle the
    # bucketed layout removes (AQE would broadcast these tiny fixtures).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert (
            "Exchange hashpartitioning(l_orderkey" in plan
            and "Exchange hashpartitioning(o_orderkey" in plan
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_on_bucket_key_avoids_shuffle(spark, bucketed_tables):
    _, l_name = bucketed_tables
    li = spark.table(l_name)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert agg.count() > 0
