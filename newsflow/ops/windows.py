"""Window-function surface (SURVEY.md §2.5).

The reference has no window functions; the new engine needs them for
deterministic keep-first dedup (P11 — ``drop_duplicates(keep='first')``
is order-nondeterministic in distributed execution) and for the standard
rank / lag / frame analytics a complete engine must expose.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround, sql_dround
from newsflow.registry import register
from newsflow.tables import load_table


@register(
    "keep_first_dedup",
    oracle="""
    SELECT l_orderkey,
           l_partkey AS first_partkey,
           (l_quantity + 0.0) AS first_quantity
    FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity
             ) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def keep_first_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — deterministic keep-first dedup via row_number.

    Reference: build_datasets.py:90 ``drop_duplicates(subset=['url'],
    keep='first')`` — 'first' is file order in pandas but undefined under
    distributed execution; the window over an explicit sort key is the
    scale-safe equivalent (one shuffle on the dedup key).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Sort key covers every projected column so residual ties between
    # duplicate (orderkey, linenumber) rows are value-identical.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("first_partkey"),
            (F.col("l_quantity") + F.lit(0.0)).alias("first_quantity"),
        )
    )


@register(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, (o_totalprice + 0.0) AS o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window (the distributed form of the
    reference's per-company sort+limit loops, network_analysis.py:44-45)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(0.0)).alias("o_totalprice"),
        )
    )


@register(
    "user_moving_avg",
    oracle=f"""
    SELECT event_id,
           user_id,
           {sql_dround(
             'avg(value) OVER (PARTITION BY user_id ORDER BY event_id '
             'ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)', 2)} AS moving_avg
    FROM events
    WHERE user_id < 20
    """,
    tags=("window",),
)
def user_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over an explicit row frame (2 preceding .. current).

    Frame ordering uses event_id (globally unique) rather than ts so the
    frame contents are engine-independent; avg over ≤3 doubles is computed
    in identical order by both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        dround(F.avg("value").over(w), 2).alias("moving_avg"),
    )


@register(
    "user_cumulative_value",
    oracle="""
    SELECT event_id,
           user_id,
           (cast(sum(cast(value AS DECIMAL(25,4))) OVER (
              PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) + 0.0) AS running_value
    FROM events
    WHERE user_id < 20
    """,
    tags=("window",),
)
def user_cumulative_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user — exact via decimal accumulation."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast("decimal(25,4)")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        (running.cast("double") + F.lit(0.0)).alias("running_value"),
    )


@register(
    "order_price_lag_rank",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           rank() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq,
           (coalesce(lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 0.0) + 0.0) AS prev_price
    FROM orders
    WHERE o_custkey < 100
    """,
    tags=("window",),
)
def order_price_lag_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() + lag() over a per-customer order timeline."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("order_seq"),
        (F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)) + F.lit(0.0)).alias(
            "prev_price"
        ),
    )


@register(
    "keep_first_dedup_agg",
    # Same result contract (and oracle) as keep_first_dedup — the window
    # formulation demonstrates P11; this is the cheaper scale form.
    oracle="""
    SELECT l_orderkey,
           l_partkey AS first_partkey,
           (l_quantity + 0.0) AS first_quantity
    FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity
             ) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    tags=("dedup", "agg"),
)
def keep_first_dedup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first as a hash aggregation: min_by over the composite sort
    struct. Versus the row_number window it needs no per-partition sort
    and gets map-side partial aggregation — at 100 TB the shuffle
    carries one row per (key, map task) instead of every row."""
    li = load_table(spark, sf_dir, "lineitem")
    order_key = F.struct("l_linenumber", "l_partkey", "l_quantity")
    first = F.min_by(F.struct("l_partkey", "l_quantity"), order_key)
    return (
        li.groupBy("l_orderkey")
        .agg(first.alias("first"))
        .select(
            "l_orderkey",
            F.col("first.l_partkey").alias("first_partkey"),
            (F.col("first.l_quantity") + F.lit(0.0)).alias("first_quantity"),
        )
    )


@register(
    "customer_balance_quartiles",
    oracle="""
    SELECT c_mktsegment,
           quartile,
           count(*) AS n_customers,
           (min(c_acctbal) + 0.0) AS min_bal,
           (max(c_acctbal) + 0.0) AS max_bal
    FROM (
      SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey
             ) AS quartile
      FROM customer
    )
    GROUP BY c_mktsegment, quartile
    """,
    tags=("window", "agg"),
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile ranking window: per-segment balance quartiles, aggregated to
    quartile boundaries. The c_custkey tie-breaker makes the ntile
    assignment total-order deterministic, so both engines bucket
    identically. One shuffle on the segment key; the per-partition sort
    is the inherent window cost (same trade-off as keep_first_dedup).
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.min("c_acctbal") + F.lit(0.0)).alias("min_bal"),
            (F.max("c_acctbal") + F.lit(0.0)).alias("max_bal"),
        )
    )


@register(
    "user_trailing_24h_stats",
    oracle="""
    SELECT event_id,
           user_id,
           count(*) OVER w AS n_24h,
           CAST(sum(CAST(value * 100 AS BIGINT)) OVER w AS BIGINT) AS cents_24h
    FROM (
      SELECT event_id, user_id,
             epoch_ns(ts) // 1000000000 AS ts_s,
             round(value, 2) AS value
      FROM events WHERE user_id < 20
    )
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts_s
      RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window", "range-frame"),
)
def user_trailing_24h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-user trailing-24-hour event
    count and value total — the frame every rate-limit / rolling-metric
    query needs, and a distinct shape from the ROWS frames
    (`user_moving_avg`): the frame spans whatever ROW COUNT falls in the
    time interval. Ordered by epoch seconds so the range arithmetic is
    integer-exact in both engines; the value total sums exact cents
    (value is 2-decimal) so no float-order hazard exists. Same
    single-shuffle-plus-sort cost model as any window at scale.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts").alias("ts_s"))
        .rangeBetween(-86400, Window.currentRow)
    )
    cents = F.round(F.round("value", 2) * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(cents).over(w).alias("cents_24h"),
    )
