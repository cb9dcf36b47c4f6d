"""Subquery and outer-join shapes (beyond-reference completeness).

The reference has no subqueries or outer joins (SURVEY.md §2.3: no joins
at all), but any user migrating real analysis onto this engine hits these
four shapes immediately: scalar-subquery thresholds, correlated per-group
thresholds, full-outer reconciliation, and the left-outer histogram
(TPC-H Q13 shape). Each is expressed the way Catalyst wants it — scalar
subqueries become a one-row broadcast cross join, correlated subqueries
become a broadcast aggregate join on the correlation key — while the
DuckDB oracle keeps the literal subquery form, proving the rewrite.

Scale notes: every rewrite here stays shuffle-minimal at 100 TB. The
scalar threshold is a 1-row broadcast; the per-brand aggregate is
|brands| rows broadcast back against the full table (one scan, no
fact-side shuffle); the full-outer day matrix shuffles only pre-aggregated
day rows; Q13 shuffles orders once on the join key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.scalars import davg, sql_davg
from newsflow.registry import register
from newsflow.tables import load_table


@register(
    "orders_above_global_avg",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {sql_davg('o_totalprice')} AS avg_price_above
    FROM orders
    WHERE o_totalprice > (SELECT {sql_davg('o_totalprice')} FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "agg"),
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold: orders priced above the global mean.

    The scalar subquery is rewritten as a single-row aggregate
    cross-joined (auto-broadcast) against the fact table — the plan
    Catalyst produces for an uncorrelated scalar subquery, stated
    explicitly. The threshold uses the deterministic rounded mean so both
    engines compare against the bit-identical double.
    """
    o = load_table(spark, sf_dir, "orders")
    threshold = o.agg(davg("o_totalprice").alias("_thr"))
    return (
        o.crossJoin(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("_thr"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            davg("o_totalprice").alias("avg_price_above"),
        )
    )


@register(
    "parts_above_brand_avg",
    oracle=f"""
    SELECT p_brand,
           count(*) AS n_above,
           (max(p_retailprice) + 0.0) AS max_price
    FROM part p
    WHERE p_retailprice > (
      SELECT {sql_davg('p2.p_retailprice')}
      FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    GROUP BY p_brand
    """,
    tags=("subquery", "agg"),
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery threshold: parts above their brand's mean.

    The correlated aggregate is decorrelated into a per-brand aggregate
    (|brands| rows) broadcast-joined back on the correlation key — one
    scan of the fact table, no fact-side shuffle. This is the rewrite
    Catalyst applies to correlated scalar subqueries; doing it explicitly
    keeps the per-group mean on the deterministic helper.
    """
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(davg("p_retailprice").alias("_thr"))
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("_thr"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            (F.max("p_retailprice") + F.lit(0.0)).alias("max_price"),
        )
    )


@register(
    "daily_funnel_reconciliation",
    oracle="""
    SELECT coalesce(v.day, p.day) AS day,
           coalesce(v.n_views, 0) AS n_views,
           coalesce(p.n_purchases, 0) AS n_purchases
    FROM (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1
    ) v
    FULL OUTER JOIN (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ) p ON v.day = p.day
    """,
    tags=("join", "outer"),
)
def daily_funnel_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two daily aggregates.

    Days with views but no purchases (and vice versa) must survive with
    zero-filled counts — the shape behind any funnel/consistency report.
    Both sides pre-aggregate to |days| rows before the join, so the
    full-outer shuffle moves days, not events, at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        views.join(purchases, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


@register(
    "customer_order_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    tags=("join", "outer", "agg"),
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution including zero-order
    customers — the left outer join is what keeps the zero bucket, which
    an inner join silently drops. count(o_orderkey) ignores the NULLs
    the outer join pads in. One shuffle of orders on the join key; the
    second aggregation shuffles |customers| pre-counted rows.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "signup_days_gapfilled",
    oracle="""
    WITH b AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      FROM events WHERE event_type = 'signup'
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM b
    ),
    counts AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT s.day, coalesce(c.n, 0) AS n_signups
    FROM spine s LEFT JOIN counts c ON s.day = c.day
    """,
    tags=("timeseries", "join"),
)
def signup_days_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a generated date spine left-joined to the
    per-day counts, so days with zero signups appear explicitly — the
    shape every dashboard/time-series consumer needs (a bare GROUP BY
    silently drops empty days). The spine is sequence()-generated from
    the observed min/max (one 2-value aggregate broadcast, then one row
    per day — never a driver-side loop), so it costs nothing at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup")
    counts = (
        signups.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = signups.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return spine.join(counts, "day", "left_outer").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_signups")
    )
