"""Join surface (SURVEY.md §2.3).

The reference implements no joins, but its two-table core/ml split declares
`url` as a join key (gdelt/processing/make_docs.py:103) — the new engine
supports the full equi-join family. Strategy at scale:

* dimension tables (region/nation/customer at TPC-H ratios) → explicit
  ``broadcast()`` hints — no shuffle of the fact side;
* fact-fact (orders ⋈ lineitem) → sort-merge on the shuffle key, with AQE
  skew-join splitting enabled (newsflow.session);
* NOT-IN / EXISTS semantics → left_anti / left_semi, the 100 TB-safe
  replacement for literal exclusion lists (network_analysis.py:62).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.exactagg import Sum, exact_stats_agg
from newsflow.functions.scalars import davg, dsum, sql_davg, sql_dsum
from newsflow.registry import register
from newsflow.tables import load_table, local_df


@register(
    "regional_customer_stats",
    oracle=f"""
    SELECT r.r_name,
           count(*) AS n_customers,
           {sql_davg('c.c_acctbal')} AS avg_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def regional_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup: fact ⋈ two broadcast dimensions.

    nation (25 rows) and region (5 rows) are broadcast — the customer scan
    never shuffles for the join; the only exchange is the final group-by.
    """
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .join(r, n.n_regionkey == r.r_regionkey, "inner")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_balance"),
        )
    )


@register(
    "revenue_by_status",
    oracle=f"""
    SELECT o.o_orderstatus,
           count(*) AS n_line_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "agg"),
)
def revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (orders ⋈ lineitem) + grouped revenue.

    Shuffles both sides on the order key (sort-merge); at 100 TB both
    tables would be bucketed on the key at write time to make this a
    zero-shuffle join (see newsflow.etl writers).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return exact_stats_agg(
        o.join(li, o.o_orderkey == li.l_orderkey, "inner"),
        keys=["o_orderstatus"],
        measures={"rev": rev},
        stats=[Sum("revenue", "rev")],
        count_alias="n_line_items",
    )


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi"),
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS semantics without row duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .count()
        .withColumnRenamed("count", "n_customers")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — NOT EXISTS / NOT-IN at scale (replaces the
    reference's literal exclusion list, network_analysis.py:62,71-73).
    Dormant-customer form: no orders since 2000-01-01 (every customer in
    the fixture has SOME order, so the undated form was permanently
    empty — a matching-but-weak signal; the date predicate pushes to the
    orders scan and the anti join actually fires: 135 rows at sf0.01)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .count()
        .withColumnRenamed("count", "n_customers")
    )


@register(
    "national_supply_balance",
    oracle=f"""
    SELECT n.n_name,
           count(DISTINCT s.s_suppkey) AS n_suppliers,
           count(DISTINCT c.c_custkey) AS n_customers,
           {sql_davg('s.s_acctbal')} AS avg_supplier_balance
    FROM nation n
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
)
def national_supply_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join through a shared dimension + distinct counts.

    Note this is an intentional fan-out join (supplier × customer within a
    nation) — countDistinct collapses it; avg is computed per joined row to
    match the SQL semantics exactly.
    """
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "inner")
        .join(c, c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            F.countDistinct("c_custkey").alias("n_customers"),
            davg("s_acctbal").alias("avg_supplier_balance"),
        )
    )


@register(
    "events_asof_updates",
    oracle="""
    WITH upd AS (
      SELECT o_custkey % 150 AS user_id,
             TIMESTAMP '2024-01-01'
               + INTERVAL (date_diff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE)) * 15) MINUTE
               AS upd_ts,
             max(o_orderkey) AS upd_key,
             (max_by(o_totalprice, o_orderkey) + 0.0) AS upd_price
      FROM orders
      WHERE o_custkey % 150 < 140
      GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, u.upd_key, u.upd_price
    FROM events e
    ASOF LEFT JOIN upd u
      ON e.user_id = u.user_id AND e.ts >= u.upd_ts
    """,
    tags=("join", "asof", "temporal"),
)
def events_asof_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (newsflow.ops.asof): each event picks the latest
    price-update at/before its timestamp per user. The update table is
    synthesized deterministically from orders (dates remapped into the
    events window, 15 min per historical day; users ≥140 withheld to
    exercise the unmatched-left path). Oracle: DuckDB's native ASOF
    LEFT JOIN."""
    from newsflow.ops.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(
        F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
    )
    upd = (
        o.select(
            (F.col("o_custkey") % 150).alias("user_id"),
            days.alias("_d"),
            "o_orderkey",
            "o_totalprice",
        )
        .filter(F.col("user_id") < 140)
        .withColumn(
            "upd_ts",
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                " + make_dt_interval(0, 0, _d * 15, 0)"
            ),
        )
        .groupBy("user_id", "upd_ts")
        .agg(
            F.max("o_orderkey").alias("upd_key"),
            (F.max_by("o_totalprice", "o_orderkey") + F.lit(0.0)).alias(
                "upd_price"
            ),
        )
    )
    joined = asof_join(
        ev, upd, key="user_id", left_ts="ts", right_ts="upd_ts",
        value_cols=["upd_key", "upd_price"],
    )
    return joined.select("event_id", "user_id", "upd_key", "upd_price")


@register(
    "events_value_tiers",
    oracle=f"""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('bronze', 0.0, 50.0), ('silver', 50.0, 120.0),
             ('gold', 120.0, 300.0), ('platinum', 300.0, 1000.0)
    )
    SELECT t.tier,
           count(*) AS n_events,
           {sql_davg('e.value')} AS avg_value
    FROM events e
    JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
    tags=("join", "range", "non-equi"),
)
def events_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (newsflow.ops.rangejoin): events bucketed into value
    tiers via the binned equi-join — a hash join on bin ids plus a
    bounds filter, not a BroadcastNestedLoopJoin over BETWEEN."""
    from newsflow.ops.rangejoin import range_join_binned

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    tiers = local_df(
        spark,
        [
            ("bronze", 0.0, 50.0),
            ("silver", 50.0, 120.0),
            ("gold", 120.0, 300.0),
            ("platinum", 300.0, 1000.0),
        ],
        "tier string, lo double, hi double",
    )
    joined = range_join_binned(ev, tiers, "value", bin_width=50.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        davg("value").alias("avg_value"),
    )


@register(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey,
           (cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
              AS DECIMAL(25,4))), 2) as double) + 0.0) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "flagship"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the canonical mixed-strategy join pipeline:
    selective dimension (filtered customer, broadcast) → fact-fact
    orders ⋈ lineitem (shuffle on the order key) → grouped revenue →
    top-10 (TakeOrderedAndProject, no full sort). Both date filters push
    to the parquet scans, so the joins see pre-filtered inputs — at
    100 TB the segment + date selectivity is what keeps the fact shuffle
    small, and AQE can flip the orders side to broadcast after filtering.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1998-06-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("date"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "large_order_customers",
    # Oracle keeps the literal TPC-H Q18 IN-subquery formulation; the
    # engine runs the single-aggregation rewrite below. Same rows.
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY 1, 2, 3, 4, 5
    """,
    tags=("join", "tpch"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): who placed orders whose
    total quantity exceeds the threshold.

    Spark-first rewrite: the classic IN-subquery form aggregates lineitem
    TWICE (once in the subquery, once for the output total). Here one
    hash aggregation produces the per-order quantity, the HAVING filter
    runs on it, and the surviving ~1% of orders join back to orders and
    customer — lineitem is scanned and shuffled exactly once, and after
    the filter AQE can flip the remaining joins to broadcast. l_quantity
    is integer-valued, so the double sum is exact (hash-gate safe).
    """
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "revenue_by_status_salted",
    # IDENTICAL oracle to revenue_by_status: salting is a physical
    # rewrite, so the driver hash-checks that splitting hot keys over 8
    # subkeys and merging partials changes nothing — the correctness
    # proof the skew-mitigation path needs before it's trusted at scale.
    oracle=f"""
    SELECT o.o_orderstatus,
           count(*) AS n_line_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "agg", "skew", "scale"),
)
def revenue_by_status_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`revenue_by_status` through the SALTED join path (ops/scale.py):
    the lineitem (probe) side's keys are split over 8 deterministic salt
    subkeys and the orders (build) side replicated once per subkey, so a
    hot order key's rows spread across 8 tasks instead of one straggler.

    This is the manual form of what AQE skew-join does adaptively; it
    stays necessary at 100 TB when skew is KNOWN ahead of time (a few
    viral orders holding 10⁸ line items) and the operator above the join
    (here: exact decimal partial sums per (status, salt), merged per
    status) must also pre-aggregate per salt to keep reducers balanced.
    The aggregation is salt-oblivious — groupBy(o_orderstatus) after the
    join — because Catalyst's partial aggregation already combines per
    task; the salted join's job is only to balance the JOIN tasks.
    Deterministic salt (hash of the row) keeps retries consistent."""
    from newsflow.ops.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"), "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_orderstatus"
    )
    joined = salted_join(li, o, key="key", n_salt=8)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return exact_stats_agg(
        joined,
        keys=["o_orderstatus"],
        measures={"rev": rev},
        stats=[Sum("revenue", "rev")],
        count_alias="n_line_items",
    )
