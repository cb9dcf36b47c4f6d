"""Relational core: scans, filters, aggregations, sorts, set ops.

Re-expresses the reference's query surface (SURVEY.md §2.2/§2.4/§2.6/§2.7)
over the driver testdata tables. Every query is declarative DataFrame/SQL —
Catalyst supplies predicate pushdown, column pruning, partial aggregation,
and TakeOrderedAndProject for top-k (verified via .explain in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.exactagg import Avg, Sum, exact_stats_agg
from newsflow.functions.scalars import (
    davg,
    dround,
    dsum,
    sql_davg,
    sql_dsum,
)
from newsflow.registry import register
from newsflow.tables import load_table


# ---------------------------------------------------------------------------
# A3 — the flagship "stats block" shape (SURVEY.md §2.4 A3, Phase 0):
# scan → group → count/avg/round → sort, TPC-H Q1 style over lineitem.
# Reference analog: gdelt/scripts/general_ml_and_source_sentiment_analysis.py:31-43.
# Scale notes: single shuffle on low-cardinality keys, partial aggregation
# map-side; at 100 TB this is scan-bound and embarrassingly parallel.
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount', out=4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate stats block (A2/A3): the engine's flagship.

    Uses the hierarchical exact aggregation (functions/exactagg.py):
    scaled-long partial sums per partition, decimal merge across — the
    values are bit-identical to the dsum/davg decimal formulation the
    oracle uses, at ~1.7x the throughput, and overflow-safe at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return exact_stats_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        measures={
            "qty": F.col("l_quantity"),
            "price": F.col("l_extendedprice"),
            "disc_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "disc": F.col("l_discount"),
        },
        stats=[
            Sum("sum_qty", "qty"),
            Sum("sum_base_price", "price"),
            Sum("sum_disc_price", "disc_price"),
            Avg("avg_qty", "qty"),
            Avg("avg_price", "price"),
            Avg("avg_disc", "disc", out=4),
        ],
        count_alias="count_order",
    )


# ---------------------------------------------------------------------------
# A3 exact analog on events: share-of-voice style percentages computed as
# avg-of-0/1-flag × 100 (general_ml_...py:37-39).
# ---------------------------------------------------------------------------
@register(
    "event_type_stats",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {sql_davg('value')} AS avg_value,
           {sql_davg('CASE WHEN value > 100 THEN 100.0 ELSE 0.0 END', out=1)}
             AS pct_high_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg",),
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-voice stats: count, avg, percentage-of-flag per group (A3)."""
    ev = load_table(spark, sf_dir, "events")
    high = F.when(F.col("value") > 100, F.lit(100.0)).otherwise(F.lit(0.0))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        davg("value").alias("avg_value"),
        davg(high, out=1).alias("pct_high_value"),
    )


# ---------------------------------------------------------------------------
# T1/A5 — top-k by count ("top sources", network_analysis.py:36-45).
# Deterministic tie-break on the group key so LIMIT is stable across engines.
# Catalyst plans TakeOrderedAndProject — no full sort at scale.
# ---------------------------------------------------------------------------
@register(
    "top_sources",
    oracle=f"""
    SELECT source,
           count(*) AS article_count,
           {sql_davg('n_chars')} AS avg_chars
    FROM documents
    GROUP BY source
    ORDER BY article_count DESC, source
    LIMIT 10
    """,
    tags=("agg", "topk"),
)
def top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 sources by document count with avg length (A2+T1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("article_count"),
            davg("n_chars").alias("avg_chars"),
        )
        .orderBy(F.desc("article_count"), F.asc("source"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A4 — filtered group-by + HAVING + full ORDER BY
# (general_ml_...py:242-252: per-source sentiment, min support).
# ---------------------------------------------------------------------------
@register(
    "source_stats_having",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           {sql_davg('n_chars')} AS avg_chars
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    HAVING count(*) >= 5
    ORDER BY avg_chars DESC
    """,
    tags=("agg", "having"),
)
def source_stats_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY … HAVING count ≥ k ORDER BY avg DESC (A4)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars").alias("avg_chars"),
        )
        .filter(F.col("n_docs") >= 5)
        .orderBy(F.desc("avg_chars"))
    )


# ---------------------------------------------------------------------------
# O1 — the UNION ALL stack (sentiment_analysis.py:26-35): three filtered
# aggregates with aligned literal columns.
# ---------------------------------------------------------------------------
_UNION_BRANCH_SQL = """
    SELECT '{label}' AS event_class,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           {avg_sql} AS avg_value,
           count(*) AS n
    FROM events WHERE event_type = '{etype}'
    GROUP BY 2
"""


@register(
    "event_class_union",
    oracle=" UNION ALL ".join(
        _UNION_BRANCH_SQL.format(
            label=lbl, etype=et, avg_sql=sql_davg("value")
        )
        for lbl, et in [
            ("Purchases", "purchase"),
            ("Clicks", "click"),
            ("Errors", "error"),
        ]
    ),
    tags=("setop",),
)
def event_class_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way UNION ALL of filtered aggregates (O1), weekly buckets.

    Kept structurally faithful to the reference (three scans unioned);
    `event_class_grouping_sets` is the single-pass rewrite.
    """
    ev = load_table(spark, sf_dir, "events")
    # date_trunc('week') is ISO-Monday-anchored in both Spark and DuckDB.
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")

    def branch(label: str, etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(week.alias("week"))
            .agg(
                davg("value").alias("avg_value"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                F.lit(label).alias("event_class"), "week", "avg_value", "n"
            )
        )

    return (
        branch("Purchases", "purchase")
        .unionByName(branch("Clicks", "click"))
        .unionByName(branch("Errors", "error"))
    )


# ---------------------------------------------------------------------------
# Idiomatic single-pass rewrite of O1 (SURVEY.md §2.7): one scan + one
# shuffle instead of three scans. This is the shape that survives 100 TB.
# ---------------------------------------------------------------------------
@register(
    "event_class_grouping_sets",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           {sql_davg('value')} AS avg_value,
           count(*) AS n
    FROM events
    WHERE event_type IN ('purchase', 'click', 'error')
    GROUP BY 1, 2
    """,
    tags=("setop", "agg"),
)
def event_class_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass replacement for the UNION ALL stack: group by the
    company/type dimension instead of scanning once per branch."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click", "error"))
        .groupBy("event_type", week.alias("week"))
        .agg(
            davg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# P12 — conditional bucket labeling (build_datasets.py:39-45 label_week).
# ---------------------------------------------------------------------------
@register(
    "order_date_buckets",
    oracle=f"""
    SELECT CASE
             WHEN o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01' THEN 'early_era'
             WHEN o_orderdate >= TIMESTAMP '1998-01-01'
              AND o_orderdate < TIMESTAMP '2002-01-01' THEN 'late_era'
             ELSE 'other'
           END AS era,
           count(*) AS n_orders,
           {sql_davg('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY 1
    """,
    tags=("filter", "agg"),
)
def order_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range bucket labeling via when/otherwise chain (P12)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    era = (
        F.when(
            (d >= F.lit("1995-01-01").cast("timestamp"))
            & (d < F.lit("1998-01-01").cast("timestamp")),
            "early_era",
        )
        .when(
            (d >= F.lit("1998-01-01").cast("timestamp"))
            & (d < F.lit("2002-01-01").cast("timestamp")),
            "late_era",
        )
        .otherwise("other")
    )
    return o.groupBy(era.alias("era")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        davg("o_totalprice").alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# P5/P6 — IN-list and NOT-IN predicates (nlp_analysis.py:102,
# network_analysis.py:62).
# ---------------------------------------------------------------------------
@register(
    "segment_in_list",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           {sql_davg('c_acctbal')} AS avg_balance
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'FURNITURE')
    GROUP BY c_mktsegment
    """,
    tags=("filter",),
)
def segment_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership predicate (P5)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "FURNITURE")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_balance"),
        )
    )


@register(
    "brand_not_in",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part
    WHERE p_brand NOT IN ('Brand#11', 'Brand#22', 'Brand#33')
    GROUP BY p_brand
    ORDER BY n_parts DESC, p_brand
    LIMIT 10
    """,
    tags=("filter", "topk"),
)
def brand_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN exclusion predicate (P6, network_analysis.py:62)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(~F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .groupBy("p_brand")
        .count()
        .withColumnRenamed("count", "n_parts")
        .orderBy(F.desc("n_parts"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A6/A7 — count-distinct and min/max QA aggregates (make_docs.py:18-25).
# ---------------------------------------------------------------------------
@register(
    "orders_qa_summary",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_custkey) AS n_customers,
           strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
    FROM orders
    """,
    tags=("agg", "qa"),
)
def orders_qa_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA-summary aggregates: row count, distinct key count, date range
    (A6/A7, make_docs.py:11-25)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )


# ---------------------------------------------------------------------------
# A8 — null/empty-rate aggregate (make_docs.py:15-16,43-47), exercised via a
# JSON-ish props extraction (the reference's themes/orgs emptiness check).
# ---------------------------------------------------------------------------
_K_FLAG_SQL = (
    'CASE WHEN CAST(regexp_extract(props, \'"k": ([0-9]+)\', 1) AS BIGINT)'
    " >= 50 THEN 100.0 ELSE 0.0 END"
)


@register(
    "props_flag_rates",
    oracle=f"""
    SELECT event_type,
           {sql_davg(_K_FLAG_SQL, out=2)} AS pct_k_high,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "scalar"),
)
def props_flag_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-of-condition aggregate over a JSON-extracted field (A8-shaped:
    avg(when(cond,1))*100, make_docs.py:15-16)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("long")
    flag = F.when(k >= 50, F.lit(100.0)).otherwise(F.lit(0.0))
    return ev.groupBy("event_type").agg(
        davg(flag, out=2).alias("pct_k_high"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# T3 — two-ended top-k (general_ml_...py:268-271): best-5 and worst-5 as a
# union of two TakeOrdereds instead of a driver-side head/tail slice.
# ---------------------------------------------------------------------------
@register(
    "docs_two_ended_topk",
    oracle="""
    (SELECT 'longest' AS side, doc_id, n_chars
     FROM documents ORDER BY n_chars DESC, doc_id LIMIT 5)
    UNION ALL
    (SELECT 'shortest' AS side, doc_id, n_chars
     FROM documents ORDER BY n_chars ASC, doc_id LIMIT 5)
    """,
    tags=("topk", "setop"),
)
def docs_two_ended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-k + worst-k via a union of two top-k plans (T3)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    longest = (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .select(F.lit("longest").alias("side"), "doc_id", "n_chars")
    )
    shortest = (
        docs.orderBy(F.asc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .select(F.lit("shortest").alias("side"), "doc_id", "n_chars")
    )
    return longest.unionByName(shortest)


# ---------------------------------------------------------------------------
# T5 — deterministic sample-N (build_datasets.py:117 head(200)).
# ---------------------------------------------------------------------------
@register(
    "orders_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           (o_totalprice + 0.0) AS o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 200
    """,
    tags=("topk",),
)
def orders_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-200-by-key sample export (T5) — ordered for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") + F.lit(0.0)).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Beyond-reference analytics shapes: rollup subtotals, pivot, exact
# quantiles — the aggregation surface a reference user grows into next.
# ---------------------------------------------------------------------------
@register(
    "order_status_rollup",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in ONE pass (rollup: per (status,priority),
    per status, grand total). Subtotal keys surfaced as 'ALL' so the
    output is sentinel-keyed, not positional (SURVEY A11 lesson)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "order_priority_pivot",
    oracle=f"""
    SELECT o_orderstatus AS status,
           {", ".join(
               "CAST(sum(CASE WHEN o_orderpriority = '" + p
               + "' THEN 1 ELSE 0 END) AS BIGINT) AS " + c
               for p, c in zip(_PRIORITIES,
                               ["n_urgent", "n_high", "n_medium",
                                "n_unspecified", "n_low"])
           )}
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot"),
)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a FIXED value list (explicit values keep the schema
    stable and skip the extra distinct-values job Spark otherwise runs)."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renames = dict(
        zip(_PRIORITIES, ["n_urgent", "n_high", "n_medium",
                          "n_unspecified", "n_low"])
    )
    return pv.select(
        "status",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
          for p, a in renames.items()],
    )


@register(
    "order_price_quantiles",
    oracle="""
    SELECT o_orderstatus AS status,
           (round(quantile_cont(o_totalprice, 0.25) + 1e-9, 2) + 0.0) AS p25,
           (round(quantile_cont(o_totalprice, 0.50) + 1e-9, 2) + 0.0) AS p50,
           (round(quantile_cont(o_totalprice, 0.75) + 1e-9, 2) + 0.0) AS p75
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "quantile"),
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles per group (F.percentile ≡ DuckDB
    quantile_cont). At 100 TB swap for percentile_approx with a stated
    error bound — kept exact here because the oracle gate is exact."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q25"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("q50"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q75"),
    )
    return q.select(
        "status",
        dround(F.col("q25"), 2).alias("p25"),
        dround(F.col("q50"), 2).alias("p50"),
        dround(F.col("q75"), 2).alias("p75"),
    )


def orders_approx_stats_builtin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark-builtin production twin of `orders_approx_stats`:
    approx_count_distinct (HLL++, default 5% rsd) and percentile_approx
    (GK sketch) — single-pass, mergeable, bounded-memory. UNREGISTERED
    (rows-only before r14): HLL++/GK internals are engine-specific, so
    their VALUES can never hash-match another engine; this form is
    bounds-checked against exact twins in tests/test_approx.py and its
    accuracy contract is driver-oracled via `orders_approx_bounds`.
    The registered `orders_approx_stats` below computes the same stats
    from ENGINE-SHARED deterministic sketches instead, which makes the
    estimates themselves exactly oracle-able."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias(
            "approx_median_price"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# Engine-shared approximate stats (VERDICT r13 Next #6). OAS_K and the
# 25% hash prune compose into a TOTAL distinct estimator with two
# regimes, both deterministic functions of the data through the
# md5-nibble derivation the sketch tier already certifies cross-engine:
#   - >= OAS_K distinct keys survive the prune: the k-th smallest
#     surviving hash IS the k-th smallest global hash (every smaller
#     hash also survives the prefix prune), so the classic KMV estimate
#     (k-1)*SCALE/v_k applies — rsd ~ 1/sqrt(k) = 12.5%.
#   - fewer than OAS_K survivors: survivor_count * 4 (the inverse
#     sampling rate) — the threshold/adaptive-sampling estimator, rsd
#     ~ 1/sqrt(m). At sf0.001 the per-status groups take this branch,
#     at sf0.01+ the KMV branch: both regimes are driver-exercised.
OAS_K = 64
OAS_PRUNE_HEX = "4"  # keep md5 first nibble < '4': 4/16 = 25% of keys
OAS_R = 4  # the matching inverse sampling rate
OAS_MED_K = 256  # bottom-k-by-hash sample behind the median estimate


def _orders_approx_oracle() -> str:
    from newsflow.functions.scalars import sql_dround
    from newsflow.sketch import KMV_SCALE, _kmv_v12_sql

    kmv_num = (OAS_K - 1) * KMV_SCALE  # 63 * 2^48: exact in a double
    est = sql_dround(f"CAST({kmv_num} AS DOUBLE) / vk", 4)
    return f"""
    WITH o AS (
      SELECT o_orderstatus AS status, o_custkey, o_orderkey, o_totalprice
      FROM orders
    ),
    counts AS (
      SELECT status, CAST(count(*) AS BIGINT) AS n_orders
      FROM o GROUP BY 1
    ),
    surv AS (
      SELECT DISTINCT status,
             md5('oascd:' || CAST(o_custkey AS VARCHAR)) AS h
      FROM o
      WHERE substr(md5('oascd:' || CAST(o_custkey AS VARCHAR)), 1, 1)
            < '{OAS_PRUNE_HEX}'
    ),
    sk AS (
      SELECT status, h,
             row_number() OVER (PARTITION BY status ORDER BY h) AS rn
      FROM surv
    ),
    cd AS (
      SELECT status, max(rn) AS m,
             max(CASE WHEN rn = {OAS_K} THEN {_kmv_v12_sql("h")} END) AS vk
      FROM sk WHERE rn <= {OAS_K} GROUP BY 1
    ),
    cde AS (
      SELECT status,
             CASE WHEN m < {OAS_K} THEN CAST(m * {OAS_R} AS DOUBLE)
                  ELSE {est} END AS est_customers
      FROM cd
    ),
    samp AS (
      SELECT status, o_totalprice, o_orderkey,
             md5('oasmed:' || CAST(o_orderkey AS VARCHAR)) AS h
      FROM o
      WHERE substr(md5('oasmed:' || CAST(o_orderkey AS VARCHAR)), 1, 1)
            < '{OAS_PRUNE_HEX}'
    ),
    bk AS (
      SELECT status, o_totalprice, o_orderkey FROM (
        SELECT status, o_totalprice, o_orderkey,
               row_number() OVER (
                 PARTITION BY status ORDER BY h, o_orderkey
               ) AS rn
        FROM samp
      ) WHERE rn <= {OAS_MED_K}
    ),
    med AS (
      SELECT status, o_totalprice AS est_median_price FROM (
        SELECT status, o_totalprice,
               row_number() OVER (
                 PARTITION BY status ORDER BY o_totalprice, o_orderkey
               ) AS pr,
               count(*) OVER (PARTITION BY status) AS ns
        FROM bk
      ) WHERE pr = CAST(floor((ns + 1) / 2.0) AS BIGINT)
    )
    SELECT c.status, c.n_orders,
           COALESCE(e.est_customers, 0.0) AS est_customers,
           m.est_median_price
    FROM counts c
    LEFT JOIN cde e USING (status)
    LEFT JOIN med m USING (status)
    """


@register(
    "orders_approx_stats",
    # Exactly oracled since round 14 (VERDICT r13 Next #6): the
    # estimates themselves are deterministic functions of the data via
    # the engine-shared md5 derivation — the KMV branch is one IEEE
    # division of two exactly-representable values (the
    # source_vocab_kmv argument), the threshold branch is integer
    # arithmetic, and the median estimate is an ELEMENT of the data
    # (type-1 quantile of the bottom-k sample), so no arithmetic can
    # drift at all. The Spark-builtin HLL++/GK twin stays as the
    # unregistered production variant (`orders_approx_stats_builtin`),
    # bounds-tested in tests/test_approx.py and certified by the
    # oracled `orders_approx_bounds`.
    oracle=_orders_approx_oracle(),
    tags=("agg", "approx", "sketch"),
)
def orders_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB forms of A6/quantiles from ENGINE-SHARED sketches:
    per status, (1) an approximate distinct-customer count from a
    25%-hash-pruned KMV sketch (k=64 smallest md5 values; prune-count
    fallback for groups too small to fill the sketch — see the regime
    note above `OAS_K`), and (2) an approximate median price as the
    middle element of a bottom-{OAS_MED_K}-by-hash uniform sample
    (rank sd ~ 1/(2*sqrt(k)) ~ 3.1%). Exact n_orders rides along as
    the audit anchor.

    Scale shape: the prune is a narrow predicate pass (3/4 of keys
    never reach a shuffle); the per-group windows then sort only the
    pruned survivors / the 256-row samples — bounded state per group
    at any corpus size, the same contract as HLL++/GK but with values
    another engine can reproduce bit-for-bit."""
    from pyspark.sql import Window

    from newsflow.sketch import KMV_SCALE, _kmv_v12_sql

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
    )
    counts = o.groupBy("status").agg(F.count(F.lit(1)).alias("n_orders"))

    hc = F.md5(
        F.concat(F.lit("oascd:"), F.col("o_custkey").cast("string"))
    )
    surv = (
        o.select("status", hc.alias("h"))
        .filter(F.substring("h", 1, 1) < OAS_PRUNE_HEX)
        .distinct()
    )
    wk = Window.partitionBy("status").orderBy("h")
    sk = surv.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= OAS_K
    )
    kmv_num = float((OAS_K - 1) * KMV_SCALE)
    cd = (
        sk.groupBy("status")
        .agg(
            F.max("rn").alias("m"),
            F.max(
                F.when(F.col("rn") == OAS_K, F.expr(_kmv_v12_sql("h")))
            ).alias("vk"),
        )
        .select(
            "status",
            F.when(
                F.col("m") < OAS_K,
                (F.col("m") * OAS_R).cast("double"),
            )
            .otherwise(dround(F.lit(kmv_num) / F.col("vk"), 4))
            .alias("est_customers"),
        )
    )

    hm = F.md5(
        F.concat(F.lit("oasmed:"), F.col("o_orderkey").cast("string"))
    )
    samp = o.select(
        "status", "o_totalprice", "o_orderkey", hm.alias("h")
    ).filter(F.substring("h", 1, 1) < OAS_PRUNE_HEX)
    wh = Window.partitionBy("status").orderBy("h", "o_orderkey")
    bk = samp.withColumn("rn", F.row_number().over(wh)).filter(
        F.col("rn") <= OAS_MED_K
    )
    wp = Window.partitionBy("status").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("status")
    med = (
        bk.withColumn("pr", F.row_number().over(wp))
        .withColumn("ns", F.count(F.lit(1)).over(wn))
        .filter(F.col("pr") == F.floor((F.col("ns") + 1) / 2))
        .select("status", F.col("o_totalprice").alias("est_median_price"))
    )

    return (
        counts.join(cd, "status", "left")
        .join(med, "status", "left")
        .select(
            "status",
            "n_orders",
            F.coalesce("est_customers", F.lit(0.0)).alias(
                "est_customers"
            ),
            "est_median_price",
        )
    )


# Error tolerances for the oracled bound check below. HLL++ at the
# default 5% rsd: 0.15 is the 3-sigma relative-error envelope.
# percentile_approx guarantees RANK error (<= 1/accuracy), not value
# error, so the median check is rank-based: the sketch median must land
# inside the exact [0.48, 0.52]-quantile value band (200x the sketch's
# nominal 1e-4 rank error — generous, but any real sketch defect blows
# through it).
APPROX_CD_REL_ERR = 0.15
APPROX_MEDIAN_RANK_SLACK = 0.02


@register(
    "orders_approx_bounds",
    # The sketch VALUES are engine-specific (HLL++/GK internals), so
    # they can never hash-match DuckDB — but their ERROR-BOUND CHECKS
    # can: the oracle computes the exact side (count DISTINCT, the
    # quantile band) and states the bound booleans as TRUE; the Spark
    # side computes the same booleans HONESTLY from its own sketches
    # against its own exact aggregates. A sketch drifting past its
    # published bound flips a boolean and turns the row red — the same
    # assert-the-claim oracle pattern as dedup_lsh_recall_eval's
    # recall floor.
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           TRUE AS customers_within_rsd,
           TRUE AS median_within_band
    FROM orders GROUP BY 1
    """,
    tags=("agg", "approx", "evaluation"),
)
def orders_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`orders_approx_stats` with its accuracy contract attached, as an
    ORACLED query: per status group, whether approx_count_distinct is
    within 3-sigma relative error of the exact distinct count, and
    whether the percentile_approx median lands inside the
    [0.48, 0.52]-quantile value band (edges from a GK sketch — rank
    error 1e-4 vs the 0.02 slack; see the in-body note for why exact
    percentile is the wrong plan shape here, and tests/test_approx.py
    for the exact-vs-sketch anchor at test SF). The exact distinct
    counts ride along (both engines compute them exactly, so they
    hash-check), anchoring the booleans to real data rather than a
    vacuous TRUE.

    Scale shape: one grouped aggregate computing sketch and exact forms
    side-by-side — at audit time only; production uses the sketch-only
    `orders_approx_stats` (single-pass, mergeable, bounded memory) and
    runs THIS query on a sampled or per-partition slice to re-certify
    the bounds."""
    o = load_table(spark, sf_dir, "orders")
    # Two deliberate plan choices, both measured at sf1:
    # 1. Band edges from a GK sketch (rank error 1e-4, 200x inside the
    #    0.02 slack being certified), not exact F.percentile — the
    #    exact form buffers every group value and with 3 status groups
    #    that is an O(n/3)-per-task memory wall at 100 TB (same cost at
    #    sf1: 0.67 s sketch vs 0.64 s exact; only one survives scale).
    # 2. TWO aggregations joined on the 3-row group key, NOT one agg
    #    mixing countDistinct with the sketches: a distinct aggregate
    #    forces the non-distinct aggregates through the
    #    distinct-rewrite's first phase keyed by (group, custkey) — one
    #    percentile/HLL sketch instance PER DISTINCT CUSTOMER, then a
    #    merge of ~1.5M sketches. Measured: 30.7 s mixed vs 0.7 s each
    #    when separated; the join is 3 rows a side.
    band = F.percentile_approx(
        "o_totalprice",
        F.array(
            F.lit(0.5 - APPROX_MEDIAN_RANK_SLACK),
            F.lit(0.5 + APPROX_MEDIAN_RANK_SLACK),
        ),
        10_000,
    )
    sketches = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_count_distinct("o_custkey").alias("_ac"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("_am"),
        band.alias("_band"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    exact_cd = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    agg = sketches.join(exact_cd, "status")
    rel_err = F.abs(F.col("_ac") - F.col("exact_customers")) / F.col(
        "exact_customers"
    )
    return agg.select(
        "status",
        "exact_customers",
        "n_orders",
        (rel_err <= APPROX_CD_REL_ERR).alias("customers_within_rsd"),
        (
            (F.col("_am") >= F.col("_band")[0])
            & (F.col("_am") <= F.col("_band")[1])
        ).alias("median_within_band"),
    )


# ---------------------------------------------------------------------------
# §2.7 completeness: the set operations the reference never used, and the
# CUBE companion to rollup. All distinct-based (shuffle on full row).
# ---------------------------------------------------------------------------
@register(
    "active_customer_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("setop", "intersect"),
)
def active_customer_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both an urgent and a low-priority order.
    Planned as a left-semi join after distinct — same shuffle count as
    the semi-join formulation."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@register(
    "urgent_only_customer_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("setop", "except"),
)
def urgent_only_customer_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: urgent-order customers who never placed a low-priority
    order (anti-join after distinct)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(low)


@register(
    "status_priority_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping combinations in one pass (adds the
    per-priority marginals rollup omits)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Reshape + diagnostics (beyond-reference relational completeness).
# ---------------------------------------------------------------------------
@register(
    "lineitem_measures_unpivot",
    oracle=f"""
    SELECT l_returnflag, measure,
           {sql_dsum('value')} AS total,
           count(*) AS n
    FROM (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    GROUP BY l_returnflag, measure
    """,
    tags=("reshape",),
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measure columns → long (measure, value) form,
    then aggregate per (flag, measure).

    Spark's native `DataFrame.unpivot` expands rows inside the scan stage
    (one `Expand` node, no join, no multi-scan) — at 100 TB this is one
    pass over lineitem versus the oracle's 3-scan UNION ALL formulation,
    the same single-pass-vs-restack tradeoff as grouping sets (O1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        dsum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "orderkey_skew_profile",
    oracle="""
    SELECT group_size, count(*) AS n_keys
    FROM (
      SELECT l_orderkey, count(*) AS group_size
      FROM lineitem GROUP BY l_orderkey
    )
    GROUP BY group_size
    """,
    tags=("agg", "scale"),
)
def orderkey_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: distribution of per-key group sizes.

    The pre-flight check before choosing a join strategy at 100 TB — a
    heavy tail here means AQE skew-join or `ops/scale.salted_join`.
    Two cheap shuffles (key count, then size histogram), both with
    map-side partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return per_key.groupBy("group_size").agg(F.count(F.lit(1)).alias("n_keys"))
