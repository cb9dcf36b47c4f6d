"""User-behavior analytics over the events table (beyond-reference,
round 4): cohort retention, event-sequence transition matrix, a
stream-EXECUTED static-enrichment join, and incremental
materialized-view maintenance — the product-analytics family a news
platform runs next to the corpus pipeline (the reference's GDELT
scripts aggregate articles; these aggregate the readers).

All exactly oracled. Scale notes per query; the common theme is that
every expensive step is one keyed shuffle (user_id or the transition
pair) and everything after runs over user- or category-cardinality
frames.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from newsflow.registry import register
from newsflow.tables import load_table


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week,
                       date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY 1, 2
    """,
    tags=("analytics", "window", "events"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted once per (cohort, weeks-since-signup) cell — the table every
    retention curve and triangle chart is drawn from.

    Scale shape: one groupBy(user_id) for first-seen (map-side partial
    min), one self-join back on user_id (both sides hash-partitioned on
    the same key; AQE broadcasts the cohort side when user cardinality
    fits), one distinct on (user, cohort, offset) — all keyed on user_id,
    so at 100 TB this is two user-keyed shuffles and the output is
    |cohorts| x |horizon| tiny. Week truncation is Monday-based in both
    engines; offsets are exact integers (day-diff of week-aligned dates
    is a multiple of 7).
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
    )
    SELECT src, dst, CAST(count(*) AS BIGINT) AS n_transitions,
           (round(count(*)::DOUBLE
                  / sum(count(*)) OVER (PARTITION BY src) + 1e-9, 6)
            + 0.0) AS p_transition
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
    tags=("analytics", "window", "events"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered in-session pair of events per user, P(next event type |
    current event type) — the model behind next-action prediction and
    anomalous-sequence detection.

    Scale shape: ONE shuffle — the lead() window partitioned by user_id
    (ordered by (ts, event_id), a unique total order, so the sequence is
    deterministic under any partitioning); the transition counts and the
    per-src normalization window then run over |event_types|² rows.
    Probabilities are count ratios (exact IEEE division of integers,
    identical in both engines) under the house epsilon-rounding."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        (
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(wsrc)
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("p_transition"),
    )


_TIER_SQL = """
    SELECT user_id,
           ntile(4) OVER (
             ORDER BY sum(cast(value AS DECIMAL(25,4))) DESC, user_id
           ) AS value_tier
    FROM events GROUP BY user_id
"""


# Re-export: the generic two-pass machinery lives in ops/scale.py beside
# distributed_rank; this alias keeps the analytics-facing name stable.
from newsflow.ops.scale import distributed_ntile  # noqa: E402,F401


@register(
    "stream_static_enrichment",
    oracle=f"""
    WITH tiers AS ({_TIER_SQL})
    SELECT e.event_type, t.value_tier,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events e JOIN tiers t USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "executed", "analytics"),
)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension join EXECUTED through Structured
    Streaming: the events stream enriched with a STATIC per-user value
    tier (quartile of historic total value — the classic "join the
    click stream to the user dimension" shape), appended to a memory
    sink, then rolled up to (event_type, tier) counts.

    The stream-static equi-join is STATELESS (each micro-batch joins
    against the static table independently — no watermark, no state
    store), which is why it was the one streaming join shape not yet
    execution-verified: `conversion_pairs` covers stream-stream
    interval joins, this covers the broadcast-dimension form. The
    drained sink holds exactly one enriched row per event, so the batch
    join oracle applies verbatim.

    Scale shape: the static side is user-cardinality (one user-keyed
    shuffle), and its quartile ranking runs through
    `distributed_ntile` — the TeraSort-style two-pass exact ntile — NOT
    a global single-partition window, so the dimension build
    parallelizes at any user cardinality. Spark broadcasts the dimension
    per micro-batch when it fits, else hash-joins — either way the
    stream side is never re-partitioned by anything but the join. The
    tie-break on user_id makes tiers deterministic.

    Determinism note: the tier ranking key is a DECIMAL(25,4) sum in
    both engines — order-insensitive exact arithmetic, so the ntile
    ordering cannot drift with summation order; ties fall to user_id."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,4)")).alias("total_value")
    )
    tiers = distributed_ntile(
        totals,
        4,
        [F.col("total_value").desc(), F.col("user_id")],
        "value_tier",
    ).select("user_id", "value_tier")

    from newsflow.streaming.windows import read_events_stream

    stream = read_events_stream(
        spark,
        sf_dir,
        schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
        path_glob_filter="events.parquet",
    )
    enriched = stream.join(F.broadcast(tiers), "user_id").select(
        "event_type", "value_tier"
    )
    sink = f"enrich_stream_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("event_type", "value_tier")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


MV_CUTOFF = "2024-01-20"


@register(
    "incremental_agg_update",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           (cast(sum(cast(value AS DECIMAL(25,4))) as double) + 0.0)
             AS sum_value,
           (round(cast(sum(cast(value AS DECIMAL(25,4))) as double)
                  / count(*) + 1e-9, 6) + 0.0) AS avg_value
    FROM events
    GROUP BY event_type
    """,
    tags=("analytics", "maintenance", "incremental"),
)
def incremental_agg_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view DELTA maintenance: a stored per-event-type
    aggregate (simulated as the aggregate over events before MV_CUTOFF —
    in production, the parquet table the last refresh wrote) is updated
    with one new slice's PARTIAL aggregates and merged, instead of
    recomputing over history. The oracle is the full recompute — the
    driver hash-proves merge(base, delta) == recompute(all), which is
    the correctness contract incremental view maintenance rests on.

    Works because the measures are ALGEBRAIC: count and decimal sum
    re-aggregate losslessly (sum of sums), and avg is DERIVED from the
    merged sums rather than averaged-of-averages (the classic MV bug).
    Exact decimal partials make the merge order-insensitive, so the
    result is bit-identical to the recompute. Non-algebraic measures
    (exact distinct, medians, top-k) need their own mergeable sketches
    (HLL / quantile digests) — see `orders_approx_stats` for the approx
    tier.

    Scale shape: the delta aggregation touches ONE day-slice (at 100 TB
    with day-partitioned storage: a pruned scan of the new partition
    only, the same discipline as `merge_upsert`); the merge is a groupBy
    over 2x|event_types| partial rows. History is never re-read.
    """
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(MV_CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).alias("sum_dec"),
        )

    base = partials(events.filter(F.col("ts") < cutoff))  # "stored MV"
    delta = partials(events.filter(F.col("ts") >= cutoff))  # new slice
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        (F.col("sum_dec").cast("double") + F.lit(0.0)).alias("sum_value"),
        (
            F.round(
                F.col("sum_dec").cast("double") / F.col("n_events")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_value"),
    )


BURST_GAP_US = 600_000_000  # 10 minutes


@register(
    "event_burst_collapse",
    oracle=f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM seq
    WHERE prev_ts IS NULL
       OR epoch_us(ts) - epoch_us(prev_ts) > {BURST_GAP_US}
    """,
    tags=("analytics", "dedup", "window", "events"),
)
def event_burst_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ingestion dedup: within each (user, event_type)
    stream, keep only the HEAD of every burst — an event is a duplicate
    if it follows the previous kept-or-dropped event of the same key by
    <= 10 minutes (double-clicks, retry storms, repost floods). The
    batch twin of `dropDuplicatesWithinWatermark`'s semantics, expressed
    as gaps-and-islands: a row survives iff its gap to the PREDECESSOR
    exceeds the threshold.

    Note the semantic choice, shared by both engines' formulation:
    gap-to-predecessor (lag) rather than gap-to-burst-head — a chain of
    events 5 minutes apart collapses to ONE survivor no matter how long
    the chain (the sessionization view of dedup; session_window gives
    the same islands on a stream).

    Scale shape: ONE shuffle (the per-key lag window, unique total order
    (ts, event_id)); the filter is row-local. At 100 TB this is the
    cheapest dedup tier there is — it runs before hashing, before any
    state, on the partition-pruned fresh slice only."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return seq.filter(
        F.col("prev_ts").isNull()
        | (
            F.unix_micros("ts") - F.unix_micros("prev_ts")
            > F.lit(BURST_GAP_US)
        )
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


@register(
    "incremental_percentile_update",
    # Oracle = full recompute with the same bucket math: all-integer
    # (2-dp value buckets, counts, cumulative comparison cum*2 >= total)
    # until the final bucket/100.0, so the merge-vs-recompute identity
    # is hash-exact with no rounding machinery.
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bucket, n,
             sum(n) OVER (
               PARTITION BY event_type ORDER BY bucket
             ) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM h
    )
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS n_events,
           (min(CASE WHEN cum * 2 >= total THEN bucket END) / 100.0 + 0.0)
             AS p50_value
    FROM c GROUP BY event_type
    """,
    tags=("analytics", "maintenance", "incremental", "sketch"),
)
def incremental_percentile_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch MV maintenance for a NON-algebraic measure: the
    per-event-type median is maintained incrementally by merging
    fixed-grid bucket HISTOGRAMS (2-dp value buckets via round(v*100) —
    NOT floor: v*100 for a 2-dp value can land 1 ulp below the integer,
    so floor would misbucket ~6% of values one cell low) — the stored
    histogram of events before MV_CUTOFF plus the new slice's histogram,
    bucket counts summed, median read off the merged cumulative. This is
    the answer to `incremental_agg_update`'s caveat that medians don't
    re-aggregate: the histogram IS the mergeable sketch (here exact,
    because the value domain is 2-dp-bounded; at unbounded domains the
    same shape holds with KLL/t-digest and an approximation bound).

    The oracle recomputes the median from the FULL table with identical
    bucket math, so the driver hash-proves merge(hist_base, hist_delta)
    == recompute(all) — all-integer arithmetic end to end.

    Scale shape: the delta histogram touches one day-slice (pruned scan);
    the merge is a groupBy over 2 × |event_types × buckets| rows (the
    sketch size, independent of corpus size); cumulative windows are
    partitioned by event_type — nothing global, nothing
    corpus-proportional after the per-slice scans."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(MV_CUTOFF).cast("timestamp")

    def hist(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("bucket"),
        ).agg(F.count(F.lit(1)).alias("n"))

    base = hist(events.filter(F.col("ts") < cutoff))  # "stored sketch"
    delta = hist(events.filter(F.col("ts") >= cutoff))  # new slice
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = merged.select(
        "event_type",
        "bucket",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )
    return c.groupBy("event_type").agg(
        F.max("total").cast("bigint").alias("n_events"),
        (
            F.min(
                F.when(F.col("cum") * 2 >= F.col("total"), F.col("bucket"))
            )
            / 100.0
            + F.lit(0.0)
        ).alias("p50_value"),
    )
