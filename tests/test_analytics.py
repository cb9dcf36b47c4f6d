"""Semantic invariants for the user-analytics family (round 4) — the
properties the oracle hash can't express directly."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow import analytics
from tests.conftest import SF_SMOKE


def test_cohort_retention_invariants(spark):
    rows = analytics.cohort_retention(spark, SF_SMOKE).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        assert r.n_active_users > 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = (
            r.n_active_users
        )
    for cohort, offsets in by_cohort.items():
        # week 0 exists (the signup week itself) and is the cohort max:
        # retention can never exceed the cohort's size.
        assert 0 in offsets, f"{cohort} missing week-0 row"
        assert all(n <= offsets[0] for n in offsets.values()), (
            f"{cohort}: later-week activity exceeds cohort size"
        )


def test_transition_probabilities_sum_to_one(spark):
    rows = analytics.event_type_transitions(spark, SF_SMOKE).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r.n_transitions > 0 and 0 < r.p_transition <= 1
        by_src.setdefault(r.src, 0.0)
        by_src[r.src] += r.p_transition
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, f"{src}: probabilities sum {total}"


def test_stream_enrichment_covers_every_event(spark):
    from newsflow.tables import load_table

    out = analytics.stream_static_enrichment(spark, SF_SMOKE)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    agg = out.agg(
        F.sum("n_events").alias("total"),
        F.countDistinct("value_tier").alias("tiers"),
    ).first()
    # inner join on a complete dimension: no event lost or duplicated
    assert agg.total == n_events
    assert agg.tiers == 4


def test_incremental_agg_matches_direct_recompute(spark):
    """The MV-merge path must be bit-identical to a direct aggregate
    (the oracle proves it vs DuckDB; this proves it vs Spark itself,
    isolating merge bugs from engine-difference bugs)."""
    from newsflow.tables import load_table

    merged = {
        r.event_type: r
        for r in analytics.incremental_agg_update(spark, SF_SMOKE).collect()
    }
    direct = {
        r.event_type: r
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).alias("sum_dec"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for et, m in merged.items():
        d = direct[et]
        assert m.n_events == d.n_events
        assert m.sum_value == float(d.sum_dec)


def test_distributed_ntile_matches_window_ntile(spark):
    """The two-pass distributed ntile must reproduce SQL ntile exactly —
    including the first-(n mod k)-buckets-get-one-extra rule — for
    assorted (n, k), and be independent of the partition count."""
    from pyspark.sql import Window

    from newsflow.analytics import distributed_ntile

    for n, k in ((10, 4), (12, 4), (3, 4), (100, 7), (1, 3)):
        df = spark.range(n).select(
            F.col("id"),
            ((F.col("id") * 37) % 13).alias("v"),  # duplicate order values
        )
        want = {
            (r.id, r.nt)
            for r in df.select(
                "id",
                F.ntile(k)
                .over(Window.orderBy(F.col("v").desc(), F.col("id")))
                .alias("nt"),
            ).collect()
        }
        for parts in (2, 5):
            got = {
                (r.id, r.nt)
                for r in distributed_ntile(
                    df,
                    k,
                    [F.col("v").desc(), F.col("id")],
                    "nt",
                    num_partitions=parts,
                ).collect()
            }
            assert got == want, (n, k, parts)


def test_incremental_percentile_merge_equals_recompute(spark):
    """Histogram-merge median == direct single-pass median with the same
    bucket math (Spark-vs-Spark; the oracle proves Spark-vs-DuckDB)."""
    from newsflow.tables import load_table

    merged = {
        r.event_type: (r.n_events, r.p50_value)
        for r in analytics.incremental_percentile_update(
            spark, SF_SMOKE
        ).collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    import pyspark.sql.functions as F2
    from pyspark.sql import Window as W2

    h = events.groupBy(
        "event_type",
        F2.round(F2.col("value") * 100, 0).cast("bigint").alias("bucket"),
    ).agg(F2.count(F2.lit(1)).alias("n"))
    c = h.select(
        "event_type",
        "bucket",
        F2.sum("n")
        .over(
            W2.partitionBy("event_type")
            .orderBy("bucket")
            .rowsBetween(W2.unboundedPreceding, W2.currentRow)
        )
        .alias("cum"),
        F2.sum("n").over(W2.partitionBy("event_type")).alias("total"),
    )
    direct = {
        r.event_type: (r.n, r.p)
        for r in c.groupBy("event_type")
        .agg(
            F2.max("total").cast("bigint").alias("n"),
            (
                F2.min(
                    F2.when(
                        F2.col("cum") * 2 >= F2.col("total"), F2.col("bucket")
                    )
                )
                / 100.0
                + F2.lit(0.0)
            ).alias("p"),
        )
        .collect()
    }
    assert merged == direct
