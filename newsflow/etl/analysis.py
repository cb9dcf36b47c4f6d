"""The reference's four GDELT analysis jobs as engine functions over a
gdelt_core-shaped DataFrame — the query surface a user of the reference
actually runs day-to-day, re-expressed Spark-first.

Reference jobs reproduced (operators cited):
  * weekly stats block            general_ml_...py:31-43 (A3)
  * per-entity sentiment          sentiment_analysis.py:26-35 (O1 UNION
    ALL of three scan+filter+agg branches → HERE one single-pass explode
    over a company dimension, the SURVEY §2.7 scale rewrite; same rows)
  * top sources per company       network_analysis.py:36-47 (A2/T1)
  * co-mention network edges      network_analysis.py:56-68 (X1/P6/A1/T1)
  * top themes per company        theme_ml_job.py:34-39 (X2/A1/T1)
  * per-source sentiment HAVING   general_ml_...py:242-265 (A4)

All functions take the core frame as input (no hidden reads) so they run
identically on the real GDELT corpus or any synthesized fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from newsflow.functions.scalars import davg_nullable, dround


def _pct(flag_col: str, out: int = 1) -> Column:
    """Share-of-voice: avg(0/1 flag) × 100 (general_ml_...py:37-39)."""
    return dround(F.avg(F.col(flag_col)) * 100, out)


def weekly_stats(
    core: DataFrame, flag_cols: tuple[str, ...]
) -> DataFrame:
    """A3 — the summary stats block: per label_week article count, mean
    tone (v2tone_1), mean negativity (v2tone_3), and one share-of-voice
    percentage per keyword flag."""
    aggs = [
        F.count(F.lit(1)).alias("n_articles"),
        davg_nullable("v2tone_1").alias("avg_tone"),
        davg_nullable("v2tone_3").alias("avg_negative"),
    ]
    aggs += [_pct(fc).alias(f"pct_{fc}") for fc in flag_cols]
    return core.groupBy("label_week").agg(*aggs)


def entity_sentiment(
    core: DataFrame, companies: dict[str, str]
) -> DataFrame:
    """O1 — per-company, per-week mean tone. The reference UNION ALLs one
    filtered aggregate per company (sentiment_analysis.py:26-35),
    re-scanning the table N times; here the company dimension is exploded
    inline so ONE scan feeds all branches — identical output rows.

    `companies`: display name → flag column (e.g. {"Google": "k_google"}).
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("company"), F.col(flag).alias("flag")
            )
            for name, flag in companies.items()
        ]
    )
    exploded = core.select(
        "label_week", "v2tone_1", F.explode(pairs).alias("c")
    ).filter(F.col("c.flag") == 1)
    return exploded.groupBy(
        F.col("c.company").alias("company"), "label_week"
    ).agg(
        davg_nullable("v2tone_1").alias("avg_tone"),
        F.count(F.lit(1)).alias("n_articles"),
    )


def top_sources_for(
    core: DataFrame, flag_col: str, limit: int = 10
) -> DataFrame:
    """A2/T1 — busiest domains for one company flag, with mean tone
    (network_analysis.py:36-47). Deterministic tie-break on domain so the
    LIMIT boundary is stable; planned as TakeOrderedAndProject."""
    return (
        core.filter(F.col(flag_col) == 1)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("article_count"),
            davg_nullable("v2tone_1").alias("avg_sentiment"),
        )
        .orderBy(F.desc("article_count"), "domain")
        .limit(limit)
    )


def co_mentions(
    core: DataFrame,
    flag_col: str,
    exclude: tuple[str, ...],
    limit: int = 10,
) -> DataFrame:
    """X1/P6/A1/T1 — co-occurrence edges: explode orgs of flagged
    articles, drop self/noise names, count partners, top-k
    (network_analysis.py:56-68). At scale the literal NOT-IN stays a
    filter; for a large exclusion table use a left-anti join instead."""
    return (
        core.filter(F.col(flag_col) == 1)
        .select(F.explode("orgs_arr").alias("partner"))
        .filter(~F.col("partner").isin(*exclude))
        .groupBy("partner")
        .agg(F.count(F.lit(1)).alias("n_co_mentions"))
        .orderBy(F.desc("n_co_mentions"), "partner")
        .limit(limit)
    )


def theme_topk(core: DataFrame, flag_col: str, limit: int = 10) -> DataFrame:
    """X2/A1/T1 — most frequent themes among flagged articles
    (theme_ml_job.py:34-39)."""
    return (
        core.filter(
            (F.col(flag_col) == 1) & F.col("themes_arr").isNotNull()
        )
        .select(F.explode("themes_arr").alias("theme"))
        .groupBy("theme")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "theme")
        .limit(limit)
    )


def source_sentiment_having(
    core: DataFrame, flag_col: str, min_articles: int = 3
) -> DataFrame:
    """A4 — per-source mean tone with a HAVING min-support filter
    (general_ml_...py:242-265)."""
    return (
        core.filter(F.col(flag_col) == 1)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("article_count"),
            davg_nullable("v2tone_1").alias("avg_sentiment"),
        )
        .filter(F.col("article_count") >= min_articles)
    )
