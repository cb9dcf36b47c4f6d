"""Golden parity against the reference's OWN data and published reports.

The reference repo ships the parquet its reports were generated from
(`/root/reference/gdelt/data/*.parquet`). Running this engine's analysis
jobs (newsflow/etl/analysis.py, newsflow/ml/pipeline.py) on that exact
data must reproduce the numbers published in its result markdowns —
end-to-end evidence that a reference user gets identical answers here:

  * gdelt/result_markdowns/summary_report.md (weekly stats, LR)
  * gdelt/result_markdowns/entity_sentiment_report.md
  * gdelt/result_markdowns/network_report.md (sources, co-mentions)
  * gdelt/result_markdowns/theme_report.md
  * gdelt/processing/QA_SUMMARY.txt (row counts, top domain)

Read-only access to the reference data; no reference code is used.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.etl import analysis as A
from newsflow.ml.pipeline import fit_binary_lr

CORE = "/root/reference/gdelt/data/gdelt_core_fixed.parquet"
ML = "/root/reference/gdelt/data/gdelt_ml_features.parquet"

COMPANIES = {
    "Google": "k_google",
    "OpenAI": "k_openai",
    "Anthropic": "k_anthropic",
}
# network_analysis.py:71-73 exclusion lists (configuration, not code).
IGNORE_COMMON = ["reuters", "associated press", "bloomberg"]
IGNORE_GOOGLE = IGNORE_COMMON + ["google", "alphabet", "google inc", "alphabet inc"]
IGNORE_OPENAI = IGNORE_COMMON + ["openai", "chatgpt", "open ai"]


@pytest.fixture(scope="module")
def core(spark):
    return spark.read.parquet(CORE).cache()


def test_qa_row_counts_and_top_domain(spark, core):
    # QA_SUMMARY.txt:3-10,13
    assert core.count() == 3415
    assert core.select("url").distinct().count() == 3415
    weeks = dict(
        (r[0], r[1])
        for r in core.groupBy("label_week").count().collect()
    )
    assert weeks == {"week_feb": 1002, "week_may": 2413}
    top = (
        core.groupBy("domain")
        .count()
        .orderBy(F.desc("count"), "domain")
        .first()
    )
    assert (top["domain"], top["count"]) == ("yahoo.com", 104)


def test_weekly_stats_match_summary_report(spark, core):
    # summary_report.md:20-23
    rows = {
        r["label_week"]: r
        for r in A.weekly_stats(core, ("k_openai", "k_google")).collect()
    }
    feb, may = rows["week_feb"], rows["week_may"]
    assert (feb["avg_tone"], may["avg_tone"]) == (0.59, 2.06)
    assert (feb["avg_negative"], may["avg_negative"]) == (2.77, 1.87)
    assert (feb["pct_k_openai"], may["pct_k_openai"]) == (68.5, 79.1)
    assert (feb["pct_k_google"], may["pct_k_google"]) == (55.6, 47.5)


def test_entity_sentiment_matches_report(spark, core):
    # entity_sentiment_report.md:5-7
    got = {
        (r["company"], r["label_week"]): r["avg_tone"]
        for r in A.entity_sentiment(core, COMPANIES).collect()
    }
    assert got[("Google", "week_feb")] == 1.19
    assert got[("Google", "week_may")] == 2.16
    assert got[("OpenAI", "week_feb")] == -0.20
    assert got[("OpenAI", "week_may")] == 1.99
    assert got[("Anthropic", "week_feb")] == 2.38
    assert got[("Anthropic", "week_may")] == 2.48


def test_top_sources_match_network_report(spark, core):
    # network_report.md:11,25
    g = A.top_sources_for(core, "k_google").first()
    assert (g["domain"], g["article_count"], g["avg_sentiment"]) == (
        "indiatimes.com", 35, 2.01,
    )
    o = A.top_sources_for(core, "k_openai").first()
    assert (o["domain"], o["article_count"], o["avg_sentiment"]) == (
        "yahoo.com", 82, 0.04,
    )


def test_co_mentions_match_network_report(spark, core):
    # network_report.md:42,56-57
    g = A.co_mentions(core, "k_google", tuple(IGNORE_GOOGLE)).first()
    assert (g["partner"], g["n_co_mentions"]) == ("microsoft", 401)
    o = A.co_mentions(core, "k_openai", tuple(IGNORE_OPENAI)).collect()
    assert (o[0]["partner"], o[0]["n_co_mentions"]) == ("google", 953)
    assert (o[1]["partner"], o[1]["n_co_mentions"]) == ("microsoft", 664)


def test_top_themes_match_theme_report(spark, core):
    # theme_report.md:13,22
    g = A.theme_topk(core, "k_google").first()
    assert (g["theme"], g["n"]) == ("TAX_FNCACT", 1311)
    o = A.theme_topk(core, "k_openai").first()
    assert (o["theme"], o["n"]) == ("TAX_FNCACT", 2019)


def test_most_positive_sources_match_summary_report(spark, core):
    # summary_report.md:54,74 — HAVING count>=3, ORDER BY avg DESC
    def most_positive(flag):
        return (
            A.source_sentiment_having(core, flag, min_articles=3)
            .orderBy(F.desc("avg_sentiment"), "domain")
            .first()
        )

    g = most_positive("k_google")
    assert (g["domain"], g["article_count"], g["avg_sentiment"]) == (
        "geeky-gadgets.com", 14, 6.71,
    )
    o = most_positive("k_openai")
    assert (o["domain"], o["article_count"], o["avg_sentiment"]) == (
        "geeky-gadgets.com", 16, 6.24,
    )


def test_lr_auc_and_coefficient_signs_match_summary_report(spark):
    # summary_report.md:9,32-37 — the reference fits on the FULL dataset
    # and evaluates AUC on the training data (the documented quirk).
    ml = spark.read.parquet(ML)
    res = fit_binary_lr(
        ml,
        label_col="label_week",
        feature_cols=[
            "k_openai", "k_google", "k_anthropic",
            "v2tone_1", "v2tone_3", "v2tone_6",
        ],
        train_fraction=1.0,
        eval_on_train=True,
    )
    assert abs(res.auc - 0.72) <= 0.015
    published = {
        "k_openai": -0.9480,
        "k_google": 0.2414,
        "k_anthropic": -1.1265,
        "v2tone_1": -0.1802,
        "v2tone_3": 0.2120,
        "v2tone_6": -0.0043,
    }
    got = dict(res.coefficients)
    for feat, want in published.items():
        # LR is iterative: assert sign + closeness, not bitwise equality.
        assert abs(got[feat] - want) <= 0.02, (feat, got[feat], want)
