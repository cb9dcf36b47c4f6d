"""End-to-end GDELT pipeline: raw GKG JSON/JSONL → typed core + ML
parquet → analyses → markdown reports.

This is the whole reference project as ONE Spark application:
  build_datasets.py + transform_pandas_friendly_to_spark_friendly.py
  (pandas ETL + timestamp fixer)            → newsflow.etl.gdelt
  make_docs.py (QA summary)                 → qa_summary
  sentiment/network/theme/general_ml jobs   → newsflow.etl.analysis
  report markdowns                          → newsflow.reports.markdown

Usage:
  python scripts/run_gdelt_pipeline.py --input RAW.jsonl --output OUT_DIR
      [--min-ml-rows 50]

Everything above the collect_report boundary is distributed; reports
render from ≤top-k collected rows.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow.etl.analysis import (  # noqa: E402
    co_mentions,
    entity_sentiment,
    source_sentiment_having,
    theme_topk,
    top_sources_for,
    weekly_stats,
)
from newsflow.etl.gdelt import (  # noqa: E402
    build_core,
    build_ml_features,
    qa_summary,
    read_gkg,
    write_core,
)
from newsflow.ml.pipeline import coefficient_table, fit_binary_lr  # noqa: E402
from newsflow.reports.markdown import (  # noqa: E402
    df_to_markdown,
    network_report,
    weekly_summary_report,
)
from newsflow.reports import charts  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.sources.sinks import collect_report  # noqa: E402

COMPANIES = {
    "Google": "k_google",
    "OpenAI": "k_openai",
    "Anthropic": "k_anthropic",
}
LR_FEATURES = ["k_openai", "k_google", "k_anthropic",
               "v2tone_1", "v2tone_3", "v2tone_6"]


def main(stop_session: bool = False) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--min-ml-rows",
        type=int,
        default=50,
        help="skip the LR stage below this many feb/may rows",
    )
    args = ap.parse_args()
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="newsflow-gdelt-pipeline")

    # --- ETL ------------------------------------------------------------
    core = build_core(read_gkg(spark, args.input)).cache()
    write_core(core, str(out / "gdelt_core.parquet"))
    build_ml_features(core).write.mode("overwrite").parquet(
        str(out / "gdelt_ml_features.parquet")
    )
    (out / "QA_SUMMARY.md").write_text(
        "# Data QA\n\n" + df_to_markdown(qa_summary(core).toPandas()) + "\n"
    )

    # --- analyses → reports --------------------------------------------
    stats = collect_report(weekly_stats(core, tuple(COMPANIES.values())))

    auc = None
    coefs = None
    ml_input = core.filter(F.col("label_week") != "other")
    if ml_input.count() >= args.min_ml_rows:
        result = fit_binary_lr(ml_input, "label_week", LR_FEATURES, seed=42)
        auc = result.auc
        coefs = collect_report(coefficient_table(spark, result))
    (out / "summary_report.md").write_text(
        weekly_summary_report(stats, coefficients=coefs, auc=auc)
    )

    sections = []
    for name, flag in COMPANIES.items():
        sections.append(
            (
                f"Top sources — {name}",
                collect_report(top_sources_for(core, flag, limit=10)),
            )
        )
        sections.append(
            (
                f"Co-mentions — {name}",
                collect_report(
                    co_mentions(core, flag, exclude=(name.lower(),), limit=10)
                ),
            )
        )
    (out / "network_report.md").write_text(network_report(sections))

    theme_sections = [
        (
            f"Top themes — {name}",
            collect_report(theme_topk(core, flag, limit=10)),
        )
        for name, flag in COMPANIES.items()
    ]
    (out / "theme_report.md").write_text(
        network_report(theme_sections, title="Theme Coverage")
    )

    ent = collect_report(entity_sentiment(core, COMPANIES))
    having = collect_report(source_sentiment_having(core, "k_openai", 3))
    (out / "entity_sentiment_report.md").write_text(
        network_report(
            [("Entity sentiment by week", ent),
             ("Sources with ≥3 OpenAI articles", having)],
            title="Entity Sentiment",
        )
    )

    # --- graphs (the reference's Results/Graphs/*.png surface, as SVG) --
    graphs = out / "Graphs"
    graphs.mkdir(exist_ok=True)
    top_frames = [
        (name, sections[2 * i][1].rename(columns={"domain": "source"}))
        for i, name in enumerate(COMPANIES)
    ]
    charts.save_svg(
        charts.graph_top_sources(top_frames),
        str(graphs / "graph_top_sources.svg"),
    )
    partner_frames = [
        (
            name,
            sections[2 * i + 1][1].rename(columns={"n_co_mentions": "count"}),
        )
        for i, name in enumerate(COMPANIES)
    ]
    charts.save_svg(
        charts.graph_partnerships(partner_frames),
        str(graphs / "graph_partnerships.svg"),
    )
    ent_wide = (
        ent.pivot(index="company", columns="label_week", values="avg_tone")
        .reset_index()
        .rename(columns={"company": "entity"})
        .fillna(0.0)
    )
    charts.save_svg(
        charts.graph_entity_sentiment(ent_wide),
        str(graphs / "graph_entity_sentiment.svg"),
    )
    sov = stats[["label_week"] + [f"pct_{f}" for f in COMPANIES.values()]]
    sov = sov.rename(
        columns={"label_week": "week"}
        | {f"pct_{f}": name for name, f in COMPANIES.items()}
    )
    charts.save_svg(
        charts.graph_share_of_voice(sov),
        str(graphs / "graph_share_of_voice.svg"),
    )
    themes_all = theme_sections[0][1].rename(columns={"n": "count"})
    charts.save_svg(
        charts.graph_dominant_themes(themes_all),
        str(graphs / "graph_dominant_themes.svg"),
    )
    if coefs is not None:
        charts.save_svg(
            charts.graph_feature_importance(
                coefs.rename(columns={"coef": "coefficient"})
            ),
            str(graphs / "graph_feature_importance.svg"),
        )

    print(f"pipeline complete → {out}")
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(stop_session=True)
