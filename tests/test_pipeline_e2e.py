"""End-to-end pipeline test: the runner script's main() over the GKG
fixture must produce the full artifact set (parquet tables + QA +
reports) with the expected content."""

from __future__ import annotations

import json
import sys

import pytest

from tests.test_etl import ROWS


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pipeline")
    raw = base / "raw.jsonl"
    raw.write_text("\n".join(json.dumps(r) for r in ROWS))
    out = base / "out"

    import scripts.run_gdelt_pipeline as pipe

    argv = sys.argv
    sys.argv = [
        "run_gdelt_pipeline.py",
        "--input", str(raw),
        "--output", str(out),
    ]
    try:
        pipe.main()
    finally:
        sys.argv = argv
    return out


def test_artifacts_exist(pipeline_out):
    for name in (
        "gdelt_core.parquet",
        "gdelt_ml_features.parquet",
        "QA_SUMMARY.md",
        "summary_report.md",
        "network_report.md",
        "theme_report.md",
        "entity_sentiment_report.md",
    ):
        assert (pipeline_out / name).exists(), name


def test_graph_artifacts(pipeline_out):
    graphs = pipeline_out / "Graphs"
    expected = {
        "graph_top_sources.svg",
        "graph_partnerships.svg",
        "graph_entity_sentiment.svg",
        "graph_share_of_voice.svg",
        "graph_dominant_themes.svg",
    }
    names = {p.name for p in graphs.iterdir()}
    assert expected <= names, names
    for n in expected:
        body = (graphs / n).read_text()
        assert body.startswith("<svg") and body.rstrip().endswith("</svg>")


def test_core_partitioned_by_label_week(pipeline_out):
    parts = {
        p.name
        for p in (pipeline_out / "gdelt_core.parquet").iterdir()
        if p.name.startswith("label_week=")
    }
    assert parts == {
        "label_week=week_feb", "label_week=week_may", "label_week=other"
    }


def test_report_content(pipeline_out):
    qa = (pipeline_out / "QA_SUMMARY.md").read_text()
    assert "| 3 |" in qa  # 3 rows after dedup + null-URL drop
    summary = (pipeline_out / "summary_report.md").read_text()
    assert "week_feb" in summary and "pct_k_openai" in summary
    # Tiny fixture → ML stage skipped by the min-rows guard.
    assert "AUC" not in summary
    network = (pipeline_out / "network_report.md").read_text()
    assert "Co-mentions — OpenAI" in network
    themes = (pipeline_out / "theme_report.md").read_text()
    assert "LEADER" in themes  # kept dup's theme, google-flagged
