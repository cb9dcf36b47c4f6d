"""Report-layer tests: end-to-end from engine queries through
collect_report to rendered markdown (the reference's summary/network
report shapes)."""

from __future__ import annotations

import json

import pytest

from newsflow.etl.analysis import co_mentions, top_sources_for, weekly_stats
from newsflow.etl.gdelt import build_core, read_gkg
from newsflow.reports.markdown import (
    df_to_markdown,
    network_report,
    weekly_summary_report,
)
from newsflow.sources.sinks import collect_report
from tests.test_etl import ROWS


@pytest.fixture(scope="module")
def core(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("gkg_rep") / "raw.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in ROWS))
    return build_core(read_gkg(spark, str(path))).cache()


def test_weekly_summary_end_to_end(core):
    stats = collect_report(
        weekly_stats(core, ("k_openai", "k_google", "k_anthropic"))
    )
    md = weekly_summary_report(stats, auc=0.72)
    assert "## Weekly statistics" in md
    assert "| label_week |" in md
    assert "week_feb" in md and "week_may" in md
    assert "Logistic-regression AUC: **0.72**" in md


def test_network_report_end_to_end(core):
    sources = collect_report(top_sources_for(core, "k_openai", limit=5))
    partners = collect_report(
        co_mentions(core, "k_openai", exclude=("openai",), limit=5)
    )
    md = network_report(
        [("Top sources (OpenAI)", sources), ("Co-mentions (OpenAI)", partners)]
    )
    assert md.count("## ") == 2
    assert "example.co.uk" in md  # the OpenAI-flagged article's domain
    # The kept (keep-first) duplicate's orgs are ["google"] — it must be
    # the partner row; the excluded self-name never appears.
    assert "| google |" in md and "| openai |" not in md


def test_markdown_float_formatting():
    import pandas as pd

    pdf = pd.DataFrame({"name": ["a"], "v": [1.23456]})
    md = df_to_markdown(pdf)
    assert "| 1.23 |" in md
    assert md.splitlines()[1] == "|---|---|"


def test_packing_report_renders_waste_comparison(spark):
    from newsflow.registry import all_specs
    from newsflow.reports.markdown import packing_report
    from tests.conftest import SF_ORACLE

    waste = (
        all_specs()["corpus_pack_waste_report"]
        .build(spark, SF_ORACLE)
        .toPandas()
    )
    worst = (
        all_specs()["corpus_pack_ffd"]
        .build(spark, SF_ORACLE)
        .orderBy("fill_pct")
        .limit(3)
        .toPandas()
    )
    md = packing_report(waste, worst)
    assert "| packer |" in md and "ffd" in md and "fixed_window" in md
    assert "Worst-filled FFD sequences" in md
    assert "512 tokens" in md
