"""Markdown report layer (SURVEY.md §2.1 S13) — the thin driver-side
client over collected ≤top-k results.

The reference renders its findings as f-string markdown inside each job
(e.g. gdelt/scripts/general_ml_and_source_sentiment_analysis.py:75-134,
network_analysis.py:82-184). Here rendering is one generic table
formatter plus small composers, fed ONLY by `sinks.collect_report`-sized
frames — the engine/report boundary stays explicit, which is what keeps
the report layer correct at any corpus scale (everything big happened in
Spark before the collect).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd


def df_to_markdown(pdf: pd.DataFrame, float_fmt: str = "{:.2f}") -> str:
    """Render a small pandas frame as a GitHub markdown table."""
    cols = list(pdf.columns)
    lines = [
        "| " + " | ".join(str(c) for c in cols) + " |",
        "|" + "|".join("---" for _ in cols) + "|",
    ]
    for _, row in pdf.iterrows():
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(float_fmt.format(v))
            else:
                cells.append(str(v))
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def weekly_summary_report(
    stats: pd.DataFrame,
    coefficients: pd.DataFrame | None = None,
    auc: float | None = None,
    title: str = "AI News Coverage — Weekly Summary",
) -> str:
    """The summary_report.md shape: per-week stats block, optional model
    section (AUC + signed coefficients)."""
    parts = [f"# {title}", "", "## Weekly statistics", ""]
    parts.append(df_to_markdown(stats))
    if auc is not None:
        parts += ["", "## Model", "", f"Logistic-regression AUC: **{auc:.2f}**"]
    if coefficients is not None:
        parts += ["", "### What distinguishes the eras (signed importance)", ""]
        parts.append(df_to_markdown(coefficients, float_fmt="{:+.4f}"))
    return "\n".join(parts) + "\n"


def network_report(
    sections: Sequence[tuple[str, pd.DataFrame]],
    title: str = "Coverage Networks",
) -> str:
    """The network_report.md shape: one table per company/section
    (top sources, co-mentions, ...)."""
    parts = [f"# {title}"]
    for heading, pdf in sections:
        parts += ["", f"## {heading}", "", df_to_markdown(pdf)]
    return "\n".join(parts) + "\n"


def packing_report(
    waste: pd.DataFrame,
    worst_fill: pd.DataFrame | None = None,
    seq_len: int = 512,
    title: str = "Sequence Packing — Exporter Comparison",
) -> str:
    """The packing-waste report (VERDICT r6 #4, report-layer form): the
    `corpus_pack_waste_report` rows rendered with the decision framing a
    pipeline owner needs — padding cost vs document-splitting cost at
    the configured capacity — plus (optionally) the worst-filled FFD
    sequences from `corpus_pack_ffd` for eyeballing stragglers. Fed by
    collect_report-sized frames only (2 rows + top-k), like every
    composer in this module."""
    parts = [
        f"# {title}",
        "",
        f"Sequence capacity: **{seq_len} tokens**. `ffd` packs whole "
        "documents first-fit-decreasing (pads, never splits); "
        "`fixed_window` concatenates in hash order (splits boundary "
        "docs, pads only each shard's final window).",
        "",
        df_to_markdown(waste, float_fmt="{:.4f}"),
    ]
    if worst_fill is not None and len(worst_fill):
        parts += [
            "",
            "## Worst-filled FFD sequences",
            "",
            df_to_markdown(worst_fill, float_fmt="{:.4f}"),
        ]
    return "\n".join(parts) + "\n"
