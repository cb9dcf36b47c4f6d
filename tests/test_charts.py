"""Chart sink golden tests — structural assertions over the SVG output
(bar counts, proportionality, zero-axis placement, panel composition),
not pixel equality. Mirrors the reference's 7-graph surface
(S3-scripts/.../Results/Graphs/graph_*.png)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from newsflow.reports import charts as C


def _bars(svg: str) -> list[dict]:
    out = []
    for m in re.finditer(r'<rect class="bar" ([^/]*)/>', svg):
        attrs = dict(re.findall(r'(\w+)="([^"]*)"', m.group(1)))
        out.append(attrs)
    return out


def test_barh_proportional_and_labeled():
    svg = C.barh(["alpha", "beta", "gamma"], [10.0, 20.0, 5.0], title="T")
    bars = _bars(svg)
    assert len(bars) == 3
    widths = [float(b["width"]) for b in bars]
    assert abs(widths[1] / widths[0] - 2.0) < 1e-6
    assert abs(widths[0] / widths[2] - 2.0) < 1e-6
    for lab in ("alpha", "beta", "gamma", "T"):
        assert lab in svg


def test_barh_diverging_zero_axis():
    svg = C.barh(["f1", "f2"], [-3.0, 6.0])
    bars = _bars(svg)
    assert len(bars) == 2
    neg, pos = bars
    # Negative bar ends where positive starts (shared zero axis).
    zero_from_neg = float(neg["x"]) + float(neg["width"])
    zero_from_pos = float(pos["x"])
    assert abs(zero_from_neg - zero_from_pos) < 1e-6
    # Colors differ by sign.
    assert neg["fill"] != pos["fill"]
    # Width ratio matches magnitude ratio.
    assert abs(float(pos["width"]) / float(neg["width"]) - 2.0) < 1e-6


def test_grouped_bar_counts_and_legend():
    pdf = pd.DataFrame(
        {
            "week": ["feb", "may"],
            "Google": [60.0, 30.0],
            "OpenAI": [30.0, 60.0],
            "Anthropic": [10.0, 10.0],
        }
    )
    svg = C.graph_share_of_voice(pdf)
    bars = _bars(svg)
    assert len(bars) == 6  # 2 groups x 3 series
    heights = [float(b["height"]) for b in bars]
    # ylim fixed to (0,100): 60% bar is twice the 30% bar, 6x the 10%.
    assert abs(heights[0] / heights[1] - 2.0) < 1e-6
    assert abs(heights[0] / heights[2] - 6.0) < 1e-6
    for s in ("Google", "OpenAI", "Anthropic"):
        assert s in svg


def test_panel_row_composes_both_panels():
    p1 = C.barh(["a"], [1.0], title="left")
    p2 = C.barh(["b"], [2.0], title="right")
    svg = C.panel_row([p1, p2])
    assert svg.count("<g transform=") == 2
    assert "left" in svg and "right" in svg
    # Inner SVG wrappers must have been stripped.
    assert svg.count("<svg") == 1


def test_reference_graph_composers():
    per_company = [
        ("Google", pd.DataFrame({"source": ["s1", "s2"],
                                 "article_count": [9, 4]})),
        ("OpenAI", pd.DataFrame({"source": ["s3"], "article_count": [7]})),
    ]
    svg = C.graph_top_sources(per_company)
    assert len(_bars(svg)) == 3
    coeffs = pd.DataFrame(
        {"feature": ["f_a", "f_b"], "coefficient": [-1.5, 2.5]}
    )
    svg2 = C.graph_feature_importance(coeffs)
    assert "Model Impact" in svg2 and len(_bars(svg2)) == 2
    themes = pd.DataFrame({"theme": ["T1", "T2"], "count": [5, 3]})
    assert len(_bars(C.graph_dominant_themes(themes))) == 2


def test_save_png_gated(tmp_path):
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        C.save_png(["a"], [1.0], str(tmp_path / "x.png"))
        assert (tmp_path / "x.png").exists()
    else:
        with pytest.raises(NotImplementedError):
            C.save_png(["a"], [1.0], str(tmp_path / "x.png"))


def test_svg_escaping():
    svg = C.barh(["a<b&c"], [1.0], title='q"t')
    assert "a&lt;b&amp;c" in svg and "q&quot;t" in svg


def test_panel_row_grows_to_tallest_inner_panel():
    import re as _re

    from newsflow.reports.charts import barh, panel_row

    tall = barh([f"bar{i}" for i in range(30)], [float(i) for i in range(30)],
                title="tall")
    short = barh(["a", "b"], [1.0, 2.0], title="short")
    composed = panel_row([short, tall])
    outer_h = float(_re.search(r'height="(\d+(?:\.\d+)?)"', composed).group(1))
    inner_h = float(_re.search(r'height="(\d+(?:\.\d+)?)"', tall).group(1))
    assert outer_h >= inner_h, (outer_h, inner_h)
    assert outer_h >= 60 + 24 * 30
