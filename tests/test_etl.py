"""Golden tests for the GDELT ETL (newsflow.etl.gdelt) on a hand-written
GKG fixture — the unit-level analog of the reference's QA_SUMMARY.txt
contract (SURVEY.md §5). Every expected value below is computed by hand
from the fixture rows."""

from __future__ import annotations

import json

import pytest

from newsflow.etl.gdelt import (
    build_core,
    build_ml_features,
    qa_summary,
    read_gkg,
)

# One JSON object per GKG mention. Crafted to exercise:
#   * URL dedup with an out-of-order duplicate (keep earliest date_ts)
#   * null URL drop
#   * v2tone short (pad), long (truncate), unparseable, and null rows
#   * null/empty themes & orgs
#   * label windows feb / may / other
#   * keyword quirks: substring match ("io" inside "visionary"),
#     hyphenated keyword that can never match ("gpt-4"), digit-only
#     token dropping ("2024" out, "gpt4" stays)
ROWS = [
    {
        "GKGRECORDID": "20240213103000-1",
        "DATE": "20240213103000",
        "URL": "https://www.example.co.uk/ai/gpt4-visionary-2024",
        "Themes": " ELECTION; TAX_FNCACT ;;",
        "Organizations": "openai;  microsoft ",
        "V2Tone": "-1.5,3.62,5.62,9.25,21.59,0.72,490",
    },
    {  # duplicate URL, EARLIER timestamp → this one must win keep-first
        "GKGRECORDID": "20240212093000-7",
        "DATE": "20240212093000",
        "URL": "https://www.example.co.uk/ai/gpt4-visionary-2024",
        "Themes": "LEADER",
        "Organizations": "google",
        "V2Tone": "2.0,1.0,1.0,1.0,1.0,1.0,100",
    },
    {  # may window; short v2tone → slots 3..7 null; empty themes
        "GKGRECORDID": "20240514120000-2",
        "DATE": "20240514120000",
        "URL": "https://news.site.com/gemini-update",
        "Themes": "",
        "Organizations": None,
        "V2Tone": "4.5,2.0",
    },
    {  # outside both windows; long v2tone → truncate; unparseable slot 2
        "GKGRECORDID": "20240101000000-3",
        "DATE": "20240101000000",
        "URL": "https://blog.dev.org/claude-3-review",
        "Themes": None,
        "Organizations": "anthropic",
        "V2Tone": "1.0,abc,3.0,4.0,5.0,6.0,7.0,8.0,9.0",
    },
    {  # null URL → dropped before dedup
        "GKGRECORDID": "20240515000000-4",
        "DATE": "20240515000000",
        "URL": None,
        "Themes": "X",
        "Organizations": "y",
        "V2Tone": None,
    },
]


@pytest.fixture(scope="module")
def core(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("gkg") / "raw.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in ROWS))
    raw = read_gkg(spark, str(path))
    return build_core(raw).cache()


def test_read_gkg_json_array_mode(spark, tmp_path):
    """S4 — the '['-sniffing dual-mode scan accepts array-JSON too."""
    path = tmp_path / "raw.json"
    path.write_text(json.dumps(ROWS, indent=1))
    raw = read_gkg(spark, str(path))
    assert raw.count() == len(ROWS)
    assert set(raw.columns) == set(ROWS[0])


def test_dedup_and_null_url(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    # 5 raw rows → 1 null URL dropped, 1 duplicate URL collapsed.
    assert len(rows) == 3
    # Keep-first by date_ts: the Feb-12 mention wins over Feb-13.
    assert "20240212093000-7" in rows
    assert "20240213103000-1" not in rows


def test_label_windows_and_day(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    assert rows["20240212093000-7"]["label_week"] == "week_feb"
    assert rows["20240514120000-2"]["label_week"] == "week_may"
    assert rows["20240101000000-3"]["label_week"] == "other"
    assert str(rows["20240212093000-7"]["day"]) == "2024-02-12"


def test_domain_extraction(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    assert rows["20240212093000-7"]["domain"] == "example.co.uk"
    assert rows["20240514120000-2"]["domain"] == "site.com"
    assert rows["20240101000000-3"]["domain"] == "dev.org"


def test_semicolon_split_null_safety(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    assert rows["20240212093000-7"]["themes_arr"] == ["LEADER"]
    assert rows["20240514120000-2"]["themes_arr"] == []  # "" → []
    assert rows["20240101000000-3"]["themes_arr"] == []  # null → []
    assert rows["20240101000000-3"]["num_themes"] == 0
    assert rows["20240101000000-3"]["orgs_arr"] == ["anthropic"]


def test_v2tone_pad_truncate_safecast(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    short = rows["20240514120000-2"]
    assert short["v2tone_1"] == 4.5 and short["v2tone_2"] == 2.0
    assert all(short[f"v2tone_{i}"] is None for i in range(3, 8))
    long = rows["20240101000000-3"]
    assert long["v2tone_1"] == 1.0
    assert long["v2tone_2"] is None  # "abc" → safe-cast null
    assert long["v2tone_7"] == 7.0  # slots 8,9 truncated


def test_url_tokens_and_keyword_quirks(core):
    rows = {r["GKGRECORDID"]: r for r in core.collect()}
    kept = rows["20240212093000-7"]
    # "2024" is a pure-digit token → dropped; "gpt4" kept.
    assert kept["url_tokens"] == [
        "https", "www", "example", "co", "uk", "ai", "gpt4", "visionary",
    ]
    # k_openai: "gpt" matches inside "gpt4" (substring quirk).
    assert kept["k_openai"] == 1
    # k_google: "io" matches inside "visionary" — the documented quirk.
    assert kept["k_google"] == 1
    assert kept["k_anthropic"] == 0
    gem = rows["20240514120000-2"]
    assert gem["k_google"] == 1  # "gemini" path token
    assert gem["k_openai"] == 0
    claude = rows["20240101000000-3"]
    assert claude["k_anthropic"] == 1  # "claude" in path


def test_qa_summary_golden(core):
    qa = qa_summary(core).collect()[0].asDict()
    assert qa["n_rows"] == 3
    assert qa["n_unique_urls"] == 3
    assert qa["min_date"] == "2024-01-01 00:00:00"
    assert qa["max_date"] == "2024-05-14 12:00:00"
    assert qa["n_week_feb"] == 1
    assert qa["n_week_may"] == 1
    assert qa["pct_missing_themes"] == 66.67  # 2 of 3 empty
    assert qa["pct_missing_orgs"] == 33.33  # 1 of 3 null→[]
