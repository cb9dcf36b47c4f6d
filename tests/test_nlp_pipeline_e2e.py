"""Offline end-to-end test of the Common-Crawl pipeline composition:
fake CDX + WARC fetchers serve crafted HTML pages; the pipeline must
classify the eras, drop the off-topic page, count modalities, and attach
TF-IDF phrases."""

from __future__ import annotations

import gzip
import json

from newsflow.nlp.pipeline import run_commoncrawl_pipeline

PAGES = {
    "https://site-a.com/feb": (
        '<head>"datePublished": "2024-02-14"</head>'
        "<p>Gemini launch coverage: google shows video generation and more"
        " video tools for everyone this winter</p>"
    ),
    "https://site-b.com/may": (
        "<head>published_time = 2024-05-14</head>"
        "<p>OpenAI gpt event: voice voice and audio demos with sora clips"
        " impressed the audience greatly</p>"
    ),
    "https://site-c.com/offtopic": (
        "<p>gardening tips for spring tomatoes</p>"
    ),
    "https://site-d.com/missing": None,  # CDX miss → dropped
}


def test_commoncrawl_pipeline_offline(spark):
    # CDX: encode the article url into the WARC filename so the WARC
    # fetcher can serve the right page (offset/length are arbitrary).
    def fake_cdx(url: str, headers: dict) -> tuple[int, bytes]:
        article = url.split("url=")[1].split("&")[0]
        if PAGES.get(article) is None:
            return 404, b""
        hit = {"filename": f"warc::{article}", "offset": "0", "length": "9999"}
        return 200, json.dumps(hit).encode()

    def fake_warc(url: str, headers: dict) -> tuple[int, bytes]:
        article = url.split("warc::")[1]
        record = (
            b"WARC/1.0\r\n\r\nHTTP/1.1 200 OK\r\n\r\n"
            + PAGES[article].encode()
        )
        return 206, gzip.compress(record)

    # One fetcher serves both endpoints (dispatch on URL shape).
    def fetcher(url: str, headers: dict) -> tuple[int, bytes]:
        return (
            fake_warc(url, headers)
            if "warc::" in url
            else fake_cdx(url, headers)
        )

    urls = spark.createDataFrame([(u,) for u in PAGES], ["url"])
    out = {
        r["url"]: r
        for r in run_commoncrawl_pipeline(urls, fetcher=fetcher).collect()
    }

    # Off-topic and missing pages dropped; both eras classified.
    assert set(out) == {
        "https://site-a.com/feb", "https://site-b.com/may"
    }
    feb = out["https://site-a.com/feb"]
    may = out["https://site-b.com/may"]
    assert feb["period"] == "Feb_Gemini_Era"
    assert may["period"] == "May_AI_Wars"
    # Modality counts (reference vocab): feb page says video 3x
    # ("video generation" → generation also counts), may page voice 2x +
    # audio + sora.
    assert feb["n_video"] >= 3
    assert may["n_audio"] >= 3
    # TF-IDF attached non-empty distinctive phrases.
    assert feb["top_phrases"] and may["top_phrases"]
    assert feb["top_phrases"] != may["top_phrases"]
