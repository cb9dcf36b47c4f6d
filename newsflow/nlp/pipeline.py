"""The Common-Crawl pipeline composed end-to-end (reference:
common-crawl/sourcing/common-crawl.ipynb + scripts/nlp_analysis.py):

    article URLs → CDX index lookup → WARC range-read → HTML clean +
    period classify → modality counts → TF-IDF top phrases → results
    frame (+ optional CSV/report sinks by the caller).

Every stage is one of the engine's existing distributed operators; this
module only composes them. Network access stays injected (`fetcher`),
so the whole pipeline is testable offline and the production run just
passes the real fetcher.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from newsflow.ml.tfidf import fit_transform_tfidf
from newsflow.nlp.html import count_modalities, process_html
from newsflow.sources.fetch import (
    Fetcher,
    cdx_lookup,
    urllib_fetcher,
    warc_fetch_html,
)

VALID_PERIODS = ("Feb_Gemini_Era", "May_AI_Wars")


def fetch_corpus(
    urls: DataFrame,
    fetcher: Fetcher = urllib_fetcher,
    index: str = "CC-MAIN-2024-22",
) -> DataFrame:
    """URLs → (url, html) via CDX + WARC range-reads; misses dropped."""
    coords = cdx_lookup(urls, index=index, fetcher=fetcher)
    pages = warc_fetch_html(coords, fetcher=fetcher)
    return pages.filter(F.col("html").isNotNull()).select("url", "html")


def classify_corpus(pages: DataFrame) -> DataFrame:
    """(url, html) → (url, period, text, modality counts), keeping only
    the two studied eras (nlp_analysis.py:102-103 filter)."""
    proc = pages.withColumn("x", process_html(F.col("html"))).select(
        "url",
        F.col("x.period").alias("period"),
        F.col("x.text").alias("text"),
    )
    kept = proc.filter(F.col("period").isin(*VALID_PERIODS)).filter(
        F.length("text") > 0
    )
    return kept.withColumn("m", count_modalities(F.col("text"))).select(
        "url",
        "period",
        "text",
        F.col("m.video").alias("n_video"),
        F.col("m.audio").alias("n_audio"),
        F.col("m.text").alias("n_text"),
    )


def analyze_corpus(
    classified: DataFrame, top_k: int = 5, vocab_size: int = 1500
) -> DataFrame:
    """Attach top TF-IDF bigrams per article (M1-M6 chain). Returns the
    nlp_final_results shape: url, period, modality counts, top phrases."""
    scored = fit_transform_tfidf(
        classified, k=top_k, vocab_size=vocab_size, min_df=1.0
    )
    return scored.select(
        "url",
        "period",
        "n_video",
        "n_audio",
        "n_text",
        F.array_join("top_terms", "|").alias("top_phrases"),
    )


def run_commoncrawl_pipeline(
    urls: DataFrame,
    fetcher: Fetcher = urllib_fetcher,
    index: str = "CC-MAIN-2024-22",
    top_k: int = 5,
) -> DataFrame:
    """The full pipeline; callers write the result with sinks.write_csv
    and render reports from collect_report frames."""
    pages = fetch_corpus(urls, fetcher=fetcher, index=index)
    classified = classify_corpus(pages).cache()
    return analyze_corpus(classified, top_k=top_k)
