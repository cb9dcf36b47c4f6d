"""Registered NLP queries (SURVEY.md F11–F13, U1–U2, A9) with exact
DuckDB oracles.

The driver testdata has no HTML corpus, so `doc_period_classify`
synthesizes one: each `documents` row is wrapped into a full HTML page
(script block, sidebar outside <p>, meta date for 2 of 3 rows, injected
topic keywords) and then pushed through the REAL cleaning/classification
chain. The oracle computes the expected output by construction — the
cleaned body via the same string algebra, the period via the known
doc_id residues — so any drift in the regexp chain or the precedence
rules fails the hash."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.scalars import dround, sql_dround
from newsflow.nlp.html import modality_count, process_html
from newsflow.registry import register
from newsflow.tables import load_table

# Modality vocab lists drawn from the testdata documents vocabulary; "a"
# exercises the substring-counting semantics ("a" hits inside "table",
# "data", "batch", ... exactly as the reference's str.count would).
VID_ANALOG = ("scan", "stream")
AUD_ANALOG = ("join", "merge")
TXT_ANALOG = ("filter", "sort", "a")


def _m(k: int) -> F.Column:
    return F.col("doc_id") % k


def _synth_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = (
        F.when(_m(3) == 0, '<meta datePublished: "2024-02-15">')
        .when(_m(3) == 1, "<meta published_time = 2024-05-14>")
        .otherwise("")
    )
    extra1 = F.when(_m(2) == 0, " gemini google").otherwise(" gpt openai")
    extra2 = (
        F.when((_m(3) == 2) & (_m(2) == 0), "february 2024")
        .when((_m(3) == 2) & (_m(2) == 1), "may 2024")
        .otherwise("plain words")
    )
    html = F.concat(
        F.lit('<html><head><script type="text/javascript">'
              "var foo = 1; {a:1}</script>"),
        meta,
        F.lit("</head><body><aside>Sidebar junk!</aside><p>"),
        F.col("text"),
        extra1,
        F.lit("</p><p>More: "),
        extra2,
        F.lit("</p><noscript>skip</noscript></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


_SQL_CLEAN_EXPECTED = """
  trim(regexp_replace(lower(regexp_replace(
      text || CASE WHEN doc_id % 2 = 0 THEN ' gemini google'
                   ELSE ' gpt openai' END
           || ' More: '
           || CASE WHEN doc_id % 3 = 2 AND doc_id % 2 = 0
                     THEN 'february 2024'
                   WHEN doc_id % 3 = 2 AND doc_id % 2 = 1 THEN 'may 2024'
                   ELSE 'plain words' END,
      '[^a-zA-Z0-9\\s]', '', 'g')), '\\s+', ' ', 'g'))
"""


@register(
    "doc_period_classify",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN 'Feb_Gemini_Era'   -- Feb ISO meta + gemini/google
             WHEN 1 THEN 'May_AI_Wars'      -- May ISO meta + gpt/openai
             WHEN 2 THEN 'Feb_Gemini_Era'   -- 'february 2024' fallback
             WHEN 3 THEN 'Other'            -- Feb month, no Feb keywords
             WHEN 4 THEN 'Other'            -- May month, no May keywords
             ELSE 'May_AI_Wars'             -- 'may 2024' fallback
           END AS period,
           {_SQL_CLEAN_EXPECTED} AS text_clean
    FROM documents
    """,
    tags=("nlp",),
)
def doc_period_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/F11/F12 — the full process_html replacement over synthesized
    HTML pages: paragraph-only cleaning + ISO-meta/fallback period
    classification, as one struct-returning native expression."""
    pages = _synth_html(spark, sf_dir)
    proc = pages.withColumn("extracted", process_html(F.col("html")))
    return proc.select(
        "doc_id",
        F.col("extracted.period").alias("period"),
        F.col("extracted.text").alias("text_clean"),
    )


def _sql_count(w: str, target: str = "text") -> str:
    return f"((length({target}) - length(replace({target}, '{w}', ''))) / {len(w)})"


def _sql_modality(words: tuple[str, ...]) -> str:
    return "CAST(" + " + ".join(_sql_count(w) for w in words) + " AS INT)"


@register(
    "modality_counts",
    oracle=f"""
    SELECT doc_id,
           {_sql_modality(VID_ANALOG)} AS n_video,
           {_sql_modality(AUD_ANALOG)} AS n_audio,
           {_sql_modality(TXT_ANALOG)} AS n_text
    FROM documents
    """,
    tags=("nlp", "scalar"),
)
def modality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/F13 — per-document substring-occurrence counts over three
    vocabulary lists (count_modalities parity, incl. the substring
    semantics of str.count)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        modality_count(t, VID_ANALOG).alias("n_video"),
        modality_count(t, AUD_ANALOG).alias("n_audio"),
        modality_count(t, TXT_ANALOG).alias("n_text"),
    )


@register(
    "modality_shares_by_lang",
    oracle=f"""
    WITH counts AS (
      SELECT lang,
             {_sql_modality(VID_ANALOG)} AS v,
             {_sql_modality(AUD_ANALOG)} AS a,
             {_sql_modality(TXT_ANALOG)} AS t
      FROM documents
    )
    SELECT lang,
           CAST(sum(v) AS BIGINT) AS n_video,
           CAST(sum(a) AS BIGINT) AS n_audio,
           CAST(sum(t) AS BIGINT) AS n_text,
           {sql_dround("sum(v) / (sum(v) + sum(a) + sum(t))")} AS share_video,
           {sql_dround("sum(a) / (sum(v) + sum(a) + sum(t))")} AS share_audio,
           {sql_dround("sum(t) / (sum(v) + sum(a) + sum(t))")} AS share_text
    FROM counts
    GROUP BY lang
    """,
    tags=("nlp", "agg"),
)
def modality_shares_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — modality counts per group, row-normalized to shares
    (nlp_analysis.py:213-220's groupby-sum + div(sum(axis=1)) done as one
    Spark aggregation instead of driver-side pandas)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    agg = docs.groupBy("lang").agg(
        F.sum(modality_count(t, VID_ANALOG)).alias("n_video"),
        F.sum(modality_count(t, AUD_ANALOG)).alias("n_audio"),
        F.sum(modality_count(t, TXT_ANALOG)).alias("n_text"),
    )
    total = F.col("n_video") + F.col("n_audio") + F.col("n_text")
    return agg.select(
        "lang",
        "n_video",
        "n_audio",
        "n_text",
        dround(F.col("n_video") / total).alias("share_video"),
        dround(F.col("n_audio") / total).alias("share_audio"),
        dround(F.col("n_text") / total).alias("share_text"),
    )
