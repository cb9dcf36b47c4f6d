"""HTML cleaning, period/topic classification, and modality counting as
native Spark expressions (SURVEY.md §2.8 F11–F13, §2.12 U1–U2).

The reference implements all of this as row-at-a-time Python UDFs
(common-crawl/scripts/nlp_analysis.py: `process_html` :44-95,
`count_modalities` :109-119). Those UDFs fork Python workers per batch,
pickle every row across the JVM↔Python boundary, and break whole-stage
codegen. Every step is regexp/arithmetic, so here the identical semantics
are regexp_replace / regexp_extract_all / when-chains — the whole pipeline
stays inside codegen and scales to a 100 TB HTML corpus.

Semantics are reproduced decision-for-decision, including the quirky
precedence rules (May overrides Feb in the substring month fallback;
content fallbacks override month-based topics; 'scarlett'+'sky' overrides
everything). Cited per function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# --- F11: nuclear cleaning chain (nlp_analysis.py:48-62) -------------------

_CODE_BLOCK_RE = r"(?is)<(script|style|noscript|code|svg).*?</\1>"
_P_TAG_RE = r"(?is)<p[^>]*>(.*?)</p>"
_ANY_TAG_RE = r"<[^<]+?>"
_JS_BRACE_RE = r"\{.*?\}"
_VAR_DECL_RE = r"var\s+\w+"
_NON_ALNUM_RE = r"[^a-zA-Z0-9\s]"


def clean_html(html: Column) -> Column:
    """HTML → lowercase alnum body text, paragraph-only (anti-sidebar).

    Step-for-step twin of process_html parts A–C (nlp_analysis.py:48-62):
    code/script block removal → <p> extraction+join → tag strip →
    newline/tab spacing → JS-brace and var-decl removal → symbol strip →
    lowercase → whitespace collapse.
    """
    no_code = F.regexp_replace(html, _CODE_BLOCK_RE, " ")
    paragraphs = F.regexp_extract_all(no_code, F.lit(_P_TAG_RE), 1)
    body = F.array_join(paragraphs, " ")
    body = F.regexp_replace(body, _ANY_TAG_RE, " ")
    body = F.translate(body, "\n\r\t", "   ")
    body = F.regexp_replace(body, _JS_BRACE_RE, " ")
    body = F.regexp_replace(body, _VAR_DECL_RE, " ")
    body = F.lower(F.regexp_replace(body, _NON_ALNUM_RE, ""))
    return F.trim(F.regexp_replace(body, r"\s+", " "))


# --- F12: period/topic classification (nlp_analysis.py:64-93) --------------

_ISO_DATE_RE = (
    r'(?:datePublished|published_time|date)"?\s*[:=]\s*["\']?'
    r"(2024-([0-9]{2})-[0-9]{2})"
)

FEB_TOPIC_WORDS = ("gemini", "google", "1.5 pro", "bard")
MAY_TOPIC_WORDS = ("gpt", "4o", "omni", "openai", "veo", "sora", "google io")


def _contains_any(body: Column, words: tuple[str, ...]) -> Column:
    cond = None
    for w in words:
        c = body.contains(w)
        cond = c if cond is None else (cond | c)
    return cond


def classify_month(html: Column, body: Column) -> Column:
    """ISO meta-date month on the RAW html, else substring fallback on the
    cleaned body. Fallback precedence: a 'may 2024' mention overrides a
    feb mention (the reference's sequential-if behavior, :73-75)."""
    iso_month = F.regexp_extract(html, _ISO_DATE_RE, 2)
    return (
        F.when(iso_month == "02", "Feb")
        .when(iso_month == "05", "May")
        .when(body.contains("may 2024"), "May")
        .when(
            body.contains("feb 2024") | body.contains("february 2024"), "Feb"
        )
        .otherwise("Unknown")
    )


def classify_period(html: Column, body: Column) -> Column:
    """Topic routing (:77-93). Precedence (last assignment wins in the
    reference, so first when here): 'scarlett'+'sky' → May_AI_Wars,
    'historical accuracy'+'google' → Feb_Gemini_Era, then month-gated
    keyword lists, else Other."""
    month = classify_month(html, body)
    return (
        F.when(
            body.contains("scarlett") & body.contains("sky"), "May_AI_Wars"
        )
        .when(
            body.contains("historical accuracy") & body.contains("google"),
            "Feb_Gemini_Era",
        )
        .when(
            (month == "Feb") & _contains_any(body, FEB_TOPIC_WORDS),
            "Feb_Gemini_Era",
        )
        .when(
            (month == "May") & _contains_any(body, MAY_TOPIC_WORDS),
            "May_AI_Wars",
        )
        .otherwise("Other")
    )


def process_html(html: Column) -> Column:
    """U1 — struct(period, text) replacing the 2-element-array UDF
    (nlp_analysis.py:98-101 unpacked positionally; a struct is the
    self-describing form, SURVEY.md P4)."""
    body = clean_html(html)
    return F.struct(
        classify_period(html, body).alias("period"), body.alias("text")
    )


# --- F13/U2: modality counting (nlp_analysis.py:109-119) -------------------

VIDEO_WORDS = ("video", "sora", "veo", "movie", "film", "camera", "generation")
AUDIO_WORDS = ("voice", "audio", "speech", "listen", "talk", "hear",
               "scarlett", "sky")
TEXT_WORDS = ("text", "code", "token", "context", "read", "summary",
              "document")


def substring_count(text: Column, word: str) -> Column:
    """Non-overlapping occurrence count of `word` — str.count parity via
    length arithmetic, no UDF."""
    removed = F.replace(text, F.lit(word), F.lit(""))
    return (F.length(text) - F.length(removed)) / len(word)


def modality_count(text: Column, words: tuple[str, ...]) -> Column:
    """Sum of occurrence counts over one vocabulary list, as int."""
    total = None
    for w in words:
        c = substring_count(F.lower(text), w)
        total = c if total is None else (total + c)
    return total.cast("int")


def count_modalities(text: Column) -> Column:
    """U2 — struct(video, audio, text) counts with the reference vocab."""
    return F.struct(
        modality_count(text, VIDEO_WORDS).alias("video"),
        modality_count(text, AUDIO_WORDS).alias("audio"),
        modality_count(text, TEXT_WORDS).alias("text"),
    )
