"""Registered text-analysis queries (documents table): tokenization stats,
quality scoring, language-ID heuristic, fingerprinting, term frequency.

All pure JVM expressions — at 100 TB these run at parquet-scan speed with
one aggregation shuffle each (or none for the per-document ones).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.scalars import dround
from newsflow.functions.text import (
    EN_STOPWORDS,
    sql_shingles_rel,
    sql_stopword_ratio,
    sql_tokens,
    tokens_expr,
)
from newsflow.registry import register
from newsflow.tables import load_table

# Language lexicons for the n-gram/keyword language-ID heuristic. The
# testdata corpus is synthetic English-ish; lexicons are defined over its
# vocabulary so the heuristic exercises real argmax mechanics.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "english": ("the", "a", "fast", "slow", "big", "small"),
    "commerce": ("customer", "order", "part", "line", "supplier"),
    "engine": ("spark", "query", "scan", "join", "filter", "agg"),
}


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct_tokens,
           (round(list_aggregate(list_transform(t, x -> length(x)),
                                 'sum')::DOUBLE
                  / greatest(len(t), 1) + 1e-9, 4) + 0.0) AS avg_token_len
    FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
    """,
    tags=("text",),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting (whitespace/alnum tokenizer)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_expr("text")
    total_len = F.aggregate(
        F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        dround(
            total_len.cast("double") / F.greatest(F.size(t), F.lit(1)), 4
        ).alias("avg_token_len"),
    )


_QUALITY_SQL = f"""
    SELECT doc_id,
           (round(
              0.4 * least(len(t) / 100.0, 1.0)
            + 0.3 * (1.0 - {sql_stopword_ratio('t')})
            + 0.3 * (len(list_distinct(t))::DOUBLE / greatest(len(t), 1))
            + 1e-9, 4) + 0.0) AS quality_score,
           (round({sql_stopword_ratio('t')} + 1e-9, 4) + 0.0)
             AS stopword_ratio,
           (round(len(list_distinct(t))::DOUBLE / greatest(len(t), 1)
                  + 1e-9, 4) + 0.0) AS distinct_ratio
    FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
"""


@register("doc_quality_scores", oracle=_QUALITY_SQL, tags=("text",))
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + stopword ratio + lexical diversity
    (the reference's content-quality filters, nlp_analysis.py:48-62,
    generalized for training-data curation)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_expr("text")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(t)
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    stop_ratio = n_sw / F.greatest(n, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(t)) / F.greatest(n, F.lit(1))
    score = (
        0.4 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - stop_ratio)
        + 0.3 * distinct_ratio
    )
    return docs.select(
        "doc_id",
        dround(score, 4).alias("quality_score"),
        dround(stop_ratio, 4).alias("stopword_ratio"),
        dround(distinct_ratio, 4).alias("distinct_ratio"),
    )


def _lexicon_sql(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_LANG_SCORES_SQL = ",\n".join(
    f"len(list_intersect(list_distinct(t), {_lexicon_sql(w)}))"
    f" AS score_{lang}"
    for lang, w in LANG_LEXICONS.items()
)
_LANG_CASE_SQL = (
    "CASE "
    + " ".join(
        # argmax with deterministic lexicographic tie-break: a language wins
        # iff no strictly-greater score exists and no lexicographically
        # earlier language ties it.
        f"WHEN {' AND '.join(f'score_{lang} >= score_{other}' for other in LANG_LEXICONS if other != lang)} "
        f"AND {' AND '.join(f'score_{lang} > score_{other}' for other in sorted(LANG_LEXICONS) if other < lang)} "
        f"THEN '{lang}'"
        if any(o < lang for o in LANG_LEXICONS)
        else (
            f"WHEN {' AND '.join(f'score_{lang} >= score_{other}' for other in LANG_LEXICONS if other != lang)} "
            f"THEN '{lang}'"
        )
        for lang in sorted(LANG_LEXICONS)
    )
    + " ELSE 'unknown' END"
)


@register(
    "doc_lang_id",
    oracle=f"""
    SELECT doc_id, lang_pred, score_english, score_commerce, score_engine
    FROM (
      SELECT doc_id, {_LANG_CASE_SQL} AS lang_pred,
             score_english, score_commerce, score_engine
      FROM (
        SELECT doc_id, {_LANG_SCORES_SQL}
        FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
      )
    )
    """,
    tags=("text", "langid"),
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-lexicon language-ID heuristic: per-lexicon hit counts +
    deterministic argmax (lexicographic tie-break)."""
    return _lang_scored(load_table(spark, sf_dir, "documents"))


def _lang_scored(docs: DataFrame) -> DataFrame:
    t = F.array_distinct(tokens_expr("text"))
    scored = docs.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect(t, F.array(*[F.lit(w) for w in words]))
            ).alias(f"score_{lang}")
            for lang, words in LANG_LEXICONS.items()
        ],
    )
    langs = sorted(LANG_LEXICONS)
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = (
                F.col(f"score_{lang}") >= F.col(f"score_{other}")
                if other > lang
                else F.col(f"score_{lang}") > F.col(f"score_{other}")
            )
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang))
            if pred is None
            else pred.when(cond, F.lit(lang))
        )
    pred = pred.otherwise(F.lit("unknown"))
    return scored.select(
        "doc_id",
        pred.alias("lang_pred"),
        "score_english",
        "score_commerce",
        "score_engine",
    )


@register(
    "lang_label_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, {_LANG_CASE_SQL} AS lang_pred
      FROM (
        SELECT doc_id, {_LANG_SCORES_SQL}
        FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
      )
    ),
    cm AS (
      SELECT d.lang, p.lang_pred, count(*) AS n
      FROM documents d JOIN pred p USING (doc_id)
      GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM cm GROUP BY 1)
    SELECT lang, lang_pred, n, n_lang,
           (round(n::DOUBLE / n_lang + 1e-9, 4) + 0.0) AS share
    FROM cm JOIN tot USING (lang)
    """,
    tags=("text", "langid", "quality"),
)
def lang_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-label vs heuristic-prediction confusion matrix — the
    label-quality audit run before trusting either side for filtering
    (a language cell whose rows scatter across predictions is mislabeled
    or code-mixed). One scan computes predictions row-locally; the
    matrix is a (|langs| x |preds|)-bounded groupBy, shares derived from
    exact integer counts."""
    docs = load_table(spark, sf_dir, "documents")
    pred = _lang_scored(docs).select("doc_id", "lang_pred")
    cm = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cm.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    return (
        cm.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            "n_lang",
            (
                F.round(
                    F.col("n").cast("double") / F.col("n_lang") + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("share"),
        )
    )


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id, min(md5(s)) AS fingerprint, count(*) AS n_shingles
    FROM ({sql_shingles_rel(n=3)})
    GROUP BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash-1 over 3-gram shingles (a content
    signature stable under reordering-free edits).

    Zero-shuffle form: the shingle set is already a per-row array
    (`doc_shingle_arrays`), so the min-hash is `array_min(transform(...))`
    and the set size is `size(...)` — a pure projection that runs at scan
    speed, where the earlier explode + groupBy formulation shuffled every
    (doc, shingle) pair just to re-group them by doc."""
    from newsflow.dedup.core import doc_shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    return doc_shingle_arrays(docs, 3).select(
        "doc_id",
        F.array_min(
            F.transform("shingles", lambda s: F.md5(s))
        ).alias("fingerprint"),
        F.size("shingles").alias("n_shingles"),
    )


@register(
    "token_frequency_topk",
    oracle=f"""
    SELECT tok, count(*) AS freq
    FROM (
      SELECT unnest({sql_tokens()}) AS tok FROM documents
    )
    WHERE length(tok) > 2
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    tags=("text", "topk"),
)
def token_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-20 (explode + count + TakeOrdered; the
    reference's value_counts pattern, nlp_analysis.py:178-179)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_expr("text")).alias("tok"))
        .filter(F.length("tok") > 2)
        .groupBy("tok")
        .count()
        .withColumnRenamed("count", "freq")
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


@register(
    "source_token_totals",
    oracle=f"""
    SELECT source,
           CAST(sum(len({sql_tokens()})) AS BIGINT) AS total_tokens,
           CAST(sum(len(regexp_extract_all(
                  text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
             AS total_bpe_ish_tokens,
           count(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
    tags=("text",),
)
def source_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways per source: whitespace/alnum tokens and a
    BPE-ish regex segmentation (letters | digits | single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(tokens_expr("text"))).alias("total_tokens"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    "text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
                )
            )
        ).alias("total_bpe_ish_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# GPT-2-style byte-level pretokenizer pattern (public tokenizer regex,
# simplified to ASCII classes and with the RE2-incompatible lookahead
# dropped so the same pattern runs in Spark (Java regex) and DuckDB (RE2):
# contraction suffixes | space-prefixed letter runs | space-prefixed digit
# runs | space-prefixed punctuation runs | whitespace runs. Counting these
# matches approximates a BPE tokenizer's pre-merge segment count — the
# standard cheap token-budget estimator for corpus planning.
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


@register(
    "doc_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '{BPE_PRETOKEN_PATTERN.replace("'", "''")}')) AS n_bpe_tokens,
           len({sql_tokens()}) AS n_ws_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def doc_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE-ish token estimate (GPT-2 pretokenizer regex)
    next to the whitespace/alnum token count — both pure JVM regex, no
    tokenizer library in the hot path."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_PRETOKEN_PATTERN)).alias(
            "n_bpe_tokens"
        ),
        F.size(tokens_expr("text")).alias("n_ws_tokens"),
    )


# PII patterns — conservative, alternation-free regexes that behave
# identically under Java regex (Spark) and RE2 (DuckDB): no ambiguous
# backtracking, character classes + bounded quantifiers only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 -]{6,}[0-9]"


def _sql_pii(pat: str) -> str:
    return pat.replace("'", "''")


@register(
    "pii_scrub_battery",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_sql_pii(PII_EMAIL)}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_sql_pii(PII_IPV4)}'))
                AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '{_sql_pii(PII_PHONE)}'))
                AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_sql_pii(PII_EMAIL)}', '<EMAIL>', 'g'),
               '{_sql_pii(PII_IPV4)}', '<IP>', 'g'),
               '{_sql_pii(PII_PHONE)}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
    tags=("text", "pii"),
)
def pii_scrub_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction battery: per-document counts of
    email / IPv4 / phone-shaped spans and the md5 of the redacted text
    (replacement order email -> ip -> phone, identical in the oracle).
    Row-local regex work — scales at parquet-scan speed, zero shuffle;
    the hash (rather than the redacted text itself) keeps the result
    frame small and engine-comparable."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )
