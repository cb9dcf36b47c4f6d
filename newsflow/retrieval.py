"""Full-text retrieval and language-model scoring over the documents
table: BM25 ranking, tokenizer-vocab building, native TF-IDF keywords,
unigram-LM surprisal (perplexity proxy), and per-source KL divergence
(domain-shift scoring).

These extend the reference's NLP surface (nlp_analysis.py builds MLlib
TF-IDF vectors for downstream ML; S3-scripts' theme_ml_job ranks terms)
with the retrieval/data-quality operators a training-data pipeline needs:
BM25 is the standard lexical-search scorer, unigram surprisal is the
cheapest perplexity-style quality signal, and per-source KL against the
corpus distribution flags off-distribution sources before mixing.

Engineering for exact oracle parity (the pattern proven by graph.py's
PageRank): every transcendental scoring formula exists ONCE as SQL text,
evaluated by Spark via ``F.expr`` and inlined verbatim into the DuckDB
oracle — so both engines parse the identical expression tree and
constant literals. Scores are epsilon-rounded before any ranking or
cross-row summation, and unordered float sums go through the
decimal-cast trick (``scalars.dsum``) so aggregation order cannot
produce cross-engine drift.

Scale shape: everything is explode → groupBy over (doc, term) pairs —
the classic inverted-index build, one shuffle keyed on the term (or the
doc for per-doc scores). Vocabulary-sized side tables (term stats,
corpus totals) broadcast; at 100 TB the vocabulary is bounded to a
top-N + OOV bucket (documented per operator) so the broadcast side
stays fixed-size while the document side streams.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from newsflow.functions.scalars import dround, sql_dround
from newsflow.functions.text import sql_tokens, tokens_expr
from newsflow.registry import register
from newsflow.tables import load_table

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "join", "window")
BM25_K = 20
# Okapi BM25 with the standard k1=1.2, b=0.75 operating point. The
# formula is SQL TEXT shared by both engines (see module docstring):
# idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — the non-negative variant.
_BM25_TERM_SQL = (
    "ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    " * ({tf} * (1.0 + 1.2))"
    " / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl}))"
)


def _bm25_score_sql(n: str, dl: str, avgdl: str, tfs: list[str], dfs: list[str]) -> str:
    terms = [
        _BM25_TERM_SQL.format(n=n, df=df, tf=tf, dl=dl, avgdl=avgdl)
        for tf, df in zip(tfs, dfs)
    ]
    return " + ".join(terms)


_BM25_ORACLE = f"""
WITH per AS (
  SELECT doc_id, len(t) AS dl,
         {", ".join(
             f"len(list_filter(t, x -> x = '{w}')) AS tf_{i}"
             for i, w in enumerate(BM25_TERMS)
         )}
  FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
),
st AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl,
         {", ".join(
             f"count_if(tf_{i} > 0) AS df_{i}"
             for i in range(len(BM25_TERMS))
         )}
  FROM per
),
scored AS (
  SELECT doc_id,
         {sql_dround(
             _bm25_score_sql(
                 "n", "dl", "(CAST(sum_dl AS DOUBLE) / n)",
                 [f"tf_{i}" for i in range(len(BM25_TERMS))],
                 [f"df_{i}" for i in range(len(BM25_TERMS))],
             ),
             6,
         )} AS bm25
  FROM per, st
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {BM25_K}
"""


def _term_eq(w: str):
    # Single-parameter closure: F.filter treats a 2-arg callable as
    # (element, index), so a `w=w` default-arg lambda would compare
    # tokens against the array INDEX.
    return lambda x: x == F.lit(w)


@register(
    "bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("retrieval", "text"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k lexical search for a fixed query-term set.

    One tokenizing projection computes per-document length and per-term
    frequencies row-locally (no shuffle); corpus stats (N, avgdl, per-term
    document frequency) are ONE 1-row aggregate broadcast back, so the
    scoring pass is scan-speed. Ranking is on the ROUNDED score with a
    doc_id tie-break, so the top-k set is engine-independent. At 100 TB
    the global top-k is TakeOrderedAndProject — no full sort.
    """
    return bm25_topk_df(load_table(spark, sf_dir, "documents"))


def bm25_topk_df(docs: DataFrame) -> DataFrame:
    per = docs.select(
        "doc_id", tokens_expr("text").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter("toks", _term_eq(w))).alias(f"tf_{i}")
            for i, w in enumerate(BM25_TERMS)
        ],
    )
    st = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    score = _bm25_score_sql(
        "n", "dl", "(CAST(sum_dl AS DOUBLE) / n)",
        [f"tf_{i}" for i in range(len(BM25_TERMS))],
        [f"df_{i}" for i in range(len(BM25_TERMS))],
    )
    scored = per.crossJoin(F.broadcast(st)).select(
        "doc_id", dround(F.expr(score), 6).alias("bm25")
    )
    # Two-stage top-k instead of filter(rank<=K) over a GLOBAL window:
    # Spark's WindowGroupLimit rank-pushdown does NOT fire for an empty
    # partition spec (verified on this build — a partitioned rank<=K
    # gets WindowGroupLimit, the global form gets a full
    # Exchange SinglePartition sort of the corpus-proportional score
    # frame). orderBy().limit(K) compiles to TakeOrderedAndProject
    # (per-partition partial top-k, K-row merge); the rank window then
    # runs over K rows — bounded by construction.
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_K)
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return top.select(
        "doc_id", "bm25", F.row_number().over(w).alias("rank")
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary build
# ---------------------------------------------------------------------------

VOCAB_RESERVED = 4  # ids 0-3 reserved for <pad>/<unk>/<bos>/<eos>


@register(
    "tokenizer_vocab",
    oracle=f"""
    SELECT token, n_occurrences,
           row_number() OVER (ORDER BY n_occurrences DESC, token)
             + {VOCAB_RESERVED - 1} AS token_id
    FROM (
      SELECT t AS token, count(*) AS n_occurrences
      FROM (SELECT unnest({sql_tokens()}) AS t FROM documents)
      GROUP BY 1
    )
    """,
    tags=("retrieval", "text", "training-export"),
)
def tokenizer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level tokenizer vocabulary: contiguous ids by frequency.

    Ids assigned by (count DESC, token ASC) after {VOCAB_RESERVED}
    reserved special-token slots — the deterministic assignment every
    tokenizer trainer needs. The id ranking runs through
    `ops.scale.distributed_rank` (range-partitioned two-pass, no global
    single-task window): a practical vocabulary is top-N, but the
    UNTRIMMED distinct-token frame this ranks is 10⁷-10⁸ rows on web
    corpora — corpus-vocabulary-proportional, not tiny — and round 4's
    WindowGroupLimit finding showed empty-partition-spec windows never
    get rank pushdown, so the polite "bounded frame" justification the
    earlier global window carried did not actually hold at 100 TB. The
    corpus-sized work remains the one explode+groupBy shuffle keyed on
    the token.
    """
    from newsflow.ops.scale import distributed_rank

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return distributed_rank(
        counts,
        [F.col("n_occurrences").desc(), F.col("token")],
        out_col="_r",
    ).select(
        "token",
        "n_occurrences",
        (F.col("_r") + (VOCAB_RESERVED - 1)).alias("token_id"),
    )


# ---------------------------------------------------------------------------
# Native TF-IDF keywords (exactly-oracled twin of the MLlib tfidf tier)
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3
# Smooth idf (sklearn's formulation): ln((1+N)/(1+df)) + 1 — shared text.
_TFIDF_SQL = "(ln((1.0 + {n}) / (1.0 + {df})) + 1.0) * {tf}"


_TFIDF_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, unnest({sql_tokens()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         {sql_dround(_TFIDF_SQL.format(n="n", df="df", tf="tf"), 6)} AS tfidf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term
         ) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOPK}
"""


@register(
    "doc_tfidf_keywords",
    oracle=_TFIDF_ORACLE,
    tags=("retrieval", "text"),
)
def doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{TFIDF_TOPK} TF-IDF keywords, native expressions.

    The exactly-checkable twin of the MLlib ``tfidf_top_terms`` tier
    (which is rows-only because CountVectorizer's vocab tie-order is
    engine-internal): same smooth-idf formula as sklearn, deterministic
    (rounded-score DESC, term ASC) ranking. Two shuffles — (doc, term)
    tf and term df — then the df side broadcasts (vocabulary-bounded)
    and the per-doc top-k window shuffles on doc_id only.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
    tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tk.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            dround(F.expr(_TFIDF_SQL.format(n="n", df="df", tf="tf")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "term", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity proxy)
# ---------------------------------------------------------------------------

# Per-term surprisal -ln(c_t / n_total). ln (unlike +,-,*,/,sqrt) is NOT
# IEEE-correctly-rounded, so the two engines can differ in the last ulp
# (~1e-15 at these magnitudes); the surprisal is rounded at 7 decimals —
# coarse enough that a last-ulp drift has ~1e-8 probability of
# straddling a rounding boundary — BEFORE the tf-weighted combination,
# and the per-doc sum goes through decimal so aggregation order is
# irrelevant. There are only |vocab| distinct ln evaluations.
_SURPRISAL_SQL = "-ln(CAST({ct} AS DOUBLE) / {ntot})"
_SURPRISAL_ROUND = 7


_NLL_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, unnest({sql_tokens()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
lm AS (SELECT term, count(*) AS ct FROM tk GROUP BY 1),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS ntot FROM lm),
sur AS (
  SELECT term,
         {sql_dround(
             _SURPRISAL_SQL.format(ct="ct", ntot="ntot"), _SURPRISAL_ROUND
         )} AS sur
  FROM lm, tot
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       (round(CAST(sum(CAST(tf * sur AS DECIMAL(25,10))) AS DOUBLE)
              / sum(tf) + 1e-9, 6) + 0.0) AS avg_nll
FROM tf JOIN sur USING (term)
GROUP BY doc_id
"""


@register(
    "doc_unigram_nll",
    oracle=_NLL_ORACLE,
    tags=("retrieval", "text", "quality"),
)
def doc_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram negative log-likelihood — the
    cheapest perplexity-style quality signal (CCNet/Gopher pipelines use
    a KenLM perplexity gate; the unigram LM is its zero-dependency
    lower tier, trained on the corpus itself in one aggregation).

    Plan: one explode+groupBy for (doc, term) counts, one for the global
    LM (vocabulary-bounded → broadcast), then a per-doc sum keyed on
    doc_id. At 100 TB the LM table is top-N + OOV-smoothed; the corpus
    side never collects.
    """
    return unigram_nll_df(load_table(spark, sf_dir, "documents"))


def unigram_nll_df(docs: DataFrame) -> DataFrame:
    tk = docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
    tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    lm = tk.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    tot = lm.agg(F.sum("ct").alias("ntot"))
    sur = lm.crossJoin(F.broadcast(tot)).select(
        "term",
        dround(
            F.expr(_SURPRISAL_SQL.format(ct="ct", ntot="ntot")),
            _SURPRISAL_ROUND,
        ).alias("sur"),
    )
    contrib = (F.col("tf") * F.col("sur")).cast("decimal(25,10)")
    return (
        tf.join(F.broadcast(sur), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.round(
                    F.sum(contrib).cast("double") / F.sum("tf")
                    + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence vs the corpus distribution (domain shift)
# ---------------------------------------------------------------------------

# Add-one-smoothed source distribution vs unsmoothed corpus distribution:
# P_s(t) = (c_st + 1)/(n_s + V), Q(t) = c_t/n_tot; KL = Σ_t P_s ln(P_s/Q).
_KL_TERM_SQL = (
    "((({cst} + 1.0) / ({ns} + {v}))"
    " * ln((({cst} + 1.0) / ({ns} + {v}))"
    " / (CAST({ct} AS DOUBLE) / {ntot})))"
)


# Same ln-ulp argument as the surprisal: round each KL term at 9
# decimals (magnitudes are <= ~0.5) before the order-free decimal sum.
_KL_ROUND = 9


_KL_ORACLE = f"""
WITH tk AS (
  SELECT source, unnest({sql_tokens()}) AS term FROM documents
),
corpus AS (SELECT term, count(*) AS ct FROM tk GROUP BY 1),
tot AS (
  SELECT sum(ct) AS ntot, count(*) AS v FROM corpus
),
src AS (SELECT source, term, count(*) AS cst FROM tk GROUP BY 1, 2),
ns AS (SELECT source, CAST(sum(cst) AS BIGINT) AS ns FROM src GROUP BY 1),
grid AS (
  SELECT n.source, c.term, c.ct, n.ns, coalesce(s.cst, 0) AS cst
  FROM ns n CROSS JOIN corpus c
  LEFT JOIN src s ON s.source = n.source AND s.term = c.term
)
SELECT source, min(ns) AS n_tokens,
       (round(CAST(sum(
            CAST({sql_dround(
                _KL_TERM_SQL.format(
                    cst="cst", ns="ns", v="v", ct="ct", ntot="ntot"
                ),
                _KL_ROUND,
            )} AS DECIMAL(25,12))
        ) AS DOUBLE) + 1e-9, 6) + 0.0) AS kl_divergence
FROM grid, tot
GROUP BY source
"""


@register(
    "source_kl_divergence",
    oracle=_KL_ORACLE,
    tags=("retrieval", "text", "quality"),
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over the token distribution — the standard
    domain-shift score for deciding whether a source belongs in a
    training mixture (add-one smoothing keeps unseen-term contributions
    finite).

    The dense source×vocabulary grid is built by cross-joining the
    per-source totals with the BROADCAST vocabulary table — at 100 TB
    the vocabulary is bounded (top-N + OOV bucket) so the grid is
    #sources × N, independent of corpus size; per-term contributions
    are rounded then decimal-summed so the reduction order is free.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("source", F.explode(tokens_expr("text")).alias("term"))
    corpus = tk.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    tot = corpus.agg(
        F.sum("ct").alias("ntot"), F.count(F.lit(1)).alias("v")
    )
    src = tk.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cst"))
    ns = src.groupBy("source").agg(F.sum("cst").alias("ns"))
    grid = (
        ns.crossJoin(F.broadcast(corpus))
        .join(F.broadcast(src), ["source", "term"], "left")
        .withColumn("cst", F.coalesce(F.col("cst"), F.lit(0)))
    )
    contrib = dround(
        F.expr(
            _KL_TERM_SQL.format(cst="cst", ns="ns", v="v", ct="ct", ntot="ntot")
        ),
        _KL_ROUND,
    ).cast("decimal(25,12)")
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.min("ns").alias("n_tokens"),
            (
                F.round(F.sum(contrib).cast("double") + F.lit(1e-9), 6)
                + F.lit(0.0)
            ).alias("kl_divergence"),
        )
    )
