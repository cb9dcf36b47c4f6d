"""Text-feature MLlib chain (SURVEY.md §2.10 M1–M6): Tokenizer →
StopWordsRemover(custom lexicon) → NGram → CountVectorizer → IDF, plus a
*native* top-k TF-IDF term extractor.

Reference: common-crawl/scripts/nlp_analysis.py:125-164. Its `get_top_k`
is a row-at-a-time Python UDF closing over the CountVectorizer vocabulary
(:156-163) — a pickled closure shipped to every Python worker and a
whole-stage-codegen break. Here the same computation is a pure column
expression over `vector_to_array`: sort (−score, index) structs, slice k,
map indices through a vocabulary literal — the plan stays JVM-side.

Scale note: the vocabulary literal is bounded by `vocabSize` (the
reference caps it at 1500 / 1000), so the expression stays small. For an
unbounded vocabulary, posexplode the scores and broadcast-join a vocab
table instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    NGram,
    StopWordsRemover,
    Tokenizer,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame

from newsflow.tables import local_df

# Domain stopword lexicon added to the English defaults — the reference's
# pattern of brand/domain noise terms (nlp_analysis.py:129-139).
DOMAIN_STOPWORDS = (
    "ai", "google", "openai", "gpt", "gemini", "data", "news",
)


def tfidf_pipeline(
    input_col: str = "text",
    ngram_n: int = 2,
    vocab_size: int = 1500,
    min_df: float = 1.0,
    extra_stopwords: tuple[str, ...] = DOMAIN_STOPWORDS,
) -> Pipeline:
    """M1–M5 as one Pipeline: words → filtered → ngrams → tf → tfidf."""
    stopwords = StopWordsRemover.loadDefaultStopWords("english") + list(
        extra_stopwords
    )
    return Pipeline(
        stages=[
            Tokenizer(inputCol=input_col, outputCol="words"),
            StopWordsRemover(
                inputCol="words", outputCol="filtered", stopWords=stopwords
            ),
            NGram(n=ngram_n, inputCol="filtered", outputCol="ngrams"),
            CountVectorizer(
                inputCol="ngrams",
                outputCol="tf",
                vocabSize=vocab_size,
                minDF=min_df,
            ),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )


def top_k_terms(
    tfidf_col: Column,
    vocabulary: list[str],
    k: int = 5,
    round_dp: int | None = None,
) -> Column:
    """M6 — top-k vocabulary terms by TF-IDF, as a native expression.

    Matches the reference UDF's semantics (nlp_analysis.py:157-163): only
    nonzero entries compete; ties broken by vocabulary index (ascending),
    which is exactly Python's stable sort on (−score, position).

    ``round_dp`` ranks by the EPSILON-ROUNDED score instead of the raw
    double — the oracled chain's contract (a last-ulp ln() difference
    between engines must not flip the ranking; the r3 rounded-sim
    ordering rule)."""
    from newsflow.functions.scalars import dround

    scores = vector_to_array(tfidf_col)
    if round_dp is not None:
        scores = F.transform(scores, lambda s: dround(s, round_dp))
    idx = F.sequence(F.lit(0), F.size(scores) - F.lit(1))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            (-F.element_at(scores, i + F.lit(1))).alias("neg"),
            i.alias("idx"),
        ),
    )
    nonzero = F.filter(pairs, lambda p: p["neg"] < 0)
    top = F.slice(F.array_sort(nonzero), 1, k)
    vocab = F.array(*[F.lit(t) for t in vocabulary])
    return F.transform(
        top, lambda p: F.element_at(vocab, p["idx"] + F.lit(1))
    )


def fit_transform_tfidf(
    df: DataFrame, k: int = 5, **pipeline_kwargs
) -> DataFrame:
    """Fit the chain and attach `top_terms` (array<string>) per row."""
    pipeline = tfidf_pipeline(**pipeline_kwargs)
    model = pipeline.fit(df)
    vocab = model.stages[3].vocabulary
    out = model.transform(df)
    return out.withColumn(
        "top_terms", top_k_terms(F.col("tfidf"), list(vocab), k=k)
    )


# The oracled chain's deterministic parameters (tfidf_top_terms).
TFIDF_PINNED_VOCAB = 300
ROUND_TFIDF = 6


def pinned_vocabulary(docs_ngrams: DataFrame, size: int) -> list[str]:
    """Deterministic vocabulary: top-``size`` ngrams by (corpus count
    desc, gram asc) — the tie-stable selection rule CountVectorizer's
    fit lacks (its order on tied counts is unspecified, the reason the
    fitted-vocab chain stayed rows-only through round 11). Collected to
    the driver: bounded by ``size``, a model parameter — the
    `from_vocabulary` API's required form (the KMeans-centroid
    precedent: small learned state IS the model artifact)."""
    rows = (
        docs_ngrams.select(F.explode("ngrams").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "g")
        .limit(size)
        .collect()
    )
    return [r["g"] for r in rows]


def fit_transform_tfidf_oracle_chain(
    df: DataFrame,
    k: int = 5,
    vocab_size: int = TFIDF_PINNED_VOCAB,
    ngram_n: int = 2,
) -> tuple[DataFrame, list[str]]:
    """The M1-M6 chain in its fully-deterministic, SQL-replicable form:
    every stage is the REAL MLlib transformer, with the two
    non-contractual choices pinned down (VERDICT r11 Next #5):

    - RegexTokenizer('\\\\s+') instead of Tokenizer — Tokenizer splits
      on SINGLE whitespace chars, emitting empty tokens inside runs
      (java.lang.String#split semantics incl. trailing-empty removal),
      which no SQL engine reproduces as a stable contract; the regex
      form is the standard whitespace tokenization both engines state
      identically (lower + split \\\\s+ + drop empties).
    - `CountVectorizerModel.from_vocabulary(pinned_vocabulary(...))`
      instead of the fit — index i IS vocabulary[i].

    Stopwords are the vendored English list + DOMAIN_STOPWORDS
    (ml/stopwords.py; runtime-equality with
    `loadDefaultStopWords('english')` is asserted in tests). IDF is
    still FIT (document frequencies are order-independent):
    idf_j = ln((D + 1) / (df_j + 1)). Returns (frame + top_terms,
    vocabulary)."""
    from pyspark.ml.feature import CountVectorizerModel, RegexTokenizer

    from newsflow.ml.stopwords import ENGLISH_STOPWORDS

    stages = [
        RegexTokenizer(
            inputCol="text", outputCol="words", pattern="\\s+"
        ),
        StopWordsRemover(
            inputCol="words",
            outputCol="filtered",
            stopWords=list(ENGLISH_STOPWORDS) + list(DOMAIN_STOPWORDS),
        ),
        NGram(n=ngram_n, inputCol="filtered", outputCol="ngrams"),
    ]
    out = df
    for s in stages:
        out = s.transform(out)
    vocab = pinned_vocabulary(out, vocab_size)
    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="ngrams", outputCol="tf"
    )
    tf = cv.transform(out)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    scored = idf_model.transform(tf)
    top = top_k_terms_exploded(
        scored, vocab, id_col="doc_id", k=k, round_dp=ROUND_TFIDF
    )
    return (
        scored.join(top, "doc_id", "left").withColumn(
            "top_terms",
            F.coalesce("top_terms", F.array().cast("array<string>")),
        ),
        vocab,
    )


def top_k_terms_exploded(
    scored: DataFrame,
    vocabulary: list[str],
    id_col: str = "doc_id",
    tfidf_col: str = "tfidf",
    k: int = 5,
    round_dp: int = ROUND_TFIDF,
) -> DataFrame:
    """The SCALE form of `top_k_terms` (the module docstring's
    'posexplode the scores and broadcast-join a vocab table' path),
    and — measured — the faster one even at vocab 300: the literal-array
    expression ranks a 300-struct array per row through the interpreted
    evaluator (~9.5 s steady-state on a 200-doc slice), while this plan
    is a posexplode + window + broadcast join, all codegen (~1 s).
    Returns (id_col, top_terms array<string>) for ids with >= 1
    positive score; semantics identical to `top_k_terms` (only
    positive ROUNDED scores compete, ties break by vocabulary
    index)."""
    from pyspark.sql import Window

    from newsflow.functions.scalars import dround

    spark = scored.sparkSession
    vocab_df = local_df(
        spark, list(enumerate(vocabulary)), "idx int, term string"
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("r"), "idx")
    ranked = (
        scored.select(
            id_col,
            F.posexplode(vector_to_array(F.col(tfidf_col))).alias(
                "idx", "s"
            ),
        )
        .withColumn("r", dround(F.col("s"), round_dp))
        .filter(F.col("r") > 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .join(F.broadcast(vocab_df), "idx")
    )
    terms = F.transform(
        F.array_sort(F.collect_list(F.struct("rn", "term"))),
        lambda x: x["term"],
    )
    return ranked.groupBy(id_col).agg(terms.alias("top_terms"))


def transform_tfidf_fixed_vocab(
    df: DataFrame,
    vocabulary: list[str],
    k: int = 5,
    ngram_n: int = 2,
    extra_stopwords: tuple[str, ...] = DOMAIN_STOPWORDS,
) -> DataFrame:
    """The golden-test variant of the chain (SURVEY §7 'what's hard' #4):
    CountVectorizer breaks count ties in an unspecified order, so fitted
    vocabularies aren't a stable contract. Pinning the vocabulary with
    `CountVectorizerModel.from_vocabulary` makes the whole chain (and
    `top_terms`) fully deterministic — index i IS vocabulary[i]. IDF is
    still fit (document frequencies are order-independent)."""
    from pyspark.ml.feature import CountVectorizerModel

    stopwords = StopWordsRemover.loadDefaultStopWords("english") + list(
        extra_stopwords
    )
    stages = [
        Tokenizer(inputCol="text", outputCol="words"),
        StopWordsRemover(
            inputCol="words", outputCol="filtered", stopWords=stopwords
        ),
        NGram(n=ngram_n, inputCol="filtered", outputCol="ngrams"),
    ]
    out = df
    for s in stages:
        out = s.transform(out)
    cv = CountVectorizerModel.from_vocabulary(
        vocabulary, inputCol="ngrams", outputCol="tf"
    )
    tf = cv.transform(out)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    scored = idf_model.transform(tf)
    return scored.withColumn(
        "top_terms", top_k_terms(F.col("tfidf"), list(vocabulary), k=k)
    )
