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
    tfidf_col: Column, vocabulary: list[str], k: int = 5
) -> Column:
    """M6 — top-k vocabulary terms by TF-IDF, as a native expression.

    Matches the reference UDF's semantics (nlp_analysis.py:157-163): only
    nonzero entries compete; ties broken by vocabulary index (ascending),
    which is exactly Python's stable sort on (−score, position).
    """
    scores = vector_to_array(tfidf_col)
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
