"""Text-analysis column expressions: tokenization, shingling, language-ID,
quality scoring, fingerprinting.

All are native Spark expressions (no Python UDFs) — the hot path stays
inside whole-stage codegen, which is what makes these viable over a 100 TB
document corpus. Each has a DuckDB-SQL twin used by the oracle queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Reference-style English stopword slice (nlp_analysis.py:129-139 uses
# StopWordsRemover defaults + a domain lexicon; this is the deterministic
# subset shared with the oracle SQL).
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'),"
    " t -> t <> '')"
)


def tokens_expr(c: str = "text") -> Column:
    toks = F.split(F.lower(F.col(c)), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def sql_tokens(c: str = "text") -> str:
    return _SQL_TOKENS.format(c=c)


def shingles_expr(tokens_col: str, n: int = 3) -> Column:
    """Word n-gram shingles: ["a","b","c","d"] → ["a b c", "b c d"].
    Empty array for docs shorter than n tokens.

    Pure higher-order-function expression (transform over an index
    sequence) — stays JVM-side. The CASE guard is LOAD-BEARING, not
    defensive style: callers do filter `size(toks) >= n` upstream, but
    Spark's InferFiltersFromGenerate copies a downstream explode's
    `size(shingles) > 0` predicate into the same Filter node, and
    whole-stage codegen's subexpression elimination then evaluates this
    expression EAGERLY for rows the size guard would have rejected —
    where `sequence(1, size - n + 1)` descends through 0 and
    `slice(toks, 0, n)` throws INVALID_PARAMETER_VALUE.START. A CASE
    branch is exempt from eager CSE, so short rows take the
    empty-array arm no matter how the conjuncts get reordered (found
    by the n=20 span-dedup operator; latent for every n on any corpus
    with sub-n-token rows)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> array_join(slice({tokens_col}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def sql_shingles_rel(
    doc_id: str = "doc_id", n: int = 3, rel: str = "documents"
) -> str:
    """DuckDB relation producing DISTINCT (doc_id, shingle s) pairs from
    ``rel``.text — the oracle twin of shingles_expr + explode + distinct.
    ``rel`` defaults to the documents table; the sampled-audit oracles
    point it at a hash-sampled CTE instead."""
    return f"""
    SELECT DISTINCT {doc_id}, array_to_string(t[i:i+{n - 1}], ' ') AS s
    FROM (SELECT doc_id, {_SQL_TOKENS.format(c="text")} AS t FROM {rel}),
         UNNEST(range(1, len(t) - {n - 2})) AS u(i)
    WHERE len(t) >= {n}
    """


def stopword_ratio_expr(tokens_col: Column) -> Column:
    """Fraction of tokens that are (our fixed-list) English stopwords."""
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(tokens_col, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(tokens_col), F.lit(1))


SQL_STOPWORD_RATIO = (
    "len(list_filter({toks}, t -> list_contains({swlist}, t)))::DOUBLE"
    " / greatest(len({toks}), 1)"
)


def sql_stopword_ratio(toks: str) -> str:
    swlist = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return SQL_STOPWORD_RATIO.format(toks=toks, swlist=swlist)
