"""The theme ML job re-expressed on the exactly-oracled native LR chain
(VERDICT r13 Next #6) — CountVectorizer-semantics term counts feeding
`ml/lr_native.py`'s unrolled ridge GD, so the whole vocabulary → counts
→ regularized fit → top-k-|coef| pipeline is ONE deterministic chain a
second engine reproduces bit-for-bit.

Reference shape (S3-scripts/.../theme_ml_job.py:59-79): CountVectorizer
(vocabSize, minDF=5) sparse counts → StringIndexer → LogisticRegression
(regParam=0.1) → coefficients aligned to the vocabulary, top 8 by
|score|. The MLlib pipeline form stays as the API-parity twin
(`ml/themes.py::fit_countvec_lr`, unregistered since r14 — L-BFGS
internals are engine-specific so its VALUES can never hash-match
another engine; tests/test_ml.py keeps it covered).

What the native chain pins down, stage by stage:

- **Vocabulary** — per-term document frequency (distinct doc contains
  term), minDF >= {THEME_MIN_DF}, top {THEME_V} by (df DESC, term ASC):
  CountVectorizer's frequency-ordered vocabulary with a deterministic
  tie-break, replicated in SQL by a row_number window over the
  DF-filtered term table. The reference's vocabSize=1000 belongs to the
  MLlib twin; the native chain pins a {THEME_V}-term vocabulary so the
  unrolled GD stays a readable SQL object (the chain itself is
  size-generic — `lr_ctes_sql_for` takes n_coef).
- **Features** — x = [1.0 bias] ++ [count of vocab term v in the doc's
  tokens]: integer-valued doubles, IEEE-exact in both engines
  (Spark `size(filter(t, x -> x = term))` == DuckDB
  `len(list_filter(t, x -> x = v.term))`).
- **Fit** — `lr_fit_xy(..., l2=0.1)`: full-batch GD with MLlib's
  regParam convention (every coefficient except the bias), decimal
  gradients, rounded weights — the lr_native determinism recipe.
- **Report** — top {THEME_TOP_K} terms by (|coef| DESC, term ASC),
  ranked over O(vocabulary) driver/model state.

Scale shape: vocabulary selection is a groupBy + distributed top-k
(orderBy+limit = TakeOrdered, no single-partition window); the count
features are row-local codegen; each GD iteration is one scoring pass
plus an O(d)-row decimal aggregation — the standard broadcast-weights /
tree-aggregate-gradients recipe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.text import sql_tokens, tokens_expr
from newsflow.ml.lr_native import lr_ctes_sql_for, lr_fit_xy
from newsflow.tables import load_table, local_df

THEME_V = 32
THEME_MIN_DF = 5
THEME_ITERS = 8
THEME_RATE = 0.5
THEME_L2 = 0.1
THEME_TOP_K = 8
N_COEF_T = THEME_V + 1  # bias + vocabulary


def theme_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, t): the binary-label training corpus — the two
    most frequent langs play the reference's label_week; docs with no
    tokens are dropped (the themes_arr IS NOT NULL analog)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "zh"))
        .select("doc_id", "lang", tokens_expr("text").alias("t"))
        .filter(F.size("t") > 0)
    )


def theme_vocab(docs: DataFrame) -> list[str]:
    """Top-{THEME_V} terms by document frequency (minDF >= 5, ties by
    term) — CountVectorizer vocabulary semantics, derived via a
    distributed TakeOrdered (orderBy+limit), never a global window."""
    rows = (
        docs.select(
            F.explode(F.array_distinct("t")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= THEME_MIN_DF)
        .orderBy(F.desc("df"), "term")
        .limit(THEME_V)
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (-r["df"], r["term"]))
    return [r["term"] for r in ordered]


def _count_expr(term: str) -> F.Column:
    esc = term.replace("'", "''")
    return F.expr(f"cast(size(filter(t, x -> x = '{esc}')) as double)")


def theme_xy(docs: DataFrame, vocab: list[str]) -> DataFrame:
    """(vec_id, x, y): bias-prepended count vector + y = (lang='en').

    The vector is ZERO-PADDED to a fixed {THEME_V} width when fewer
    terms clear minDF (the corpus regenerates every round; sf0.001
    yields ~31) — the coefficient dimension is part of the unrolled
    chain, so it cannot float with the data. Padding slots are all-zero
    features: their gradient is identically 0, their weight stays 0.0
    through every ridge update, and the report joins only real terms."""
    slots = [
        _count_expr(vocab[i]) if i < len(vocab) else F.lit(0.0)
        for i in range(THEME_V)
    ]
    x = F.array(F.lit(1.0), *slots)
    return docs.select(
        F.col("doc_id").alias("vec_id"),
        x.alias("x"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


def theme_lr_native_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, rank, coef): the trained native theme model's top
    {THEME_TOP_K} vocabulary terms by |coefficient|."""
    docs = theme_docs(spark, sf_dir)
    vocab = theme_vocab(docs)
    # The GD loop makes 2 passes per iteration; checkpoint so the
    # tokenization + 32 count expressions run once.
    xy = theme_xy(docs, vocab).localCheckpoint(eager=True)
    w = lr_fit_xy(
        xy, N_COEF_T, iters=THEME_ITERS, rate=THEME_RATE, l2=THEME_L2
    )
    coefs = [(term, w[i + 1]) for i, term in enumerate(vocab)]
    ranked = sorted(coefs, key=lambda tc: (-abs(tc[1]), tc[0]))[
        :THEME_TOP_K
    ]
    return local_df(
        spark,
        [(t, i + 1, c) for i, (t, c) in enumerate(ranked)],
        "term string, rank long, coef double",
    )


def _theme_ev_sql() -> str:
    """toks → dfreq → vocab → cnts → ev: the feature pipeline as CTEs
    preceding the unrolled GD chain."""
    return f"""toks AS (
      SELECT doc_id, lang, t FROM (
        SELECT doc_id, lang, {sql_tokens("text")} AS t
        FROM documents WHERE lang IN ('en', 'zh')
      ) WHERE len(t) > 0
    ),
    dfreq AS (
      SELECT term, count(*) AS df FROM (
        SELECT DISTINCT doc_id, UNNEST(t) AS term FROM toks
      ) GROUP BY 1 HAVING count(*) >= {THEME_MIN_DF}
    ),
    vocab AS MATERIALIZED (
      SELECT term, ord FROM (
        SELECT term,
               row_number() OVER (ORDER BY df DESC, term) AS ord
        FROM dfreq
      ) WHERE ord <= {THEME_V}
    ),
    ords AS (SELECT UNNEST(range(1, {THEME_V + 1})) AS ord),
    cnts AS (
      SELECT t.doc_id, o.ord,
             CASE WHEN v.term IS NULL THEN 0.0
                  ELSE CAST(len(list_filter(t.t, x -> x = v.term))
                            AS DOUBLE)
             END AS cnt
      FROM toks t
      CROSS JOIN ords o
      LEFT JOIN vocab v ON v.ord = o.ord
    ),
    ev AS (
      SELECT c.doc_id AS vec_id,
             list_prepend(1.0, list(c.cnt ORDER BY c.ord)) AS x,
             max(CASE WHEN t.lang = 'en' THEN 1.0 ELSE 0.0 END) AS y
      FROM cnts c JOIN toks t USING (doc_id)
      GROUP BY c.doc_id
    )"""


def theme_lr_native_oracle_sql() -> str:
    return f"""
    WITH {lr_ctes_sql_for(_theme_ev_sql(), N_COEF_T,
                          iters=THEME_ITERS, rate=THEME_RATE,
                          l2=THEME_L2)}
    SELECT term, rank, coef FROM (
      SELECT v.term,
             row_number() OVER (
               ORDER BY abs(w.w[v.ord + 1]) DESC, v.term
             ) AS rank,
             w.w[v.ord + 1] AS coef
      FROM vocab v, w{THEME_ITERS} w
    ) WHERE rank <= {THEME_TOP_K}
    """
