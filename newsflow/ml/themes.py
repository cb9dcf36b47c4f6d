"""Sparse-count-vector logistic regression — the reference's theme ML job
(S3-scripts/.../theme_ml_job.py) re-expressed as one `pyspark.ml.Pipeline`.

Reference shape (theme_ml_job.py:59-79):

    filter(themes_arr IS NOT NULL)                      (P8)
    CountVectorizer(themes_arr, vocabSize=1000, minDF=5)  (M4, theme config)
    StringIndexer(label_week -> label)                  (M7)
    LogisticRegression(regParam=0.1)                    (M9, regularized)
    coefficients aligned to model_cv.vocabulary         (M12, vocab-aligned)

Differences by design: single Pipeline fit instead of loose stages; the
training frame is cached before the iterative L-BFGS fit; the coefficient
table ranks deterministically (|coef| desc, then term) instead of relying
on pandas sort stability (theme_ml_job.py:76-79).

Against the driver's tables the theme analog is the `documents` corpus:
token arrays play `themes_arr` and the two most frequent `lang` values
play the binary `label_week`.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import CountVectorizer, StringIndexer
from pyspark.sql import DataFrame, SparkSession

from newsflow.tables import local_df


@dataclass
class ThemeLRResult:
    model: PipelineModel
    vocabulary: list[str]
    coefficients: list[tuple[str, float]]  # (term, coef), vocab order
    intercept: float
    label_values: list[str]


def fit_countvec_lr(
    df: DataFrame,
    array_col: str,
    label_col: str,
    vocab_size: int = 1000,
    min_df: float = 5.0,
    reg_param: float = 0.1,
) -> ThemeLRResult:
    """Fit the theme-job pipeline: sparse term counts -> regularized LR.

    The label column must be binary (two distinct values), as the
    reference's `label_week` was.
    """
    train = df.select(label_col, array_col).filter(
        F.col(array_col).isNotNull() & (F.size(array_col) > 0)
    ).cache()

    pipeline = Pipeline(
        stages=[
            CountVectorizer(
                inputCol=array_col,
                outputCol="features",
                vocabSize=vocab_size,
                minDF=min_df,
            ),
            StringIndexer(inputCol=label_col, outputCol="label"),
            LogisticRegression(
                featuresCol="features", labelCol="label", regParam=reg_param
            ),
        ]
    )
    model = pipeline.fit(train)
    cv_model, indexer, lr_model = model.stages
    vocab = list(cv_model.vocabulary)
    coefs = [(t, float(c)) for t, c in zip(vocab, lr_model.coefficients)]
    train.unpersist()
    return ThemeLRResult(
        model=model,
        vocabulary=vocab,
        coefficients=coefs,
        intercept=float(lr_model.intercept),
        label_values=list(indexer.labels),
    )


def vocab_coefficient_table(
    spark: SparkSession, result: ThemeLRResult, k: int = 8
) -> DataFrame:
    """M12 theme variant — top-k vocabulary terms by |coefficient|
    (theme_ml_job.py:74-79's `sort_values('Score').head(8)`), with a
    deterministic term tie-break."""
    ranked = sorted(
        result.coefficients, key=lambda tc: (-abs(tc[1]), tc[0])
    )[:k]
    return local_df(
        spark,
        [(t, c, abs(c), i + 1) for i, (t, c) in enumerate(ranked)],
        "term string, coef double, abs_coef double, rank int",
    )
