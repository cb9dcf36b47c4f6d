"""MLlib surface (SURVEY.md §2.10 M7–M12): the reference's logistic-
regression stage re-expressed as a single `pyspark.ml.Pipeline`.

Reference shape (gdelt/scripts/general_ml_and_source_sentiment_analysis.py
:52-69 and S3-scripts/.../original_first_try_glue_job.py:25-67):

    fillna(0, features)                      (P10)
    StringIndexer(label_week -> label)       (M7)
    VectorAssembler(feature cols -> vector)  (M8)
    LogisticRegression                       (M9)
    randomSplit([0.8, 0.2], seed=42)         (M10)
    BinaryClassificationEvaluator (AUC)      (M11)
    coefficients -> signed-importance table  (M12)

Differences from the reference, by design:
  * one Pipeline object instead of loose stages — a single `fit` walks
    the DAG once and the fitted PipelineModel is reusable/serializable;
  * the training frame is cached before the iterative L-BFGS fit (the
    reference re-read its input every job — SURVEY.md §3.3);
  * AUC is reported on the held-out split by default (the reference's
    train-set AUC at general_ml_...py:67-69 is available via
    ``eval_on_train=True`` for golden parity).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

from newsflow.tables import local_df


@dataclass
class LRResult:
    model: PipelineModel
    auc: float
    coefficients: list[tuple[str, float]]  # (feature, coef), input order
    intercept: float
    label_values: list[str]  # StringIndexer ordering (freq desc)
    n_train: int
    n_test: int


def fit_binary_lr(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    reg_param: float = 0.0,
    seed: int = 42,
    train_fraction: float = 0.8,
    eval_on_train: bool = False,
) -> LRResult:
    """Fit the reference-shaped binary LR pipeline and evaluate AUC."""
    df = df.select(label_col, *feature_cols).fillna(0, subset=feature_cols)
    train, test = df.randomSplit(
        [train_fraction, 1.0 - train_fraction], seed=seed
    )
    train = train.cache()
    test = test.cache()

    pipeline = Pipeline(
        stages=[
            StringIndexer(inputCol=label_col, outputCol="label"),
            VectorAssembler(inputCols=feature_cols, outputCol="features"),
            LogisticRegression(
                featuresCol="features", labelCol="label", regParam=reg_param
            ),
        ]
    )
    model = pipeline.fit(train)

    eval_df = train if eval_on_train else test
    predictions = model.transform(eval_df)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(predictions)

    lr_model = model.stages[-1]
    indexer = model.stages[0]
    coefs = [
        (feat, float(c))
        for feat, c in zip(feature_cols, lr_model.coefficients)
    ]
    result = LRResult(
        model=model,
        auc=float(auc),
        coefficients=coefs,
        intercept=float(lr_model.intercept),
        label_values=list(indexer.labels),
        n_train=train.count(),
        n_test=test.count(),
    )
    train.unpersist()
    test.unpersist()
    return result


def coefficient_table(spark, result: LRResult) -> DataFrame:
    """M12 — signed-importance table, ranked by |coef| desc then name
    (deterministic presentation of general_ml_...py:109-118)."""
    rows = sorted(
        result.coefficients, key=lambda fc: (-abs(fc[1]), fc[0])
    )
    return local_df(
        spark,
        [(f, c, abs(c), i + 1) for i, (f, c) in enumerate(rows)],
        "feature string, coef double, abs_coef double, rank int",
    )
