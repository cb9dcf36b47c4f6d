"""Distilled quality filter (ml/quality_clf.py): performance floors vs
the funnel teacher + the measured feature-selection negative result."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.registry import all_specs
from tests.conftest import SF_ORACLE


def test_filter_floors(spark):
    """The shipped student (text stats + upstream lang-ID indicator)
    must track the teacher: recall >= 0.95 (a quality filter that
    silently drops good documents poisons the corpus more than one
    that passes some bad ones) and accuracy >= 0.85. Measured at
    sf0.01: recall 0.982, accuracy 0.892."""
    row = (
        all_specs()["quality_clf_filter_eval"]
        .build(spark, SF_ORACLE)
        .first()
    )
    recall = row.tp / (row.tp + row.fn)
    acc = (row.tp + row.tn) / row.n
    assert recall >= 0.95, (row, recall)
    assert acc >= 0.85, (row, acc)


def test_text_only_student_is_near_chance(spark):
    """The negative result, pinned: WITHOUT the lang-ID indicator the
    label's language gate is irreducible noise (the synthetic corpus
    shares one vocabulary across langs), so a text-stat-only student
    cannot beat the trivial all-negative baseline by more than a few
    points — the measurement that justified adding the upstream
    metadata feature."""
    from newsflow.ml.lr_native import _prob_col, lr_fit_xy
    from newsflow.ml.quality_clf import Q_ITERS, Q_RATE, _features_xy
    from newsflow.tables import load_table, spread

    docs = spread(load_table(spark, SF_ORACLE, "documents"))
    xy = (
        _features_xy(docs, spark)
        .select("vec_id", F.expr("slice(x, 1, 6)").alias("x"), "y")
        .localCheckpoint(eager=True)
    )
    w = lr_fit_xy(xy, 6, iters=Q_ITERS, rate=Q_RATE)
    row = (
        xy.select("y", _prob_col(w).alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(
                ((F.col("y") == 1.0) & (F.col("p") >= 0.5))
                | ((F.col("y") == 0.0) & (F.col("p") < 0.5))
            ).alias("correct"),
            F.count_if(F.col("y") == 0.0).alias("neg"),
        )
        .first()
    )
    majority = row.neg / row.n  # all-negative baseline accuracy
    assert row.correct / row.n <= majority + 0.05, row


def test_sampled_teacher_floors(spark):
    """The 1-in-10 sampled-teacher operating point holds the filter
    floors against FULL-corpus teacher labels (measured 0.928/0.902 at
    sf0.01 — see BENCH_sf1.md round-9 curve for both SFs)."""
    from newsflow.ml.quality_clf import quality_clf_sampled_teacher_eval

    row = quality_clf_sampled_teacher_eval(spark, SF_ORACLE).first()
    recall = row.tp / (row.tp + row.fn)
    acc = (row.tp + row.tn) / row.n
    assert recall >= 0.90, (row, recall)
    assert acc >= 0.87, (row, acc)
