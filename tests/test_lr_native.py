"""Native deterministic logistic regression (newsflow/ml/lr_native.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.ml.lr_native import LR_ITERS, N_COEF, lr_fit
from newsflow.registry import all_specs
from newsflow.tables import load_table, spread
from tests.conftest import SF_ORACLE

LR_AUC_FLOOR = 0.7


def _auc(rows) -> float:
    """Exact Mann-Whitney AUC from (y_true, prob) rows; average-rank
    tie handling."""
    ranked = sorted(rows, key=lambda r: r.prob)
    n = len(ranked)
    ranks: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j + 1 < n and ranked[j + 1].prob == ranked[i].prob:
            j += 1
        avg = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[id(ranked[t])] = avg
        i = j + 1
    pos = [r for r in ranked if r.y_true == 1]
    neg_n = n - len(pos)
    assert pos and neg_n
    rank_sum = sum(ranks[id(r)] for r in pos)
    return (rank_sum - len(pos) * (len(pos) + 1) / 2) / (len(pos) * neg_n)


def test_lr_native_train_auc_floor(spark):
    """The trained model must actually LEARN: train-set AUC >= 0.7
    against the label==0 target (measured 0.785 at sf0.01). A model
    that merely round-trips the oracle without signal would sit at
    0.5 — the floor is what authorizes the tier."""
    rows = (
        all_specs()["lr_native_train_preds"].build(spark, SF_ORACLE).collect()
    )
    assert _auc(rows) >= LR_AUC_FLOOR


def test_lr_native_zero_iterations_is_chance(spark):
    """Sanity of the floor: with ZERO GD iterations (all-zero weights,
    every prob 0.5) AUC is exactly 0.5 — the gate would trip."""
    emb = spread(load_table(spark, SF_ORACLE, "embeddings"))
    from newsflow.ml.lr_native import _prob_col, _xy

    scored = _xy(emb).select(
        F.col("y").cast("long").alias("y_true"),
        _prob_col([0.0] * N_COEF).alias("prob"),
    )
    rows = scored.collect()
    # dround's +1e-9 nudge shifts sigmoid(0) to exactly 0.500000001.
    assert all(abs(r.prob - 0.5) < 1e-8 for r in rows)
    assert abs(_auc(rows) - 0.5) < 1e-12


def test_lr_fit_weights_move_every_iteration(spark):
    """All LR_ITERS iterations must contribute: the bias weight after
    the full fit differs from zero, and N_COEF weights come back."""
    emb = spread(load_table(spark, SF_ORACLE, "embeddings"))
    w = lr_fit(emb)
    assert len(w) == N_COEF
    assert w[0] != 0.0
    assert LR_ITERS >= 2


def test_lr_metrics_query_agrees_with_reference_auc(spark):
    """The oracled metrics query's AUC must equal the pure-Python
    Mann-Whitney reference on the same predictions (both tie-corrected),
    up to the query's 6-dp rounding."""
    specs = all_specs()
    rows = specs["lr_native_train_preds"].build(spark, SF_ORACLE).collect()
    expected = _auc(rows)
    m = specs["lr_native_train_metrics"].build(spark, SF_ORACLE).collect()[0]
    assert m.n == len(rows)
    assert abs(m.auc - expected) < 1e-6
    assert 0.0 < m.avg_log_loss < 1.0
