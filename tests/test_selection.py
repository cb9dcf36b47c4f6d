"""DSIR importance-resampling selection (newsflow/selection.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.selection import (
    DSIR_TARGET_LANG,
    DSIR_TOP_N,
    dsir_importance_weights,
    dsir_top_docs,
)
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def test_dsir_weights_enrich_target_language(spark):
    """The whole point of the weights: target-language documents must
    score higher ON AVERAGE than every other language (their hashed
    n-gram bags define p_target), and the top-N slice must be enriched
    in the target language relative to its corpus share."""
    docs = load_table(spark, SF_ORACLE, "documents")
    w = dsir_importance_weights(spark, SF_ORACLE).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r.lang: r.m
        for r in w.groupBy("lang").agg(F.avg("log_weight").alias("m")).collect()
    }
    assert all(
        means[DSIR_TARGET_LANG] > m
        for lang, m in means.items()
        if lang != DSIR_TARGET_LANG
    )

    base_share = (
        docs.filter(F.col("lang") == DSIR_TARGET_LANG).count() / docs.count()
    )
    top = dsir_top_docs(spark, SF_ORACLE).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    top_share = (
        top.filter(F.col("lang") == DSIR_TARGET_LANG).count() / DSIR_TOP_N
    )
    assert top_share > base_share


def test_dsir_top_docs_is_rank_consistent(spark):
    """sel_rank must walk the (log_weight desc, doc_id) order exactly
    and stop at DSIR_TOP_N."""
    rows = dsir_top_docs(spark, SF_ORACLE).orderBy("sel_rank").collect()
    assert [r.sel_rank for r in rows] == list(range(1, DSIR_TOP_N + 1))
    keys = [(-r.log_weight, r.doc_id) for r in rows]
    assert keys == sorted(keys)
