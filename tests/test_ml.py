"""Unit tests for newsflow.ml: the native top-k TF-IDF extractor must
reproduce the reference UDF's semantics (nlp_analysis.py:157-163), and
the LR pipeline must produce a sane, seeded-deterministic model."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml.linalg import Vectors

from newsflow.ml.pipeline import coefficient_table, fit_binary_lr
from newsflow.ml.tfidf import fit_transform_tfidf, top_k_terms
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def test_top_k_terms_semantics(spark):
    """Hand-built sparse vectors: nonzero-only, score desc, index tie-break."""
    vocab = ["aa", "bb", "cc", "dd"]
    df = spark.createDataFrame(
        [
            (0, Vectors.sparse(4, {0: 1.0, 2: 3.0, 3: 2.0})),
            (1, Vectors.sparse(4, {1: 5.0})),
            (2, Vectors.sparse(4, {0: 2.0, 1: 2.0, 3: 2.0})),  # tie → index order
            (3, Vectors.sparse(4, {})),  # all-zero → empty
        ],
        ["id", "tfidf"],
    )
    out = {
        r["id"]: r["top"]
        for r in df.select(
            "id", top_k_terms(F.col("tfidf"), vocab, k=2).alias("top")
        ).collect()
    }
    assert out[0] == ["cc", "dd"]
    assert out[1] == ["bb"]  # only nonzero entries compete
    assert out[2] == ["aa", "bb"]  # tie broken by vocab index
    assert out[3] == []


def test_tfidf_chain_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (0, "spark engine runs spark engine fast"),
            (1, "spark engine scales to the large cluster"),
            (2, "unrelated words entirely here"),
        ],
        ["doc_id", "text"],
    )
    out = fit_transform_tfidf(df, k=3, vocab_size=50, min_df=1.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert all(len(r["top_terms"]) <= 3 for r in rows.values())
    # "spark engine" occurs in docs 0 AND 1 → IDF downweights it out of
    # both top-3 lists; each doc's distinctive bigrams rank instead.
    assert "spark engine" not in rows[0]["top_terms"]
    assert "spark engine" not in rows[1]["top_terms"]
    assert set(rows[2]["top_terms"]) == {"unrelated words", "words entirely"}


def test_lr_pipeline_seeded(spark):
    df = spark.range(500).select(
        F.when(F.col("id") % 2 == 0, "pos").otherwise("neg").alias("y"),
        (F.col("id") % 2 * 10 + F.col("id") % 7).cast("double").alias("f1"),
        (F.col("id") % 5).cast("double").alias("f2"),
    )
    r1 = fit_binary_lr(df, "y", ["f1", "f2"], seed=42)
    r2 = fit_binary_lr(df, "y", ["f1", "f2"], seed=42)
    # f1 separates the classes almost perfectly.
    assert r1.auc > 0.95
    assert r1.n_train + r1.n_test == 500
    assert [f for f, _ in r1.coefficients] == ["f1", "f2"]
    # Seeded split + deterministic L-BFGS → identical rerun.
    assert r1.auc == r2.auc and r1.coefficients == r2.coefficients
    tbl = coefficient_table(spark, r1).collect()
    assert tbl[0]["rank"] == 1
    assert tbl[0]["abs_coef"] >= tbl[1]["abs_coef"]


def test_fixed_vocab_tfidf_fully_deterministic(spark):
    """Pinned vocabulary → golden-stable indices and top-terms (the
    CountVectorizer tie-order hazard from SURVEY §7 is out of the
    picture)."""
    from newsflow.ml.tfidf import transform_tfidf_fixed_vocab

    df = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta gamma delta"),
            (1, "alpha beta epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    vocab = ["alpha beta", "beta gamma", "epsilon zeta", "beta alpha"]
    out = {
        r["doc_id"]: r
        for r in transform_tfidf_fixed_vocab(df, vocab, k=2).collect()
    }
    # doc 0 bigrams: alpha beta ×2, beta alpha, beta gamma, gamma delta.
    # 'alpha beta' appears in BOTH docs → idf ln(3/3)=0 → score 0 →
    # excluded from top terms (nonzero-only contract); the doc-unique
    # bigrams win.
    assert out[0]["top_terms"] == ["beta gamma", "beta alpha"]
    assert out[1]["top_terms"] == ["epsilon zeta"]
    tf0 = out[0]["tf"].toArray().tolist()
    assert tf0 == [2.0, 1.0, 0.0, 1.0]  # indices ARE vocab order


def test_theme_lr_vocab_alignment_and_determinism(spark):
    """Theme-job pipeline (theme_ml_job.py:59-79 analog): coefficients are
    aligned 1:1 with the CountVectorizer vocabulary, minDF prunes rare
    terms, and the seeded fit is run-to-run deterministic."""
    from newsflow.functions.text import tokens_expr
    from newsflow.ml.themes import fit_countvec_lr, vocab_coefficient_table

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .filter(F.col("lang").isin("en", "zh"))
        .select("lang", tokens_expr("text").alias("toks"))
    )
    result = fit_countvec_lr(
        docs, "toks", "lang", vocab_size=1000, min_df=5.0, reg_param=0.1
    )
    assert len(result.coefficients) == len(result.vocabulary)
    assert sorted(result.label_values) == ["en", "zh"]
    # minDF=5: every vocab term appears in >= 5 documents
    from pyspark.sql import functions as SF
    doc_freq = {
        r["t"]: r["df"]
        for r in docs.select(
            SF.explode(SF.array_distinct("toks")).alias("t")
        ).groupBy("t").agg(SF.count("*").alias("df")).collect()
    }
    assert all(doc_freq[t] >= 5 for t in result.vocabulary)

    table1 = vocab_coefficient_table(spark, result, k=8).collect()
    rerun = fit_countvec_lr(
        docs, "toks", "lang", vocab_size=1000, min_df=5.0, reg_param=0.1
    )
    table2 = vocab_coefficient_table(spark, rerun, k=8).collect()
    assert table1 == table2
