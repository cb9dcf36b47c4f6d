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


def test_vendored_stopwords_match_mllib_default(spark):
    """ml/stopwords.py is frozen so oracle SQL can embed the list with
    no JVM; it must stay equal to the live MLlib resource (a Spark
    upgrade that changes the list fails here, not by silent drift)."""
    from pyspark.ml.feature import StopWordsRemover

    from newsflow.ml.stopwords import ENGLISH_STOPWORDS

    assert list(ENGLISH_STOPWORDS) == StopWordsRemover.loadDefaultStopWords(
        "english"
    )


def test_stopwords_native_filter_matches_mllib(spark):
    """The M2 native twin must agree with a live StopWordsRemover on
    identical token arrays — including ORDER and DUPLICATES (the
    contract an array_except formulation would lose)."""
    from pyspark.ml.feature import StopWordsRemover

    from newsflow.functions.text import tokens_expr
    from newsflow.ml.stopwords import ENGLISH_STOPWORDS
    from newsflow.ml.tfidf import DOMAIN_STOPWORDS

    stop_list = list(ENGLISH_STOPWORDS) + list(DOMAIN_STOPWORDS)
    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", tokens_expr("text").alias("t"))
        .limit(100)
    )
    mllib = {
        r["doc_id"]: r["k"]
        for r in StopWordsRemover(
            inputCol="t", outputCol="k", stopWords=stop_list
        )
        .transform(docs)
        .collect()
    }
    stops_sql = ", ".join(
        "'" + w.replace("'", "\\'") + "'" for w in stop_list
    )
    native = {
        r["doc_id"]: r["k"]
        for r in docs.select(
            "doc_id",
            F.expr(
                f"filter(t, x -> NOT array_contains(array({stops_sql}), x))"
            ).alias("k"),
        ).collect()
    }
    assert native == mllib and len(native) == 100
    # At least one doc actually lost a stopword (non-vacuous).
    orig = {r["doc_id"]: r["t"] for r in docs.collect()}
    assert any(len(native[d]) < len(orig[d]) for d in native)


def test_tfidf_oracle_chain_deterministic_and_real_mllib(spark):
    """The pinned chain runs the REAL MLlib transformers end-to-end and
    is run-to-run deterministic (the property that makes it
    oracle-able); the vocabulary obeys the (count desc, gram asc)
    selection rule."""
    from newsflow.ml.tfidf import (
        TFIDF_PINNED_VOCAB,
        fit_transform_tfidf_oracle_chain,
    )

    docs = load_table(spark, SF_ORACLE, "documents").filter(
        F.col("doc_id") < 200
    )
    out1, vocab1 = fit_transform_tfidf_oracle_chain(docs, k=5)
    out2, vocab2 = fit_transform_tfidf_oracle_chain(docs, k=5)
    assert vocab1 == vocab2 and len(vocab1) <= TFIDF_PINNED_VOCAB
    r1 = {r["doc_id"]: r["top_terms"] for r in out1.collect()}
    r2 = {r["doc_id"]: r["top_terms"] for r in out2.collect()}
    assert r1 == r2 and len(r1) > 0
    assert any(terms for terms in r1.values())


def test_lr_holdout_metrics_sane(spark):
    """Held-out eval: split covers the corpus disjointly at ~81/19 and
    the held-out AUC clears the same discrimination floor as the
    train-set metric (generalization, not memorization)."""
    from newsflow.ml.lr_native import lr_holdout_metrics_df
    from newsflow.tables import spread

    emb = spread(load_table(spark, SF_ORACLE, "embeddings"))
    row = lr_holdout_metrics_df(emb).collect()[0]
    assert row.n_train + row.n_test == emb.count()
    frac = row.n_train / (row.n_train + row.n_test)
    assert 0.70 <= frac <= 0.90  # 13/16 expected, binomial spread
    # Better than chance on unseen rows (measured ~0.60 at sf0.01 vs
    # 0.785 train-set — the generalization gap of a 3-iteration GD fit
    # on ~500 train rows is real and exactly what this query reports).
    assert 0.55 <= row.auc <= 1.0
