"""Semantic unit tests for the retrieval/LM module — properties the
oracle-parity hash can't express (it proves cross-engine equality, not
that the formulas mean what they claim)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from newsflow.retrieval import (
    BM25_K,
    BM25_TERMS,
    VOCAB_RESERVED,
    bm25_topk,
    doc_tfidf_keywords,
    doc_unigram_nll,
    source_kl_divergence,
    tokenizer_vocab,
)
from newsflow.sim.health import (
    embedding_dim_stats,
    embedding_int8_quant_error,
    embedding_norm_profile,
)
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


def test_bm25_ranked_and_bounded(spark):
    rows = bm25_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= BM25_K
    ranks = [r.rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_bm25_top_doc_contains_query_term(spark):
    top = bm25_topk(spark, SF_SMOKE).filter(F.col("rank") == 1).collect()[0]
    text = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") == top.doc_id)
        .collect()[0]
        .text
    )
    assert any(w in text.split() for w in BM25_TERMS)


def test_vocab_ids_contiguous_after_reserved(spark):
    rows = tokenizer_vocab(spark, SF_SMOKE).collect()
    ids = sorted(r.token_id for r in rows)
    assert ids == list(range(VOCAB_RESERVED, VOCAB_RESERVED + len(rows)))
    # Frequency order: the lowest id is the most frequent token.
    by_id = sorted(rows, key=lambda r: r.token_id)
    counts = [r.n_occurrences for r in by_id]
    assert counts == sorted(counts, reverse=True)


def test_tfidf_keywords_per_doc_shape(spark):
    rows = doc_tfidf_keywords(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert 1 <= len(doc_rows) <= 3
        assert sorted(r.rank for r in doc_rows) == list(
            range(1, len(doc_rows) + 1)
        )
        ordered = sorted(doc_rows, key=lambda r: r.rank)
        assert [r.tfidf for r in ordered] == sorted(
            (r.tfidf for r in ordered), reverse=True
        )


def test_unigram_nll_matches_python_lm(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    counts: dict[str, int] = {}
    for t in docs.values():
        for w in toks(t):
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    got = {r.doc_id: r for r in doc_unigram_nll(spark, SF_SMOKE).collect()}
    for doc_id, text in list(docs.items())[:20]:
        tk = toks(text)
        if not tk:
            assert doc_id not in got
            continue
        expected = sum(-math.log(counts[w] / total) for w in tk) / len(tk)
        assert abs(got[doc_id].avg_nll - expected) < 1e-4
        assert got[doc_id].n_tokens == len(tk)


def test_kl_divergence_nonnegative_ish(spark):
    # Gibbs: KL >= 0 for true distributions; add-one smoothing of P vs
    # unsmoothed Q can only nudge below zero by O(V/n), so allow a hair.
    rows = source_kl_divergence(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    assert all(r.kl_divergence > -0.05 for r in rows)
    assert any(r.kl_divergence > 0 for r in rows)


def test_dim_stats_cover_every_dimension(spark):
    rows = embedding_dim_stats(spark, SF_SMOKE).collect()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(len(dims)))
    assert all(r.var_val >= 0 for r in rows)


def test_int8_quant_error_bounded_by_half_step(spark):
    # |x - q*scale| <= scale/2 per dim (clamp can't bite: |x| <= 127*scale
    # by construction), so mse <= max_dim(scale)^2 / 4.
    stats = embedding_dim_stats(spark, SF_SMOKE).collect()
    rows = embedding_int8_quant_error(spark, SF_SMOKE).collect()
    assert all(r.mse >= 0 for r in rows)
    assert all(r.max_sq_err >= r.mse for r in rows)
    # crude global bound using the largest per-dim spread observed
    max_abs = max(
        abs(r.mean_val) + 4 * math.sqrt(max(r.var_val, 0)) for r in stats
    )
    bound = (max_abs / 127.0) ** 2  # (scale/2)^2 * 4 slack
    assert all(r.max_sq_err <= bound * 4 for r in rows)


def test_norm_profile_consistent(spark):
    rows = embedding_norm_profile(spark, SF_SMOKE).collect()
    n_total = sum(r.n_vecs for r in rows)
    n_embs = load_table(spark, SF_SMOKE, "embeddings").count()
    assert n_total == n_embs
    for r in rows:
        assert r.min_norm <= r.avg_norm <= r.max_norm
        assert r.n_near_zero <= r.n_vecs


def test_mmr_diversifies_and_is_well_formed(spark):
    from newsflow.sim.mmr import MMR_K, MMR_QUERY_ID, mmr_diversified_topk

    rows = sorted(
        mmr_diversified_topk(spark, SF_SMOKE).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, MMR_K + 1))
    assert MMR_QUERY_ID not in {r.vec_id for r in rows}
    assert len({r.vec_id for r in rows}) == MMR_K  # no repeats
    # rank 1 is the pure-relevance argmax; later scores never exceed it
    assert rows[0].relevance == max(r.relevance for r in rows)
    assert all(r.mmr_score <= rows[0].mmr_score for r in rows)
    # the greedy trade-off actually bites somewhere: MMR ordering is not
    # just relevance ordering on this data
    rels = [r.relevance for r in rows]
    assert rels != sorted(rels, reverse=True)
