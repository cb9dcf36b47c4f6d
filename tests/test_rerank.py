"""MaxSim retrieve-then-re-rank (sim/rerank.py). Registry-level
Spark-vs-DuckDB parity for `rag_rerank_maxsim` is covered by
tests/test_oracle_parity.py (registered oracle); these tests pin the
SEMANTICS of the re-ranker itself on constructed corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.sim.rerank import QTOK_CAP, maxsim_rerank


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pool(spark, pairs):
    return spark.createDataFrame(
        pairs, "query_id long, neighbor_id long"
    )


def test_exact_text_match_wins_and_scores_full(spark):
    """A candidate with the query's exact text must rank 1 with score =
    one full 1.0 MaxSim per scored query token; an unrelated candidate
    scores strictly less."""
    q = "alpha beta gamma delta epsilon"
    docs = _docs(
        spark,
        [
            (0, q),                      # the query
            (1, q + " extra words here"),  # superset: contains all q tokens
            (2, "totally unrelated content nothing shared at all"),
        ],
    )
    out = maxsim_rerank(
        docs, _pool(spark, [(0, 1), (0, 2)]), topk=2
    ).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].neighbor_id == 1
    assert by_rank[2].neighbor_id == 2
    # 5 distinct query tokens, each finds itself in candidate 1.
    assert by_rank[1].maxsim_score == 5.0
    assert by_rank[2].maxsim_score < 5.0


def test_query_token_cap_bounds_the_score(spark):
    """A query with more than QTOK_CAP distinct tokens scores at most
    QTOK_CAP terms — the bounded-pool economics, enforced."""
    many = " ".join(f"tok{i:02d}" for i in range(QTOK_CAP + 10))
    docs = _docs(spark, [(0, many), (1, many)])
    out = maxsim_rerank(docs, _pool(spark, [(0, 1)]), topk=1).collect()
    assert len(out) == 1
    assert out[0].maxsim_score == float(QTOK_CAP)


def test_rerank_is_pool_bounded(spark):
    """Only pool candidates are scored — a better-matching doc OUTSIDE
    the pool must not appear (the re-ranker re-orders, never retrieves)."""
    q = "one two three"
    docs = _docs(spark, [(0, q), (1, "one two three"), (2, "one other")])
    out = maxsim_rerank(docs, _pool(spark, [(0, 2)]), topk=5).collect()
    assert {r.neighbor_id for r in out} == {2}
