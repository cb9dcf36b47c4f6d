"""PageRank (newsflow/graph.py): closed-form check on a tiny graph and
structural invariants on the co-mention graph."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.graph import PR_ITERS, PR_ROUND, _co_edges, pagerank
from tests.conftest import SF_ORACLE


def _py_pagerank(edges, iters=PR_ITERS, damp=0.85):
    wdeg = {}
    for s, _, w in edges:
        wdeg[s] = wdeg.get(s, 0) + w
    nodes = sorted(wdeg)
    n = len(nodes)
    pr = {v: round(1.0 / n + 1e-9, PR_ROUND) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] = contrib.get(d, 0.0) + pr[s] * (w / wdeg[s])
        pr = {
            v: round(0.15 / n + damp * contrib.get(v, 0.0) + 1e-9, PR_ROUND)
            for v in nodes
        }
    return pr


def test_pagerank_matches_python_on_tiny_graph(spark):
    # Symmetric triangle with one heavy edge + a pendant pair.
    edges = [
        ("a", "b", 3), ("b", "a", 3),
        ("b", "c", 1), ("c", "b", 1),
        ("a", "c", 1), ("c", "a", 1),
        ("d", "e", 2), ("e", "d", 2),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["org"]: r["pr"] for r in pagerank(df).collect()}
    want = _py_pagerank(edges)
    assert got == want


def test_pagerank_mass_conserved_on_comention_graph(spark):
    from newsflow.etl.queries import _core_df

    edges = _co_edges(_core_df(spark, SF_ORACLE))
    ranks = pagerank(edges).collect()
    assert len(ranks) > 10
    # Symmetric graph, no dangling mass: scores sum to 1.
    assert abs(sum(r["pr"] for r in ranks) - 1.0) < 1e-4
    assert all(r["pr"] > 0 for r in ranks)


def test_comention_edges_are_symmetric(spark):
    from newsflow.etl.queries import _core_df

    edges = _co_edges(_core_df(spark, SF_ORACLE))
    fwd = {(r["src"], r["dst"], r["w"]) for r in edges.collect()}
    assert fwd == {(d, s, w) for s, d, w in fwd}
    assert all(s != d for s, d, _ in fwd)
