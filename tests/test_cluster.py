"""Connected-components correctness vs a Python union-find over the
same edges, incl. multi-hop chains that need >1 iteration."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.dedup import core, minhash
from newsflow.dedup.cluster import connected_components
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_needs_multiple_iterations(spark):
    # 0-1-2-3-4 path plus {10,11} pair: diameter 4 → several rounds.
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)
    assert got[4] == 0 and got[11] == 10 and got[22] == 20


def test_components_match_union_find_on_real_pairs(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    pairs = minhash.native_minhash_near_dup_pairs(docs, n=3, threshold=0.8)
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert len(edges) > 0
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == _union_find(edges)


def test_iteration_lineage_is_truncated(spark):
    # A 12-node chain needs ~11 propagation rounds; localCheckpoint must
    # keep the result's plan constant-size (a cache()-based loop would
    # accumulate one join per round and recompute the whole chain on
    # block eviction).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    comp = connected_components(edges)
    assert comp.distinct().count() == 12
    assert {r["component"] for r in comp.collect()} == {0}
    plan = comp._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, "lineage grew across iterations"


def test_lsh_fed_components_match_exact_fed(spark):
    # The registered `near_dup_clusters` (exact edges, oracled) and
    # `near_dup_clusters_lsh` (banded-MinHash edges, rows-only) must
    # agree on the test corpus — LSH recall is 1 here, so any split
    # component would flag a banding bug.
    docs = load_table(spark, SF_ORACLE, "documents")
    exact = core.jaccard_pairs(docs, n=3, threshold=0.8)
    lsh = minhash.native_minhash_near_dup_pairs(docs, n=3, threshold=0.8)
    comp_exact = {
        (r["doc_id"], r["component"])
        for r in connected_components(exact).collect()
    }
    comp_lsh = {
        (r["doc_id"], r["component"])
        for r in connected_components(lsh).collect()
    }
    assert comp_exact == comp_lsh


def test_doubling_converges_in_log_rounds_on_a_chain(spark):
    """r15 pointer jumping: a 64-node path needs ~63 plain min-sweeps
    (more than the default max_iterations cap — a silent-truncation
    hazard); with the jump engaged after round 2 it must converge to
    the exact union-find labels in O(log n) rounds."""
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    out = {
        (r.doc_id, r.component)
        for r in connected_components(edges, stats=stats).collect()
    }
    expected = {(i, 0) for i in range(n)}
    assert out == expected
    assert stats["iterations"] <= 12, stats

    # plain propagation (jump disabled) must hit the cap unconverged on
    # the same graph — the hazard the doubling removes
    plain_stats: dict = {}
    plain = {
        (r.doc_id, r.component)
        for r in connected_components(
            edges, max_iterations=10, jump_after=10**9, stats=plain_stats
        ).collect()
    }
    assert plain != expected
    assert plain_stats["iterations"] == 10


def test_doubling_output_identical_to_plain_on_cliquey_pairs(spark):
    """Output identity on the real near-dup pair graph: doubling is a
    schedule change, not a semantics change."""
    docs = load_table(spark, SF_ORACLE, "documents")
    arrays = core.doc_shingle_arrays(docs, 3)
    pairs = minhash._verify_pairs(
        arrays, minhash.native_minhash_candidates(arrays), threshold=0.8
    )
    with_jump: dict = {}
    no_jump: dict = {}
    a = {
        tuple(r)
        for r in connected_components(
            pairs, jump_after=0, stats=with_jump
        ).collect()
    }
    b = {
        tuple(r)
        for r in connected_components(
            pairs, jump_after=10**9, stats=no_jump
        ).collect()
    }
    assert a == b
