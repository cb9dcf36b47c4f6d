"""Deterministic k-means (sim/kmeans.py): Lloyd semantics vs a NumPy
reference, plan shape of the assignment stage, and empty-cluster
carry-forward."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from newsflow.sim.kmeans import (
    K_CLUSTERS,
    LLOYD_ITERS,
    ROUND_CENTROID,
    ROUND_DIST,
    assign_clusters,
    kmeans_assign,
)
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def _numpy_reference(vecs: dict[int, np.ndarray]) -> dict[int, int]:
    ids = sorted(vecs)
    cents = {c: vecs[c].copy() for c in range(K_CLUSTERS)}

    def assign():
        out = {}
        for i in ids:
            keyed = [
                (round(float(((vecs[i] - cents[c]) ** 2).sum()) + 1e-9,
                       ROUND_DIST), c)
                for c in sorted(cents)
            ]
            out[i] = min(keyed)[1]
        return out

    a = assign()
    for _ in range(LLOYD_ITERS - 1):
        for c in range(K_CLUSTERS):
            members = [vecs[i] for i in ids if a[i] == c]
            if members:
                # Decimal-exact mean then round, matching the engine.
                cents[c] = np.round(
                    np.mean(members, axis=0, dtype=np.float64),
                    ROUND_CENTROID,
                )
        a = assign()
    return a


def test_assignments_match_numpy_reference(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    got = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign(emb).collect()
    }
    ref = _numpy_reference(vecs)
    diff = {i for i in ref if ref[i] != got[i]}
    # np.mean's pairwise summation can differ from the decimal-exact
    # mean below the centroid rounding; identical rounding makes any
    # residual disagreement a real bug.
    assert not diff, f"{len(diff)} assignment mismatches: {sorted(diff)[:5]}"
    assert set(got.values()) <= set(range(K_CLUSTERS))


def test_assignment_stage_is_row_local(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = {c: [0.01 * (c + 1)] * 64 for c in range(K_CLUSTERS)}
    plan = (
        assign_clusters(vecs, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "assignment must not shuffle"
    assert "BatchEvalPython" not in plan, "assignment must not hit Python"


def test_seeds_keep_their_own_cluster_on_first_pass(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    seeds = {
        int(r["vec_id"]): list(r["v"])
        for r in vecs.filter(F.col("vec_id") < K_CLUSTERS).collect()
    }
    first = assign_clusters(vecs, seeds).filter(
        F.col("vec_id") < K_CLUSTERS
    )
    for r in first.collect():
        assert r["cluster"] == r["vec_id"]
