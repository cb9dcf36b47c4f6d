"""IVF ANN correctness: exhaustive probing must equal brute force
exactly; partial probing must keep high recall on clustered data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.sim.ivf import ivf_topk
from newsflow.sim.knn import cosine_topk
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 12)


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_exhaustive_probe_equals_brute_force(emb, queries):
    exact = cosine_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in ivf.collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in exact.collect()
    }
    assert set(got) == set(want)
    for key, sim in want.items():
        assert got[key] == pytest.approx(sim, abs=1e-6)


def test_partial_probe_recall(emb, queries):
    exact_pairs = _pairs(cosine_topk(emb, queries, k=5))
    ivf_pairs = _pairs(ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4))
    recall = len(ivf_pairs & exact_pairs) / len(exact_pairs)
    # Seeded KMeans → deterministic. Measured: 0.62/0.77/0.92 recall at
    # n_probe 2/4/6 of 8 cells on this fixture — half the cells keeps
    # ~3/4 of true neighbors at ~half the search cost.
    assert recall >= 0.7, f"IVF recall too low: {recall:.2f}"
