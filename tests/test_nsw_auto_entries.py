"""Entries autoscale (VERDICT r10 #6): the measured sizing rule —
flat-graph beam entries must exceed the graph's connected-component
count — applied WITHOUT the caller hand-tuning an entry count.
`estimate_graph_components` gives a bounded-sweep upper bound and
``n_entries="auto"`` derives entries with margin from it.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.sim.nsw import (
    GRAPH_N_ENTRIES,
    _recall_frame,
    estimate_graph_components,
    nsw_graph_edges_df,
    nsw_search_df,
)
from newsflow.sim.pq import _unit

N_CLUSTERS = 40
N_INDEX = 600
DIMS = 16


def _clustered(spark, lo: int, hi: int):
    """Deterministic clustered vectors (the stress-script generator):
    xxhash64 cluster centers + small per-point jitter, cluster keyed by
    vec_id % N_CLUSTERS so index and query slices share centers."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"""transform(sequence(0, {DIMS - 1}), j ->
              cast(pmod(xxhash64(id % {N_CLUSTERS}, j), 2000) - 1000
                   as double) / 1000.0
              + cast(pmod(xxhash64(id, j, 777), 200) - 100
                     as double) / 20000.0)"""
        ).alias("embedding"),
    )


def test_estimate_components_exact_on_known_graph(spark):
    """Two disjoint triangles + one isolated pair = 3 components; the
    bounded propagation converges on such small diameters, so the
    upper-bound estimate is exact here."""
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in
         [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (20, 21)]],
        "src long, dst long, cosine_sim double",
    )
    assert estimate_graph_components(edges) == 3


def test_estimate_is_upper_bound_under_few_rounds(spark):
    """On a long chain, too few sweeps must only OVERestimate (the safe
    direction for entry sizing), never underestimate."""
    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(40)],
        "src long, dst long, cosine_sim double",
    )
    assert estimate_graph_components(chain, rounds=2) >= 1
    assert estimate_graph_components(chain, rounds=20) >= 1


def test_auto_entries_restore_floors_on_multi_component_corpus(spark):
    """The round-10 measured failure mode, self-healing: a ~40-component
    k-NN graph strands the default {GRAPH_N_ENTRIES} id-spread entries,
    while n_entries="auto" derives enough entries from the component
    estimate to hold the tier's floors — no hand-tuned count."""
    index = _clustered(spark, 0, N_INDEX)
    units = _unit(index, "vec_id").localCheckpoint(eager=True)
    edges = nsw_graph_edges_df(units).localCheckpoint(eager=True)

    comps = estimate_graph_components(edges)
    assert comps >= N_CLUSTERS * 0.8, comps  # clusters really separate

    queries = (
        _unit(_clustered(spark, N_INDEX, N_INDEX + 8), "query_id")
        .select("query_id", "u")
        .localCheckpoint(eager=True)
    )
    auto_beam = nsw_search_df(
        units, edges, queries, n_entries="auto"
    ).filter(F.col("rank") <= 5)
    rows = _recall_frame(units, auto_beam, queries).collect()
    assert len(rows) == 8
    mean_auto = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean_auto >= 0.9, rows
    assert all(r.recall_at_k >= 0.6 for r in rows), rows

    # The default fixed count really is insufficient here — the rule
    # (entries > components) is doing the work, not slack in the data.
    fixed_beam = nsw_search_df(
        units, edges, queries, n_entries=GRAPH_N_ENTRIES
    ).filter(F.col("rank") <= 5)
    fixed_rows = _recall_frame(units, fixed_beam, queries).collect()
    mean_fixed = sum(r.recall_at_k for r in fixed_rows) / len(fixed_rows)
    assert mean_auto > mean_fixed, (mean_auto, mean_fixed)
