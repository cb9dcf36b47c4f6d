"""Near-duplicate CLUSTERS via iterative label propagation — the scale
form of dedup output.

Pairwise near-dup output is quadratic per duplicate cluster (a c-way
cluster emits C(c,2) pairs — the 10x stress corpus shows exactly that
blow-up). A dedup pipeline doesn't need the pairs; it needs one keeper
per connected component of the near-dup graph. Label propagation over
the candidate EDGES is linear in edges per iteration and converges in
O(diameter) iterations — near-dup components are essentially cliques,
so 2-3 iterations in practice.

This is a genuinely iterative DataFrame algorithm (driver-side loop,
checkpoint-style truncation via cache + count per round) — the pattern
MLlib uses internally for connected components; no RDDs, no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    jump_after: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, component) where
    component = min doc_id reachable. Deterministic.

    Each iteration: every node takes the min label among itself and its
    neighbors. Converged when no label changes. Each round's labels are
    localCheckpoint'ed — unlike cache(), that TRUNCATES lineage, so the
    logical plan stays constant-size across iterations and an evicted
    block can never trigger a recompute of the whole iteration chain
    (the failure mode that kills iterative DataFrame jobs at scale).
    On a cluster where executor loss matters, swap for reliable
    ``checkpoint()`` with a checkpoint dir — same call shape.

    DOUBLING (pointer jumping, r15): from iteration ``jump_after``
    onward each round also re-points every label at its label's own
    label (``component ← label(component)`` — one extra label-table
    self-join per round), so label information travels 2^k hops instead
    of k and convergence is O(log diameter) instead of O(diameter) —
    the difference between 20 and ~7 rounds on a 100-node chain, and
    the reason ``max_iterations`` can no longer silently truncate a
    high-diameter component. The fixpoint (min reachable id) is
    schedule-independent, so the OUTPUT is identical; only the round
    count changes. ``jump_after=2`` keeps the common near-dup shape
    free: duplicate clusters are near-cliques that converge in ≤2
    min-sweeps, so they break on the stall check before any jump join
    is ever planned (bench-neutral at check scale, measured).

    ``stats``: optional dict, filled with ``{"iterations": n}``.
    """
    both = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        edges.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    labels = (
        both.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    both = both.cache()

    # Convergence detection by LABEL-SUM, not a join: min-propagation
    # only ever DECREASES labels, so the sum of all labels is strictly
    # monotone and stalls exactly at the fixed point — one cheap
    # aggregate over the already-checkpointed frame per iteration
    # instead of a full self-join + filter + count (one fewer shuffle
    # per iteration; measured on the sf1 synthetic clique corpus).
    # Requires numeric ids (this engine's doc ids are integral; a
    # string-keyed caller should hash to long first). Summed as
    # decimal(38,0) so the check cannot silently wrap on int64 however
    # large the ids or the corpus.
    def _label_sum(frame):
        return frame.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]

    prev_sum = _label_sum(labels)
    iterations = 0
    for it in range(max_iterations):
        iterations = it + 1
        neighbor_min = (
            both.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("component").alias("n_comp"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_comp").alias("n_comp"))
        )
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                "component", F.coalesce("n_comp", "component")
            ).alias("component"),
        )
        if it >= jump_after:
            # Pointer jump: component ← label(component). Labels are
            # always existing node ids (min over node-id labels), so
            # the self-join hits a row for every live label; `least`
            # is belt-and-braces monotonicity (j_comp ≤ component
            # already, labels only ever decrease).
            jump_map = propagated.select(
                F.col("doc_id").alias("j_id"),
                F.col("component").alias("j_comp"),
            )
            propagated = propagated.join(
                jump_map,
                propagated["component"] == jump_map["j_id"],
                "left",
            ).select(
                "doc_id",
                F.least(
                    "component", F.coalesce("j_comp", "component")
                ).alias("component"),
            )
        new_labels = propagated.localCheckpoint()
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    both.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
    return labels


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """Verified near-dup pairs → (doc_id, keeper) assignments; docs with
    no near-dup never appear (they are their own keeper by convention)."""
    comp = connected_components(pairs)
    return comp.select("doc_id", F.col("component").alias("keeper"))
