"""Graph takedown cost vs graph size at FIXED delete-list size — the
10× scale point for the round-9 NSW takedown path (the other persisted
artifacts got theirs in scripts/stress_takedown.py; this closes the
graph).

Two numbers per scale, separated deliberately:

- **compute wall**: `nsw_takedown_edges` (zero-trace delete + bridge
  repair) materialized WITHOUT persisting — candidate volume is
  |deletes|·M² by construction, so this must stay ~flat at 10×;
- **update wall**: the full path-based `nsw_takedown_update` including
  the persisted rewrite + a 5-vector re-elected insert. Since round 11
  the stored graph is bucketed by src and only touched buckets
  rewrite, so the update wall should stay ~flat at 10× too — the
  round-10 run of this script measured the whole-table rewrite share
  at +1.2 s (BENCH_sf1.md), the number that motivated the layout.

Graphs are built with the at-scale builder (`nsw_graph_edges_ivf`)
over deterministic clustered synthetic vectors (the sf1 replica's
duplicate embeddings make degenerate graphs — BENCH_sf1.md note).

Usage: python scripts/stress_graph_takedown.py [base_n]  # default 4000
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from newsflow.session import get_spark  # noqa: E402
from newsflow.sim.nsw import (  # noqa: E402
    nsw_graph_edges_ivf,
    nsw_takedown_edges,
    nsw_takedown_update,
    write_graph_bucketed,
)
from newsflow.sim.pq import _unit  # noqa: E402

N_DELETES = 10
N_REELECT = 5


def clustered(spark, n: int, n_clusters: int = 200, dims: int = 64):
    """Deterministic clustered vectors (xxhash64 centers + jitter)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"""transform(sequence(0, {dims - 1}), j ->
              cast(pmod(xxhash64(id % {n_clusters}, j), 2000) - 1000
                   as double) / 1000.0
              + cast(pmod(xxhash64(id, j, 777), 200) - 100
                     as double) / 2000.0)"""
        ).alias("embedding"),
    )


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cpus = os.cpu_count() or 4
    spark = get_spark(
        app_name="stress-graph-takedown",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for scale in (1, 10):
        n = base_n * scale
        emb = clustered(spark, n + N_REELECT).localCheckpoint(eager=True)
        units = _unit(
            emb.filter(F.col("vec_id") < n), "vec_id"
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        edges = nsw_graph_edges_ivf(units).localCheckpoint(eager=True)
        build_wall = time.perf_counter() - t0
        dels = spark.createDataFrame(
            [(i * (n // N_DELETES),) for i in range(N_DELETES)],
            "vec_id long",
        )
        # Compute-only: delete + bridge repair, no persistence.
        t0 = time.perf_counter()
        n_after = nsw_takedown_edges(edges, dels, units).count()
        compute_wall = time.perf_counter() - t0
        # Full persisted update incl. rewrite + re-elected insert.
        root = tempfile.mkdtemp(prefix=f"nf_graph_td_{scale}x_")
        gpath = os.path.join(root, "graph")
        write_graph_bucketed(spark, gpath, edges)
        reelect = spark.createDataFrame(
            [(n + i,) for i in range(N_REELECT)], "vec_id long"
        )
        t0 = time.perf_counter()
        audit = nsw_takedown_update(
            spark, gpath, dels, embeddings=emb, reelected_ids=reelect
        )
        update_wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "graph_takedown_wall",
                    "scale": scale,
                    "n_nodes": n,
                    "n_deletes": N_DELETES,
                    "build_sec": round(build_wall, 2),
                    "compute_sec": round(compute_wall, 2),
                    "update_sec": round(update_wall, 2),
                    "edges_after_compute": n_after,
                    "audit": audit,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
