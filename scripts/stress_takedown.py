"""Takedown cost vs corpus size at FIXED delete-list size — the scaling
property that makes deletion propagation viable at 100 TB: dirty
partitions are delete-list-bounded, the re-election candidate lookup is
a drop-log semi-join (delete-list-proportional output), and the only
corpus-proportional stage is the single columnar index probe the
re-elected batch pays (the `scripts/stress_incremental.py` shape, 10×
corpus → ~1.2× probe).

Method: synthesize a stored ingest state DIRECTLY (survivor corpus +
MinHash sigs/arrays across 20 hive batches + a planted drop log — no
dedup jobs, the state IS the input), at 1× and 10× corpus size; run the
SAME 10-keeper takedown (with re-election) against both; report walls.

Usage: python scripts/stress_takedown.py [base_docs]  # default 5000
Prints one JSON line per scale point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow.dedup import minhash  # noqa: E402
from newsflow.dedup.core import doc_shingle_arrays  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.takedown import (  # noqa: E402
    corpus_takedown,
    takedown_maintenance,
)

N_BATCHES = 20
N_DELETES = 10
N_DROPPED = 30  # planted dropped docs in the log (3 per deleted keeper)


def build_state(spark, n_docs: int, base: str) -> None:
    out_dir = os.path.join(base, "out")
    index_dir = os.path.join(base, "index")
    # Deterministic distinct texts: ~40-token docs, token stream keyed
    # by doc_id so no two docs are near-dups (takedown cost must not
    # hide behind accidental dedup work).
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 39),"
            " i -> concat('w', cast(id * 40 + i as string))), ' ')"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        (F.col("id") % N_BATCHES).alias("batch"),
    )
    docs.withColumn("ingest_batch", F.col("batch")).write.partitionBy(
        "batch"
    ).parquet(out_dir)
    arrays = doc_shingle_arrays(docs, 3).join(
        docs.select("doc_id", "batch"), "doc_id"
    )
    arrays.write.partitionBy("batch").parquet(
        os.path.join(index_dir, "arrays")
    )
    sigs = minhash.band_signatures(
        doc_shingle_arrays(docs, 3), 16, 2
    ).join(docs.select("doc_id", "batch"), "doc_id")
    sigs.write.partitionBy("batch").parquet(os.path.join(index_dir, "sigs"))
    # Planted drop log: N_DROPPED raw docs (ids beyond the corpus) each
    # dropped for matching one of the first N_DELETES keepers.
    drops = spark.range(N_DROPPED).select(
        (F.col("id") + n_docs).alias("doc_id"),
        (F.col("id") % N_DELETES).alias("matched_doc_id"),
        F.lit("index").alias("reason"),
        F.lit(0).alias("batch"),
    )
    drops.write.partitionBy("batch").parquet(os.path.join(index_dir, "drops"))


def raw_layer(spark, n_docs: int):
    """Raw docs = corpus ∪ the dropped docs (their text must exist for
    re-election; make each a near-dup of its deleted keeper so
    re-election genuinely verifies and re-admits)."""
    corpus = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 39),"
            " i -> concat('w', cast(id * 40 + i as string))), ' ')"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
    )
    dropped = spark.range(N_DROPPED).select(
        (F.col("id") + n_docs).alias("doc_id"),
        F.expr(
            "concat(array_join(transform(sequence(0, 39),"
            " i -> concat('w', cast((id % "
            f"{N_DELETES}) * 40 + i as string))), ' '), ' extra')"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
    )
    return corpus.unionByName(dropped)


def main() -> None:
    base_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cpus = os.cpu_count() or 4
    spark = get_spark(
        app_name="stress-takedown",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    dels = spark.createDataFrame(
        [(i,) for i in range(N_DELETES)], "doc_id long"
    )
    for scale in (1, 10):
        n = base_docs * scale
        root = tempfile.mkdtemp(prefix=f"nf_takedown_stress_{scale}x_")
        try:
            build_state(spark, n, root)
            raw = raw_layer(spark, n)
            t0 = time.perf_counter()
            audit = corpus_takedown(
                spark,
                dels,
                out_dir=os.path.join(root, "out"),
                index_dir=os.path.join(root, "index"),
                takedown_id=999,
                raw_docs=raw,
            )
            wall = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "metric": "takedown_wall",
                        "scale": scale,
                        "n_docs": n,
                        "n_deletes": N_DELETES,
                        "wall_sec": round(wall, 2),
                        "audit": audit,
                    }
                ),
                flush=True,
            )
            # Post-compaction phase: merge every settled tombstone/drop
            # partition, then run a SECOND takedown that re-elects
            # through the COMPACTED drop log (deleting the 10 keepers
            # takedown 999 just re-elected orphans their remaining
            # near-dups, whose drop rows now live in batch=-1).
            drops_dir = os.path.join(root, "index", "drops")
            parts_before = len(
                [d for d in os.listdir(drops_dir) if d.startswith("batch=")]
            )
            t1 = time.perf_counter()
            maint = takedown_maintenance(
                spark,
                os.path.join(root, "index"),
                settled_before_batch=10**12,
                min_partitions=1,
            )
            maint_wall = time.perf_counter() - t1
            parts_after = len(
                [d for d in os.listdir(drops_dir) if d.startswith("batch=")]
            )
            dels2 = spark.createDataFrame(
                [(n + i,) for i in range(N_DELETES)], "doc_id long"
            )
            t2 = time.perf_counter()
            audit2 = corpus_takedown(
                spark,
                dels2,
                out_dir=os.path.join(root, "out"),
                index_dir=os.path.join(root, "index"),
                takedown_id=1000,
                raw_docs=raw,
            )
            wall2 = time.perf_counter() - t2
            print(
                json.dumps(
                    {
                        "metric": "takedown_wall_post_compact",
                        "scale": scale,
                        "n_docs": n,
                        "drop_partitions_before": parts_before,
                        "drop_partitions_after": parts_after,
                        "maintenance_wall_sec": round(maint_wall, 2),
                        "maintenance": maint,
                        "wall_sec": round(wall2, 2),
                        "audit": audit2,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
