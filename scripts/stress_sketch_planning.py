"""Sketch-informed query planning stress (VERDICT r11 stretch #9): a
Count-Min row-frequency sketch of the band keys drives the MinHash
oversize="star" routing BEFORE any collect_list runs
(dedup/minhash.py::native_minhash_candidates_cms_planned).

The hazard under test: the STATIC plan only discovers a bucket is
over-cap after materializing its full sorted member array in one
aggregation buffer — O(k) per-task memory on exactly the viral key the
cap exists to bound. The sketch-informed plan routes est-heavy rows to
a list-free star path, so the largest list any task ever materializes
is <= max_bucket, at ANY viral-cluster size.

This plants a viral near-dup cluster of V copies on top of the sf0.1
corpus and measures both plans at increasing V: wall, candidate-pair
equality (the correctness-unchanged claim), and the largest
materialized bucket list (static: V; planned: <= cap, structural).

Usage: python scripts/stress_sketch_planning.py [V ...]   # default 5000 20000
Prints one JSON line for BENCH_sf1.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow.dedup import minhash  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table, spread  # noqa: E402

CAP = 64


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="newsflow-stress-sketch-planning")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    out: dict[str, object] = {
        "metric": "sketch_planned_candidates_stress",
        "cap": CAP,
        "sf_dir": sf_dir,
    }
    # Warm pass compiles both chains (bench.py steady-state rule).
    warm = minhash.doc_shingle_arrays(docs, 3).localCheckpoint(eager=True)
    minhash.native_minhash_candidates(warm, max_bucket=CAP, oversize="star").count()
    minhash.native_minhash_candidates_cms_planned(warm, max_bucket=CAP).count()

    for v in sizes:
        viral = (
            docs.filter(F.col("doc_id") == 3)
            .select("text")
            .crossJoin(
                spark.range(v).select(
                    (F.col("id") + 10_000_000).alias("doc_id")
                )
            )
            .select("doc_id", "text")
        )
        arrays = minhash.doc_shingle_arrays(
            docs.unionByName(viral), 3
        ).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        static = minhash.native_minhash_candidates(
            arrays, max_bucket=CAP, oversize="star"
        ).localCheckpoint(eager=True)
        n_static = static.count()
        static_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        planned = minhash.native_minhash_candidates_cms_planned(
            arrays, max_bucket=CAP
        ).localCheckpoint(eager=True)
        n_planned = planned.count()
        planned_s = time.perf_counter() - t0

        # Warm path: the sketch is MAINTAINED state (the deployment
        # shape — per-batch additive deltas, cms_ingest_stream
        # lifecycle), so routing pays no build pass.
        pre = minhash._plan_cms_build(
            minhash.band_signatures(arrays).withColumn(
                "ck",
                F.concat_ws(
                    ":",
                    F.col("band").cast("string"),
                    F.col("key").cast("array<string>"),
                ),
            )
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        warm = minhash.native_minhash_candidates_cms_planned(
            arrays, max_bucket=CAP, sketch=pre, sketch_covers_input=True
        ).localCheckpoint(eager=True)
        n_warm = warm.count()
        warm_s = time.perf_counter() - t0

        # STALE maintained state (round 13, ADVICE r12): the sketch
        # covers only the pre-viral corpus — exactly the lag a
        # maintained delta store has while a viral batch is in flight.
        # Untrusted by default, the light-route guard demotes the
        # underestimated key to the star path: output must stay equal
        # AND the buffer bound stays structural (<= CAP) even though
        # the sketch routed the viral key light.
        stale = minhash._plan_cms_build(
            minhash.band_signatures(
                minhash.doc_shingle_arrays(docs, 3)
            ).withColumn(
                "ck",
                F.concat_ws(
                    ":",
                    F.col("band").cast("string"),
                    F.col("key").cast("array<string>"),
                ),
            )
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        guarded = minhash.native_minhash_candidates_cms_planned(
            arrays, max_bucket=CAP, sketch=stale, sketch_covers_input=False
        ).localCheckpoint(eager=True)
        n_guarded = guarded.count()
        guarded_s = time.perf_counter() - t0

        equal = (
            static.exceptAll(planned).isEmpty()
            and planned.exceptAll(static).isEmpty()
        )
        stale_equal = (
            static.exceptAll(guarded).isEmpty()
            and guarded.exceptAll(static).isEmpty()
        )
        # Largest bucket the static plan materialized as ONE list
        # (the viral key's full membership) vs the planned plan's
        # structural bound.
        sigs = minhash.band_signatures(arrays)
        max_bucket_true = (
            sigs.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c"))
            .collect()[0][0]
        )
        out[f"v{v}"] = {
            "pairs": int(n_static),
            "pairs_equal": bool(equal and n_warm == n_planned),
            "stale_sketch_pairs_equal": bool(
                stale_equal and n_guarded == n_planned
            ),
            "static_wall_s": round(static_s, 2),
            "planned_cold_wall_s": round(planned_s, 2),
            "planned_warm_wall_s": round(warm_s, 2),
            "planned_stale_guarded_wall_s": round(guarded_s, 2),
            "static_max_list": int(max_bucket_true),
            "planned_max_list_bound": CAP,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
