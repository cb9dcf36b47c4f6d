"""Planted-skew stress for the banded near-dup path: one viral
boilerplate string with K near-identical variants puts all K docs into
the same LSH bucket in (almost) every band, so uncapped candidate
generation expands K(K-1)/2 pairs inside single bucket rows — the
classic skew that stalls a 100 TB dedup on one hot key.

Measures, at two K (4× apart, so quadratic vs linear expansion is
visible in one table):

- UNCAPPED: candidate count (~K²/2 + background) and near-dup wall;
- STAR-CAPPED (`max_bucket`, ``oversize="star"``): over-cap buckets
  emit only (bucket-min, member) pairs — O(K) candidates — and the
  DROP-SET (keep-smallest dedup outcome) must equal the uncapped run's,
  because every viral member still verifies against its bucket rep.

Usage: python scripts/stress_skew_neardup.py [n_clean]  # default 5000
Prints one JSON line per (K, mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow.dedup import minhash  # noqa: E402
from newsflow.dedup.core import doc_shingle_arrays  # noqa: E402
from newsflow.session import get_spark  # noqa: E402

MAX_BUCKET = 50


def build_docs(spark, n_clean: int, k_viral: int):
    clean = spark.range(n_clean).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 39),"
            " i -> concat('w', cast(id * 40 + i as string))), ' ')"
        ).alias("text"),
    )
    viral = spark.range(k_viral).select(
        (F.col("id") + n_clean).alias("doc_id"),
        F.expr(
            "concat(array_join(transform(sequence(0, 39),"
            " i -> concat('boiler', cast(i as string))), ' '),"
            " ' v', cast(id as string))"
        ).alias("text"),
    )
    return clean.unionByName(viral)


def main() -> None:
    n_clean = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cpus = os.cpu_count() or 4
    spark = get_spark(
        app_name="stress-skew-neardup",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k in (500, 2000):
        docs = build_docs(spark, n_clean, k).localCheckpoint(eager=True)
        drop_sets = {}
        for mode, kwargs in (
            ("uncapped", {}),
            ("star", {"max_bucket": MAX_BUCKET, "oversize": "star"}),
        ):
            arrays = doc_shingle_arrays(docs, 3).cache()
            n_cands = minhash.native_minhash_candidates(
                arrays, **kwargs
            ).count()
            arrays.unpersist()
            t0 = time.perf_counter()
            pairs = minhash.native_minhash_near_dup_pairs(
                docs, n=3, threshold=0.8, **kwargs
            )
            dropped = {
                r[0]
                for r in pairs.select("doc_b").distinct().collect()
            }
            wall = time.perf_counter() - t0
            drop_sets[mode] = dropped
            print(
                json.dumps(
                    {
                        "metric": "skew_neardup",
                        "mode": mode,
                        "n_clean": n_clean,
                        "k_viral": k,
                        "candidates": n_cands,
                        "dropped": len(dropped),
                        "wall_sec": round(wall, 2),
                    }
                ),
                flush=True,
            )
        lost = drop_sets["uncapped"] - drop_sets["star"]
        print(
            json.dumps(
                {
                    "metric": "skew_neardup_parity",
                    "k_viral": k,
                    "drop_set_equal": drop_sets["uncapped"]
                    == drop_sets["star"],
                    "lost_by_star": len(lost),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
