"""Settle the simhash hash-cost question with a number (VERDICT r13
Next #4): md5-nibble bits (engine-shared, exactly oracle-able — the
registered `simhash_near_dup_pairs` since r13) vs xxhash64 bits (one
native hash per token — the cheapest derivation, python-reference-
tested) on the SIGNATURE stage at synthetic sf1, where the per-token
premium compounds with corpus size.

Measures simhash_signatures(docs, bits=...) alone — the stage the two
forms differ in; banding/pair expansion downstream is identical — in
INTERLEAVED passes (md5, xx, md5, xx, ...) with min-per-form and a
per-pass CPU calibration sample, the r13 unstable-host methodology.
Also counts md5( occurrences in the physical plan to verify CSE truly
collapses the 16 `_nib_expr` references to ONE md5 per token row.

Usage: python scripts/stress_simhash_hashcost.py [passes]
Appends the measured row + decision to BENCH_sf1.md by hand (numbers
printed as one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import cpu_calibration_probe  # noqa: E402
from newsflow.dedup.simhash import simhash_signatures  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table, spread  # noqa: E402
from scripts.bench_sf1 import OUT_DIR, synthesize  # noqa: E402

COPIES = 10  # sf0.1 x 10 = synthetic sf1


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="newsflow-simhash-hashcost")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(OUT_DIR, "documents.parquet")):
        t0 = time.perf_counter()
        synthesize(spark, COPIES, out_dir=OUT_DIR)
        print(f"# synthesized sf1 in {time.perf_counter() - t0:.1f}s")

    docs = spread(load_table(spark, OUT_DIR, "documents"))

    # CSE check: the md5 plan must contain ONE md5 call site per token
    # row, not 16 (the 16 _nib_expr references share the subexpression).
    md5_plan = (
        simhash_signatures(docs, bits="md5")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    md5_sites = md5_plan.count("md5(")
    print(f"# physical-plan md5( occurrences: {md5_sites}")

    # Warm both forms (codegen compile) before timing.
    for bits in ("md5", "xxhash64"):
        simhash_signatures(docs, bits=bits).write.format("noop").mode(
            "overwrite"
        ).save()

    best = {"md5": float("inf"), "xxhash64": float("inf")}
    calibs = []
    for p in range(passes):
        calibs.append(round(cpu_calibration_probe(reps=1), 3))
        for bits in ("md5", "xxhash64"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            simhash_signatures(docs, bits=bits).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[bits] = min(best[bits], dt)
            print(f"# pass {p}: {bits} {dt:.2f}s")
    premium = best["md5"] / best["xxhash64"]
    print(
        json.dumps(
            {
                "stage": "simhash_signatures@sf1",
                "md5_sec": round(best["md5"], 3),
                "xxhash64_sec": round(best["xxhash64"], 3),
                "md5_premium": round(premium, 3),
                "plan_md5_sites": md5_sites,
                "cpu_calibs": calibs,
                "passes": passes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
