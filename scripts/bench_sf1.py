"""Whole-suite scaling point at synthetic sf1.0 (VERDICT r3 stretch #7):
the driver ships no sf1.0 testdata, so this synthesizes a 10x replica of
sf0.1 (key-shifted copies; documents get distinct suffixes so the
near-dup structure is realistic — each doc gains 9 ~0.9-Jaccard
siblings, making the pair-output queries intentionally superlinear) and
runs the SAME headline set as bench.py against it.

Usage: python scripts/bench_sf1.py [--keep] [copies]
Writes one JSON line to stdout and refreshes the table in BENCH_sf1.md.

Honesty notes baked into the output:
- documents/embeddings pair queries have quadratic OUTPUT in the copy
  factor (10 copies -> 45 sibling pairs per original doc); their wall
  tracks output size, not input size — the same caveat as the 10x/20x
  stress tables in COVERAGE.md.
- dimension tables (customer/supplier/part/nation/region) are NOT
  scaled (TPC-H scales some of these; holding them fixed makes the
  fact-side scaling the measured variable).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bench import HEADLINE  # noqa: E402
from newsflow import registry  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/newsflow_sf1"
KEY_SHIFT = 10_000_000


def _write_single(df, path: str) -> None:
    from newsflow.sources.sinks import write_single_parquet_file

    write_single_parquet_file(df, path)


def synthesize(
    spark, copies: int, src_sf: str = SRC_SF, out_dir: str = OUT_DIR
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # unscaled dimensions: straight copies
    for t in ("region", "nation", "customer", "supplier", "part"):
        _write_single(
            load_table(spark, src_sf, t), os.path.join(out_dir, f"{t}.parquet")
        )

    def replicate(name, key_cols, mutate=None):
        base = load_table(spark, src_sf, name)
        out = None
        for i in range(copies):
            c = base
            for k in key_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_SHIFT))
            if mutate is not None:
                c = mutate(c, i)
            out = c if out is None else out.unionByName(c)
        _write_single(out, os.path.join(out_dir, f"{name}.parquet"))

    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("events", ["event_id"])  # same users/ts range: denser windows
    replicate(
        "documents",
        ["doc_id"],
        # distinct suffix per copy: near-dups (~0.9 Jaccard), not
        # byte-identical — exercises the LSH/verify stages realistically
        mutate=lambda c, i: c.withColumn(
            "text", F.concat("text", F.lit(f" sfcopy{i}"))
        ),
    )
    replicate("embeddings", ["vec_id"])


def main() -> None:
    copies = 10
    keep = "--keep" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            copies = int(a)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(
        app_name="newsflow-bench-sf1",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    t0 = time.perf_counter()
    synthesize(spark, copies)
    t_gen = time.perf_counter() - t0

    skip = set()
    extra: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip.update(a.split("=", 1)[1].split(","))
        if a.startswith("--extra="):
            # Registry queries beyond the headline set (e.g. the audit
            # family's multi-scale rows, VERDICT r4 #7) — timed with the
            # same warm-up + best-of-2 discipline.
            extra.extend(a.split("=", 1)[1].split(","))
    specs = registry.all_specs()
    timings: dict[str, float] = {}
    total = 0.0
    for name in [*HEADLINE, *[e for e in extra if e not in HEADLINE]]:
        spec = specs.get(name)
        if spec is None or name in skip:
            continue
        print(f"[bench_sf1] {name} ...", file=sys.stderr, flush=True)
        spec.build(spark, OUT_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t1 = time.perf_counter()
            spec.build(spark, OUT_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = min(dt, time.perf_counter() - t1)
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sf1",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": 0.1 * copies,
                "synthesize_sec": round(t_gen, 1),
                "copies": copies,
                "skipped": sorted(skip),
            }
        )
    )
    spark.stop()
    if not keep:
        shutil.rmtree(OUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
