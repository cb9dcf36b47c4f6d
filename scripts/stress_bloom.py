"""Scale-up stress for the Bloom pre-filter sizing (VERDICT r11 Next
#3): at 1x and Nx key counts, build BOTH the fixed 4096-bit form and the
sharded ~12-bits/key form, probe a guaranteed-disjoint candidate set,
and measure FPR + wall. The claim under test: the fixed bitmap's FPR
collapses toward 100% as keys grow (the filter silently stops
filtering), while the sharded form's shard count scales with n and holds
the analytic ~0.6% rate at any scale; build wall grows ~linearly (one
pass, map-side partial bit_or into (shard, word) cells).

Usage: python scripts/stress_bloom.py [copies]   # default 20
Prints one JSON line for BENCH_sf1.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow import sketch as sk  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="newsflow-stress-bloom")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents").select("text")
    big = None
    for i in range(copies):
        # Distinct suffix per copy -> every copy contributes NEW keys.
        c = docs.select(
            F.md5(F.concat("text", F.lit(f" stresscopy{i}"))).alias("k")
        )
        big = c if big is None else big.union(c)
    base = docs.select(F.md5("text").alias("k")).distinct()
    big = big.distinct()

    # Warm pass: compile the whole build+probe chain once (bench.py
    # steady-state methodology).
    sk.bloom_probe(base, sk.bloom_build(base)).count()

    out: dict[str, object] = {
        "metric": "bloom_sizing_stress",
        "copies": copies,
        "sf_dir": sf_dir,
    }
    for label, keys in (("1x", base), ("%dx" % copies, big)):
        keys = keys.localCheckpoint(eager=True)
        n = keys.count()
        ns = max(1, math.ceil(n * sk.BLOOM_BITS_PER_KEY / sk.BLOOM_SHARD_BITS))
        probes = keys.select(F.concat("k", F.lit(":novel")).alias("k"))

        t0 = time.perf_counter()
        fixed = sk.bloom_build(keys).localCheckpoint(eager=True)
        fixed_build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fixed_fp = (
            sk.bloom_probe(probes, fixed).filter("might_contain").count()
        )
        fixed_probe_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        sharded = sk.bloom_build_sharded(keys, n_shards=ns).localCheckpoint(
            eager=True
        )
        sharded_build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sharded_fp = (
            sk.bloom_probe_sharded(probes, sharded, n_shards=ns)
            .filter("might_contain")
            .count()
        )
        sharded_probe_s = time.perf_counter() - t0

        k = len(sk.BLOOM_SALTS)
        analytic = (1 - math.exp(-k * (n / ns) / sk.BLOOM_SHARD_BITS)) ** k
        out[label] = {
            "n_keys": n,
            "fixed": {
                "fpr_pct": round(100.0 * fixed_fp / n, 2),
                "build_s": round(fixed_build_s, 2),
                "probe_s": round(fixed_probe_s, 2),
            },
            "sharded": {
                "n_shards": ns,
                "bitmap_rows": int(sharded.count()),
                "fpr_pct": round(100.0 * sharded_fp / n, 2),
                "analytic_fpr_pct": round(100.0 * analytic, 2),
                "build_s": round(sharded_build_s, 2),
                "probe_s": round(sharded_probe_s, 2),
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
