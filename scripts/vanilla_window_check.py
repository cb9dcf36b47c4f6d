"""Driver-environment rehearsal: run the EXACT 50-query window the
correctness driver will hash-check, on a VANILLA SparkSession (no
newsflow confs — the driver builds its own session and the engine must
self-configure via load_table/apply_runtime_confs).

This is the gap between `tests/test_oracle_parity.py` (house session)
and `preflight`'s contract stage (vanilla, but only entry()): a conf the
house session sets globally but a query forgets to self-apply would pass
parity and still fail at the driver. Row counts only — value parity is
the parity suite's job.

Usage: python scripts/vanilla_window_check.py [n_queries]
Exit 0 iff every window query builds and returns >= 0 rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = os.environ.get("NEWSFLOW_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from newsflow import registry

    specs = registry.all_specs()
    window = [name for name, s in specs.items() if s.oracle][:n]
    failures = []
    for i, name in enumerate(window):
        t0 = time.perf_counter()
        try:
            rows = specs[name].build(spark, sf_dir).count()
            print(
                f"  [{i + 1:02d}/{len(window)}] {name}: {rows} rows "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report every failure
            failures.append((name, repr(e)[:200]))
            print(f"  [{i + 1:02d}/{len(window)}] {name}: FAILED {e!r}"[:300])
    spark.stop()
    if failures:
        print(f"vanilla_window_check: {len(failures)} FAILED: "
              f"{[n for n, _ in failures]}")
        return 1
    print(f"vanilla_window_check: all {len(window)} window queries OK "
          "on a vanilla session")
    return 0


if __name__ == "__main__":
    sys.exit(main())
