"""Capture `.explain("formatted")` for headline queries into plans/rNN/.

Usage: [PLANS_ROUND=r15] python scripts/capture_plans.py before|after [name ...]

With no names, captures every bench.py HEADLINE query. Writes
plans/$PLANS_ROUND/<query>_<tag>.txt (default r15) — the
optimization-round evidence files the judge checks plan claims against
(guide §1: capture the plan shape for every declared query before and
after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsflow import registry  # noqa: E402
from newsflow.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r15"),
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    spark = get_spark(
        app_name="newsflow-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    specs = registry.all_specs()
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = spec.build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
