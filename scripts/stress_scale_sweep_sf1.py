"""Strong-scaling sweep at synthetic sf1.0 (VERDICT r14 Next #4): the
r14 8-vs-32-core comparison ran at sf0.1, where 32-way shuffles of
few-MB data measure scheduling overhead, not parallelism ("local[8]
beats local[32]" was an sf0.1 artifact). This sweep re-asks the
question at 10x the data — the 5 most expensive headline queries, the
same fresh-JVM min-per-point methodology as stress_executor_sweep.py
(two INTERLEAVED passes, per-JVM cpu_calib recorded so residual host
drift stays visible).

Usage:
  python scripts/stress_scale_sweep_sf1.py              # full sweep
  python scripts/stress_scale_sweep_sf1.py --one 8 <sf_dir>   # internal

Writes one JSON line to stdout; paste the table into BENCH_sf1.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# The 5 most expensive headline queries at sf0.1 (r15 baseline-min).
QUERIES = (
    "streaming_ann_index_ingest",
    "corpus_pipeline_e2e",
    "rag_rerank_maxsim",
    "ngram_jaccard_pairs_sampled",
    "corpus_takedown_ffd_audit",
)
CORES = (8, 32)
OUT_DIR = "/tmp/newsflow_sf1_sweep"
COPIES = 10  # sf0.1 x 10 = synthetic sf1.0


def run_one(cores: int, sf_dir: str) -> None:
    from bench import cpu_calibration_probe
    from newsflow import registry
    from newsflow.session import get_spark

    spark = get_spark(
        app_name=f"newsflow-sf1-sweep-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    calib = cpu_calibration_probe(reps=1)
    specs = registry.all_specs()
    timings = {}
    for name in QUERIES:
        spec = specs[name]
        spec.build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = min(dt, time.perf_counter() - t0)
        timings[name] = round(dt, 3)
    print(
        json.dumps(
            {"cores": cores, "queries": timings, "cpu_calib": round(calib, 3)}
        )
    )
    spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(int(sys.argv[i + 1]), sys.argv[i + 2])
        return

    from newsflow.session import get_spark
    from scripts.bench_sf1 import synthesize

    spark = get_spark(app_name="newsflow-sf1-sweep-synth")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    synthesize(spark, COPIES, out_dir=OUT_DIR)
    t_gen = time.perf_counter() - t0
    spark.stop()

    results: dict[int, dict[str, float]] = {}
    calibs: dict[int, list[float]] = {c: [] for c in CORES}
    for pass_no in (1, 2):
        for cores in CORES:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    str(cores),
                    OUT_DIR,
                ],
                capture_output=True,
                text=True,
                cwd=ROOT,
            )
            lines = [
                x
                for x in proc.stdout.strip().splitlines()
                if x.startswith("{")
            ]
            if proc.returncode != 0 or not lines:
                sys.stderr.write(
                    f"[sf1-sweep] FAILED pass {pass_no} local[{cores}] "
                    f"(rc={proc.returncode}); child stderr tail:\n"
                    + "\n".join(proc.stderr.splitlines()[-20:])
                    + "\n"
                )
                raise SystemExit(1)
            point = json.loads(lines[-1])
            calibs[cores].append(point.get("cpu_calib", 0.0))
            prev = results.get(cores)
            results[cores] = (
                point["queries"]
                if prev is None
                else {q: min(prev[q], point["queries"][q]) for q in QUERIES}
            )
            print(
                f"[sf1-sweep] pass {pass_no} local[{cores}]: "
                f"{point['queries']} calib={point.get('cpu_calib')}",
                file=sys.stderr,
            )

    summary = {
        "metric": "scale_sweep_sf1",
        "copies": COPIES,
        "synthesize_sec": round(t_gen, 1),
        "cores": {str(c): results[c] for c in CORES},
        "cpu_calib": {str(c): calibs[c] for c in CORES},
        "speedup_8_to_32": {
            q: round(results[8][q] / results[32][q], 2) for q in QUERIES
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
