"""Executor-count (strong-scaling) sweep for the three heaviest plans
(VERDICT r12 stretch #10): fixed data, cores swept local[8] → local[16]
→ local[32], each core count in its OWN fresh JVM (a single session
cannot change master, and cross-query cache debris pollutes ad-hoc
timing — the r12 lesson).

Corpus: a 2x key-shifted replica of sf0.1 ("sf0.2-equivalent",
bench_sf1.synthesize with copies=2 — documents gain one ~0.9-Jaccard
sibling each, so the dedup plans do real verify work).

What this is evidence FOR: on a real cluster the executor count is the
knob you turn at 100 TB; a plan whose wall-clock refuses to drop from
8 → 32 local cores is serialized somewhere (driver loop, single-task
stage, un-parallel expansion) and will NOT spread over 1000 executors
either. Near-linear strong scaling here is the local-mode proxy for
"adding executors helps".

Usage:
  python scripts/stress_executor_sweep.py            # full sweep + table
  python scripts/stress_executor_sweep.py --one 16 <sf_dir>   # internal

Writes one JSON line to stdout and appends the table to BENCH_sf1.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = (
    "corpus_cluster_split",       # iterative label propagation + split
    "ngram_jaccard_pairs_sampled",  # sampled quadratic shingle join
    "streaming_ann_index_ingest",   # maintained-ANN-index stream
)
CORES = (8, 16, 32)
OUT_DIR = "/tmp/newsflow_sf02_sweep"
COPIES = 2


def run_one(cores: int, sf_dir: str) -> None:
    """One fresh-JVM measurement pass: warm + best-of-2 per query, with
    a pure-CPU calibration sample so host drift is visible per point
    (the shared host's speed swings minute-to-minute — two sequential
    full sweeps disagreed by 30% per point while agreeing best-vs-best,
    which is why main() interleaves passes and takes the min)."""
    from bench import cpu_calibration_probe
    from newsflow import registry
    from newsflow.session import get_spark

    spark = get_spark(
        app_name=f"newsflow-sweep-{cores}",
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

    spark = get_spark(app_name="newsflow-sweep-synth")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    synthesize(spark, COPIES, out_dir=OUT_DIR)
    t_gen = time.perf_counter() - t0
    spark.stop()

    # Two INTERLEAVED passes (8,16,32, 8,16,32), min per point: the
    # shared host drifts minute-to-minute (measured: two sequential
    # whole sweeps disagreed ~30% per point), so a single sequential
    # pass confounds host drift with the core-count effect. Min-of-two
    # passes ~15 minutes apart cancels the drift spikes; the per-JVM
    # cpu_calib sample is recorded so residual drift stays visible.
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
                # Surface WHICH point died and the child's actual error
                # (review r13: check=True + captured stderr made a
                # failed multi-hour sweep die with no diagnostic).
                sys.stderr.write(
                    f"[sweep] FAILED pass {pass_no} local[{cores}] "
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
                f"[sweep] pass {pass_no} local[{cores}]: "
                f"{point['queries']} calib={point.get('cpu_calib')}",
                file=sys.stderr,
            )

    summary = {
        "metric": "executor_sweep_sf0.2",
        "synthesize_sec": round(t_gen, 1),
        "cores": {str(c): results[c] for c in CORES},
        "cpu_calib": {str(c): calibs[c] for c in CORES},
        "speedup_8_to_32": {
            q: round(results[8][q] / results[32][q], 2) for q in QUERIES
        },
    }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| `{q}` | {results[8][q]:.2f} | {results[16][q]:.2f} | "
        f"{results[32][q]:.2f} | {results[8][q] / results[32][q]:.2f}x |"
        for q in QUERIES
    )
    with open(os.path.join(ROOT, "BENCH_sf1.md"), "a") as f:
        f.write(
            f"""
## Executor-count sweep (round 13) — strong scaling of the heaviest plans

`python scripts/stress_executor_sweep.py` — fixed 2x-sf0.1 replica
({COPIES} key-shifted copies, one ~0.9-Jaccard sibling per doc), cores
swept 8 → 16 → 32, each point a fresh JVM, warm-up + best-of-2, TWO
interleaved passes with min-per-point (single sequential sweeps
confound shared-host drift with the core effect — two back-to-back
full sweeps disagreed ~30% per point with opposite conclusions; the
per-JVM cpu-probe samples in the JSON make residual drift visible).
This is the local-mode proxy for "does adding executors help": a plan
that cannot use 4x the cores here is serialized somewhere and would
not spread over a 1000-executor cluster either. 4.0x is perfect
strong scaling; streaming/index plans carry fixed per-batch scheduling
cost, so their ceiling is lower by design — and more cores can even
hurt them at small batch sizes (more tasks per tiny micro-batch stage).

| query | local[8] (s) | local[16] (s) | local[32] (s) | 8→32 speedup |
|---|---|---|---|---|
{rows}
"""
        )


if __name__ == "__main__":
    main()
