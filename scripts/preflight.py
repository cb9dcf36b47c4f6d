"""One-command local gate — everything the external driver will check,
in dependency order, fail-fast:

  1. driver contract on a VANILLA session (entry / queries / oracle_sql)
  2. oracle parity suite at sf0.01 (the actual gate rehearsal),
     including the permanently-empty-oracle check
  3. bench trend gate vs the latest committed BENCH_r*.json

Usage: python scripts/preflight.py [--fast]
  --fast skips the bench gate (parity only) for inner-loop use.

Exit 0 = ship it; non-zero = the first failing stage's status.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def stage(name: str, argv: list[str]) -> None:
    print(f"\n=== preflight: {name} ===", flush=True)
    rc = subprocess.call(argv, cwd=ROOT)
    if rc != 0:
        print(f"preflight FAILED at {name} (rc={rc})", flush=True)
        sys.exit(rc)


def contract() -> None:
    code = (
        "from pyspark.sql import SparkSession\n"
        f"import sys; sys.path.insert(0, {ROOT!r})\n"
        "spark = (SparkSession.builder.master('local[8]')\n"
        "         .config('spark.ui.enabled','false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "import __spark_entry__ as e\n"
        "n = e.entry(spark).count()\n"
        "assert n > 0, 'entry() returned no rows'\n"
        "qs, osql = e.queries(), e.oracle_sql()\n"
        "assert set(osql) <= set(qs)\n"
        "print(f'contract OK: entry rows={n}, "
        "{len(qs)} queries, {len(osql)} oracles')\n"
    )
    stage("driver contract (vanilla session)", [sys.executable, "-c", code])


def artifacts_committed() -> None:
    """Driver artifacts (CORRECTNESS_r*.json / BENCH_r*.json /
    LEAKCHECK.json) must be committed with the round's work — the same
    nit appeared in three consecutive verdicts (r3-r5 #3). Fails on any
    untracked or modified-but-uncommitted artifact so the round cannot
    end clean-looking with loose driver output in the working tree."""
    print("\n=== preflight: driver artifacts committed ===", flush=True)
    out = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    ).stdout
    loose = [
        line
        for line in out.splitlines()
        if any(
            line[3:].startswith(p)
            for p in ("CORRECTNESS_r", "BENCH_r", "BENCH_LOCAL_r", "LEAKCHECK")
        )
    ]
    if loose:
        print("uncommitted driver artifacts:\n" + "\n".join(loose), flush=True)
        print("preflight FAILED at driver artifacts committed", flush=True)
        sys.exit(1)
    print("artifacts OK: none loose", flush=True)


def bench_harness_dirty() -> bool:
    """True when bench.py / bench_check.py differ from HEAD (staged,
    unstaged, or untracked). Round 12 shipped a calibration probe in
    bench.py via a `--fast` commit; it had never executed once and
    crashed the entire driver bench (ANSI overflow, BENCH_r12 rc=1).
    A change to the bench harness is exactly the change `--fast`
    cannot be allowed to skip."""
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", "bench.py", "bench_check.py"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    ).stdout
    return bool(out.strip())


def bench_smoke() -> None:
    """Execute bench.py's calibration probe (small range) plus one
    headline query end-to-end — the minimum proof that an edited bench
    harness still runs. Unit tests on the drift math can't catch a
    probe expression that only fails when EXECUTED (round 12's ANSI
    overflow)."""
    code = (
        f"import sys; sys.path.insert(0, {ROOT!r})\n"
        "from newsflow.session import get_spark\n"
        "import bench\n"
        "spark = get_spark(app_name='bench-smoke', master='local[4]',\n"
        "                  shuffle_partitions=4)\n"
        "c = bench.calibration_probe(spark, rows=1_000_000, reps=1)\n"
        "assert c > 0, 'probe returned nonpositive time'\n"
        "c2 = bench.cpu_calibration_probe(elems=1_000_000, rounds=1, reps=1)\n"
        "assert c2 > 0, 'cpu probe returned nonpositive time'\n"
        "import bench_check\n"
        "print(f'bench smoke OK: calib={c:.3f}s')\n"
    )
    stage("bench smoke (probe executes)", [sys.executable, "-c", code])


def main() -> None:
    fast = "--fast" in sys.argv
    if fast and bench_harness_dirty():
        print(
            "preflight: bench.py/bench_check.py changed — --fast refused "
            "for the bench harness (r12 lesson); running bench smoke + "
            "full trend gate.",
            flush=True,
        )
        fast = False
    artifacts_committed()
    # The smoke runs UNCONDITIONALLY (review r13): the dirty check above
    # only sees the working tree, so a bench edit that was already
    # committed would sail through --fast without the probe ever
    # executing — the exact r12 failure class. ~30 s of JVM startup is
    # the full cost; the expensive stage --fast skips is the trend gate.
    bench_smoke()
    contract()
    stage(
        "oracle parity @ sf0.01",
        [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py", "-q", "-x"],
    )
    if not fast:
        stage("bench trend gate", [sys.executable, "bench_check.py"])
    print("\npreflight PASS", flush=True)


if __name__ == "__main__":
    main()
