#!/usr/bin/env python3
"""Bench trend gate: fail if any shared headline query regresses more
than REGRESSION_FACTOR vs the latest committed BENCH_r*.json.

Usage:
    python bench_check.py                 # runs bench.py, compares
    python bench_check.py current.json    # compares a saved bench line

Round-start ritual (keeps the gate HARD): the driver regenerates
/root/testdata every round, so run `python bench.py` once on the fresh
corpus FIRST THING each round and commit the JSON line as
BENCH_LOCAL_r<N>.json — every subsequent in-round commit is then gated
against a same-data_sig baseline instead of the always-cross-data
driver bench.

Variance model — three stamped signals separate a real plan
regression from the two big confounders: `data_sig` (same corpus?) and
`calib_sec` (same machine speed? a fixed CPU probe; the baseline is
scaled by the calibration ratio before the gate applies, see
`drift_factor`). What survives both corrections and the two-run rule
is a code regression.

Noise floor: regressions smaller than ABS_FLOOR_SEC absolute are
ignored — at sf0.1 several headline queries run in ~0.2 s, where a
1.5x "regression" is run-to-run jitter, not a plan change (the exact
drift VERDICT r2 flagged on tumbling_window_counts).

Two-run rule (VERDICT r3 #6): a query is only declared regressed if it
exceeds the gate in TWO consecutive bench runs — the r3 review saw two
DIFFERENT queries flag >1.5x in back-to-back runs under concurrent
load, both false positives. A first-run flag triggers an automatic
re-run restricted to the flagged comparison; only queries that fail
both runs fail the gate. (With a saved-JSON argument the re-run is not
possible, so saved mode defaults to STRICT: an unconfirmed single-run
flag exits 1 — a caller gating CI on a saved line keeps the hard
contract without extra flags. Pass --lenient to report the flag with a
NOISE-UNCONFIRMED marker and exit 0 instead; --strict remains accepted
as an explicit no-op for saved runs and is ignored for live runs,
where the two-run rule already confirms before failing.)

Exit status: 0 = no regression (or unconfirmed saved-run flag under
--lenient; live runs that flag once but pass the confirm re-run always
exit 0 — that IS the two-run rule), 1 = confirmed regression, or a
saved-run flag without --lenient, 2 = usage/IO error.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REGRESSION_FACTOR = 1.5
ABS_FLOOR_SEC = 0.15

ROOT = Path(__file__).resolve().parent


def _load_bench(p: Path) -> dict | None:
    try:
        data = json.loads(p.read_text())
    except (OSError, ValueError):
        return None
    # The driver wraps bench.py's JSON line under "parsed".
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return data if isinstance(data.get("queries"), dict) else None


def latest_committed_bench(
    current_sig: str | None = None, root: Path | None = None
) -> tuple[str, dict] | None:
    """Newest committed baseline, PREFERRING one whose data_sig matches
    ``current_sig``.

    The driver regenerates /root/testdata every round, so the driver's
    own BENCH_r*.json is ALWAYS cross-data by the time the next round's
    commits are gated — which made the 1.5x regression gate permanently
    informational (VERDICT r11 "What's wrong" #2). The fix: each round
    commits a BENCH_LOCAL_r*.json measured on the fresh corpus at round
    start; any baseline (LOCAL or driver) whose data_sig equals the
    current run's sig restores the HARD gate. Candidates sort by round
    number (LOCAL_rN after driver rN of the same round, being newer by
    construction: LOCAL_rN is measured at the start of round N, on the
    data the driver only benches at round N's end). Fallback when no
    same-sig baseline exists: newest overall, compared informationally
    (the DATA-CHANGED path).
    """
    root = root or ROOT
    candidates: list[tuple[int, int, Path, dict]] = []
    for pattern, local in (("BENCH_r*.json", 0), ("BENCH_LOCAL_r*.json", 1)):
        for p in root.glob(pattern):
            m = re.search(r"r(\d+)", p.stem)
            data = _load_bench(p)
            if m and data is not None:
                candidates.append((int(m.group(1)), local, p, data))
    if not candidates:
        return None
    candidates.sort(key=lambda t: (t[0], t[1]))
    if current_sig is not None:
        same = [c for c in candidates if c[3].get("data_sig") == current_sig]
        if same:
            _, _, p, data = same[-1]
            return p.name, data
    _, _, p, data = candidates[-1]
    return p.name, data


def parse_bench_stdout(out: str) -> dict:
    """Newest JSON line carrying the per-query map. bench.py prints the
    full map, THEN a compact summary line (so the driver's
    tail-truncated archive always ends with a complete record); the
    gate needs the map, so summary-shaped lines are skipped."""
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            data = json.loads(line)
        except ValueError:
            continue
        if isinstance(data.get("queries"), dict):
            return data
    raise RuntimeError("bench.py printed no per-query JSON line")


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return parse_bench_stdout(out)


DRIFT_WARN_FACTOR = 1.5  # |drift| beyond this is shouted, not silent
PROBE_DISAGREE_FACTOR = 1.5  # spark-vs-cpu probe drift mismatch alarm
DRIFT_CLAMP = 4.0  # correction ceiling; beyond it the host is unmeasurable


def host_unmeasurable(current: dict, baseline: dict) -> bool:
    """True when the PURE-CPU probe ratio exceeds the correction clamp:
    the host is so much slower than when the baseline was measured that
    no timing conclusion (pass or fail) is valid — round-13 observed
    the shared host at 6-12x nominal for over an hour, which would
    hard-fail every commit's gate with false regressions while the
    clamp saturates. The gate reports HOST-UNMEASURABLE and passes
    informationally; the honest follow-up is re-running when the probe
    reads near-nominal (a real regression landed during such a window
    is caught then, against the same committed baseline)."""
    cpu = _probe_ratio(current, baseline, "cpu_calib_sec")
    return cpu is not None and cpu > DRIFT_CLAMP


def _probe_ratio(current: dict, baseline: dict, key: str) -> float | None:
    c, b = current.get(key), baseline.get(key)
    if not c or not b or b <= 0:
        return None
    return c / b


def drift_factor(current: dict, baseline: dict) -> float:
    """Machine-speed ratio between the two runs: > 1 means the current
    machine is SLOWER than when the baseline was measured. The round-12
    close hit exactly this — identical code + identical corpus measured
    1.5-2x slower after ~11 h of shared-host drift (worktree-bisected),
    a broad false FAIL under an uncorrected gate. The factor scales the
    baseline before the ratio test, keeping the gate hard under drift;
    clamped to [0.5, 4] so a corrupt probe can never fully disarm it,
    and 1.0 (no correction) when neither probe spans both runs.

    The correction PREFERS the Spark-independent pure-CPU probe
    (`cpu_calib_sec`, ADVICE r12): the Spark-executed probe
    (`calib_sec`) runs through get_spark + the scheduler, so an
    engine/session-config regression that slows the probe would scale
    the baseline up and partially mask itself. A numpy loop cannot be
    slowed by a Spark change — with the CPU probe in charge, engine
    slowdowns stay visible as query regressions, and
    `drift_diagnostics` flags spark-vs-cpu probe disagreement as
    "engine drift, not machine drift"."""
    cpu = _probe_ratio(current, baseline, "cpu_calib_sec")
    spark = _probe_ratio(current, baseline, "calib_sec")
    r = cpu if cpu is not None else spark
    if r is None:
        return 1.0
    return min(max(r, 0.5), DRIFT_CLAMP)


def drift_diagnostics(current: dict, baseline: dict) -> list[str]:
    """Loud-warning lines for suspicious drift (ADVICE r12): a large
    correction should never be silent, and the two probes disagreeing
    means the 'drift' lives in the engine, not the machine."""
    warnings = []
    cpu = _probe_ratio(current, baseline, "cpu_calib_sec")
    spark = _probe_ratio(current, baseline, "calib_sec")
    applied = drift_factor(current, baseline)
    if applied > DRIFT_WARN_FACTOR or applied < 1.0 / DRIFT_WARN_FACTOR:
        warnings.append(
            f"bench_check: WARNING — machine drift correction {applied:.2f}x "
            f"exceeds {DRIFT_WARN_FACTOR}x; the gate is being rescaled "
            "heavily. Verify host load before trusting a PASS."
        )
    if cpu is not None and spark is not None and cpu > 0:
        mismatch = spark / cpu
        if mismatch > PROBE_DISAGREE_FACTOR:
            warnings.append(
                f"bench_check: WARNING — Spark probe drift {spark:.2f}x vs "
                f"pure-CPU probe drift {cpu:.2f}x: the machine did not slow "
                "down, the ENGINE did (session config / scheduler change?). "
                "Correction uses the CPU probe, so the slowdown will show "
                "in the per-query ratios — investigate before shipping."
            )
        elif mismatch < 1.0 / PROBE_DISAGREE_FACTOR:
            warnings.append(
                f"bench_check: NOTE — Spark probe drift {spark:.2f}x vs "
                f"pure-CPU probe drift {cpu:.2f}x: the ENGINE got faster "
                "relative to the machine (session/scheduler improvement?). "
                "Correction uses the CPU probe, so per-query ratios will "
                "look better than machine speed alone explains — refresh "
                "the baseline so the gate re-anchors on the faster engine."
            )
    return warnings


def flag_regressions(
    current: dict, baseline: dict, drift: float = 1.0
) -> list[str]:
    """Queries exceeding the ratio gate AND the absolute floor, against
    the drift-scaled baseline."""
    shared = set(current.get("queries", {})) & set(baseline.get("queries", {}))
    out = []
    for q in sorted(shared):
        cur, old = current["queries"][q], baseline["queries"][q] * drift
        ratio = cur / old if old > 0 else float("inf")
        if ratio > REGRESSION_FACTOR and (cur - old) > ABS_FLOOR_SEC:
            out.append(q)
    return out


def adopt_baseline(current: dict) -> str:
    """Round-start ritual as CODE (VERDICT r12 stretch #9): when a live
    run finds no committed same-data_sig baseline (fresh corpus — the
    driver regenerates /root/testdata each round), the measurement just
    taken IS the freshest same-corpus number. Write it to
    BENCH_LOCAL_r<N>.json (N = newest driver-artifact round + 1, i.e.
    the round in progress) so it gates every subsequent run on this
    corpus; preflight's loose-artifact check then forces the file into
    git with the next commit. Discipline used to do this by hand —
    round 12's VERDICT asked for the fallback to be automatic."""
    import re

    rounds = [0]
    for pattern in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        for p in ROOT.glob(pattern):
            m = re.search(r"_r(\d+)$", p.stem)
            if m:
                rounds.append(int(m.group(1)))
    path = ROOT / f"BENCH_LOCAL_r{max(rounds) + 1}.json"
    if path.exists():
        # NEVER clobber an existing round baseline (review r13): a live
        # run against a different sf_dir (sf0.01 smoke, a stress
        # corpus) reaches this branch with a foreign data_sig, and
        # overwriting would destroy the round-start sf-default baseline
        # — silently degrading the hard gate to informational for the
        # rest of the round. Mid-round corpus regeneration is the only
        # legitimate overwrite, and that is a deliberate manual step.
        print(
            f"bench_check: NOT adopting — {path.name} already exists with "
            "a different data_sig (foreign sf_dir run, or the corpus was "
            "regenerated mid-round; delete the file manually if so)."
        )
        return ""
    path.write_text(json.dumps(current) + "\n")
    return str(path)


def main(argv: list[str]) -> int:
    lenient = "--lenient" in argv
    args = [a for a in argv[1:] if a not in ("--strict", "--lenient")]
    from_file = bool(args)
    if from_file:
        try:
            current = json.loads(Path(args[0]).read_text())
        except (OSError, ValueError) as e:
            print(f"bench_check: cannot read {args[0]}: {e}")
            return 2
    else:
        current = run_bench()

    cur_sig = current.get("data_sig")
    base = latest_committed_bench(cur_sig)
    if base is None:
        print("bench_check: no committed BENCH_*r*.json baseline; PASS")
        if not from_file:
            p = adopt_baseline(current)
            if p:  # adopt_baseline may refuse (existing unparsable file)
                print(
                    f"bench_check: adopted this run as the same-data "
                    f"baseline {p} — commit it (preflight refuses loose "
                    "artifacts)"
                )
        return 0
    base_name, baseline = base

    # The driver regenerates /root/testdata each round, so a baseline
    # measured on a previous round's data prices DIFFERENT work (doc
    # lengths, sample draws, join fan-outs all shift with the corpus).
    # A ratio gate across data generations flags data variance as code
    # regression — round 11 confirmed this by bisect: the r10 code
    # reproduced the "regressed" ngram_jaccard_pairs_sampled time on
    # the regenerated corpus. latest_committed_bench() therefore prefers
    # a SAME-data_sig baseline (the per-round BENCH_LOCAL_r*.json),
    # which keeps the 1.5x gate HARD for every in-round commit; only
    # when no same-sig baseline exists does the comparison fall back to
    # cross-data, where a confirmed flag is reported as DATA-CHANGED
    # (informational) instead of failing the gate.
    base_sig = baseline.get("data_sig")
    same_data = cur_sig is not None and cur_sig == base_sig
    drift = drift_factor(current, baseline)
    for w in drift_diagnostics(current, baseline):
        print(w)
    if host_unmeasurable(current, baseline):
        # The pure-CPU probe is data-independent, so this verdict is
        # valid even against a cross-data baseline — which is exactly
        # why it must be checked BEFORE any baseline adoption (review
        # r13: adopting a 6x-inflated fresh-sig run would arm the hard
        # gate with garbage and mask real regressions all round).
        cpu = _probe_ratio(current, baseline, "cpu_calib_sec")
        print(
            f"bench_check: HOST-UNMEASURABLE — pure-CPU probe ratio "
            f"{cpu:.2f}x exceeds the {DRIFT_CLAMP}x correction clamp; no "
            "timing conclusion is valid in this window (baseline NOT "
            "adopted). PASS (informational) — re-run when the probe "
            "reads near-nominal."
        )
        return 0
    if not same_data and not from_file and cur_sig is not None:
        # Live run on a corpus no committed baseline covers: the gate
        # below degrades to informational (cross-data), so arm the next
        # run by adopting this clean live measurement as the new
        # same-sig baseline — UNLESS the host is visibly drifted. The
        # pure-CPU probe is data-independent, so its ratio against even
        # a cross-data baseline is a valid host-speed reading; adopting
        # inside a 1.5-4x slow window would arm the round's HARD gate
        # with inflated numbers (with the 0.5 drift floor, later
        # nominal-speed runs gate up to ~2x loose — ADVICE r13), and a
        # fast window would arm it tight (false FAILs later). Defer:
        # the next clean-window run adopts instead.
        cpu = _probe_ratio(current, baseline, "cpu_calib_sec")
        sym = max(cpu, 1.0 / cpu) if cpu else 1.0
        if sym > DRIFT_WARN_FACTOR:
            print(
                f"bench_check: NOT adopting — pure-CPU probe ratio "
                f"{cpu:.2f}x vs {base_name} exceeds the "
                f"{DRIFT_WARN_FACTOR}x warn factor; a baseline adopted "
                "in a drifted window would mis-scale the round's hard "
                "gate. Re-run when the probe reads near-nominal to adopt."
            )
        else:
            p = adopt_baseline(current)
            if p:
                print(
                    f"bench_check: fresh data_sig {cur_sig!r} — adopted "
                    f"this run as the same-data baseline {p}; commit it"
                )

    shared = sorted(
        set(current.get("queries", {})) & set(baseline.get("queries", {}))
    )
    suspects = flag_regressions(current, baseline, drift)
    print(f"bench_check: current vs {base_name} "
          f"({len(shared)} shared queries, gate {REGRESSION_FACTOR}x, "
          f"floor {ABS_FLOOR_SEC}s, two-run rule, "
          f"data {'SAME' if same_data else 'CHANGED/unknown'}, "
          f"machine drift {drift:4.2f}x)")
    for q in shared:
        cur, old = current["queries"][q], baseline["queries"][q] * drift
        ratio = cur / old if old > 0 else float("inf")
        flag = "  <-- suspect" if q in suspects else ""
        print(f"  {q:40s} {old:7.3f}s -> {cur:7.3f}s  ({ratio:4.2f}x){flag}")
    new = sorted(set(current.get("queries", {})) - set(shared))
    if new:
        print(f"  new (no baseline): {', '.join(new)}")

    if not suspects:
        print("bench_check: PASS")
        return 0

    if from_file:
        # Saved line: cannot re-run to confirm. Default is STRICT (exit
        # 1) so CI wiring that feeds a saved JSON keeps gating without
        # opting in; --lenient reports and passes for callers who accept
        # that a single run under unknown concurrent load is below the
        # two-run evidence bar (two r3-review false positives).
        if not same_data:
            print(
                "bench_check: DATA-CHANGED — saved run flags "
                f"{', '.join(suspects)} against a baseline from different "
                "testdata; informational only. PASS"
            )
            return 0
        print("bench_check: NOISE-UNCONFIRMED — single saved run flags "
              f"{', '.join(suspects)}; re-run live to confirm")
        return 0 if lenient else 1

    print(f"bench_check: re-running to confirm {len(suspects)} suspect(s) "
          "(two-run rule)...")
    second = run_bench()
    drift2 = drift_factor(second, baseline)
    confirmed = [
        q for q in flag_regressions(second, baseline, drift2) if q in suspects
    ]
    for q in suspects:
        cur2 = second["queries"].get(q)
        old = baseline["queries"][q] * drift2
        verdict = "REGRESSION" if q in confirmed else "noise (2nd run ok)"
        print(f"  {q:40s} 2nd run {cur2:7.3f}s vs {old:7.3f}s  -> {verdict}")
    if confirmed:
        if not same_data:
            print(
                "bench_check: DATA-CHANGED — "
                f"{len(confirmed)} flagged twice ({', '.join(confirmed)}) "
                f"but baseline data_sig={base_sig!r} != current "
                f"{cur_sig!r}; cross-data timing is informational, not a "
                "code regression. PASS"
            )
            return 0
        print(f"bench_check: FAIL — {len(confirmed)} regressed twice: "
              f"{', '.join(confirmed)}")
        return 1
    print("bench_check: PASS (suspects did not reproduce)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
