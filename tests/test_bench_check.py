"""Exit-contract tests for the bench trend gate (ADVICE r4: saved-JSON
mode must keep the hard CI contract by default)."""

from __future__ import annotations

import json

import bench_check as bc


def _write(tmp_path, name, queries, sig="sig-a"):
    p = tmp_path / name
    body = {"queries": queries}
    if sig is not None:
        body["data_sig"] = sig
    p.write_text(json.dumps(body))
    return str(p)


def test_flag_regressions_respects_ratio_and_floor():
    base = {"queries": {"fast": 0.10, "slow": 2.0}}
    # fast: 2x ratio but only +0.1s absolute — under the floor, ignored.
    # slow: 1.6x and +1.2s — flagged.
    cur = {"queries": {"fast": 0.20, "slow": 3.2}}
    assert bc.flag_regressions(cur, base) == ["slow"]


def test_saved_run_defaults_to_strict_exit(monkeypatch, tmp_path):
    base = {"queries": {"q": 1.0}, "data_sig": "sig-a"}
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda sig=None: ("BENCH_rTEST.json", base)
    )
    regressed = _write(tmp_path, "cur.json", {"q": 2.0})
    assert bc.main(["bench_check.py", regressed]) == 1
    assert bc.main(["bench_check.py", regressed, "--lenient"]) == 0
    # --strict stays accepted as an explicit no-op for saved runs.
    assert bc.main(["bench_check.py", regressed, "--strict"]) == 1


def test_saved_run_passes_clean(monkeypatch, tmp_path):
    base = {"queries": {"q": 1.0}, "data_sig": "sig-a"}
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda sig=None: ("BENCH_rTEST.json", base)
    )
    ok = _write(tmp_path, "ok.json", {"q": 1.05})
    assert bc.main(["bench_check.py", ok]) == 0


def test_changed_data_downgrades_to_informational(monkeypatch, tmp_path):
    """The driver regenerates testdata each round: a flag against a
    baseline measured on DIFFERENT data (different sig, or a legacy
    baseline without one) is data variance, not a code regression —
    report, never fail. Round-11 bisect evidence: the r10 code
    reproduced the 'regressed' time on the regenerated corpus."""
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: ("BENCH_rTEST.json",
                 {"queries": {"q": 1.0}, "data_sig": "sig-a"}),
    )
    regressed = _write(tmp_path, "cur.json", {"q": 2.0}, sig="sig-b")
    assert bc.main(["bench_check.py", regressed]) == 0
    # Legacy baseline (pre-data_sig rounds): same downgrade.
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: ("BENCH_rTEST.json", {"queries": {"q": 1.0}}),
    )
    assert bc.main(["bench_check.py", regressed]) == 0


def test_unreadable_saved_file_is_usage_error(tmp_path):
    assert bc.main(["bench_check.py", str(tmp_path / "missing.json")]) == 2


def _write_baseline(root, name, queries, sig):
    body = {"queries": queries}
    if sig is not None:
        body["data_sig"] = sig
    (root / name).write_text(json.dumps(body))


def test_baseline_prefers_same_sig_local(tmp_path):
    """VERDICT r11 Next #1: the driver's BENCH_r*.json is always
    cross-data by gating time (testdata regenerates each round), so the
    per-round BENCH_LOCAL_r*.json with a MATCHING data_sig must win even
    against a higher-round driver baseline."""
    _write_baseline(tmp_path, "BENCH_LOCAL_r12.json", {"q": 1.0}, "sig-fresh")
    _write_baseline(tmp_path, "BENCH_r13.json", {"q": 9.0}, "sig-stale")
    name, data = bc.latest_committed_bench("sig-fresh", root=tmp_path)
    assert name == "BENCH_LOCAL_r12.json"
    assert data["queries"]["q"] == 1.0
    # No same-sig candidate -> newest overall (cross-data fallback).
    name, data = bc.latest_committed_bench("sig-other", root=tmp_path)
    assert name == "BENCH_r13.json"
    # Same round number: LOCAL sorts after the driver file (newer data).
    _write_baseline(tmp_path, "BENCH_r12.json", {"q": 5.0}, "sig-fresh")
    name, _ = bc.latest_committed_bench("sig-fresh", root=tmp_path)
    assert name == "BENCH_LOCAL_r12.json"


def test_planted_regression_hard_fails_with_same_sig_baseline(
    monkeypatch, tmp_path
):
    """The gate is HARD again when a same-data baseline exists: a
    deliberately planted 2x regression on the same data_sig must exit 1
    (not the DATA-CHANGED informational pass)."""
    _write_baseline(tmp_path, "BENCH_LOCAL_r12.json", {"q": 1.0}, "sig-a")
    monkeypatch.setattr(bc, "ROOT", tmp_path)
    planted = _write(tmp_path, "cur.json", {"q": 2.0}, sig="sig-a")
    assert bc.main(["bench_check.py", planted]) == 1
    # Identical plant on DIFFERENT data stays informational.
    planted_x = _write(tmp_path, "cur_x.json", {"q": 2.0}, sig="sig-b")
    assert bc.main(["bench_check.py", planted_x]) == 0


def test_machine_drift_correction(monkeypatch, tmp_path):
    """Round-12 close: identical code + identical corpus measured
    1.5-2x slower after hours of shared-host drift (worktree-bisected)
    — a broad false FAIL. With calibration stamped on both sides, the
    gate scales the baseline by the machine-speed ratio: uniform drift
    passes, while a REAL regression riding on top of the drift still
    fails."""
    base = {
        "queries": {"a": 1.0, "b": 2.0},
        "data_sig": "sig-a",
        "calib_sec": 0.5,
    }
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda sig=None: ("B.json", base)
    )
    # Uniform 1.8x slowdown, calibration agrees -> not a regression.
    drifted = _write(tmp_path, "d.json", {"a": 1.8, "b": 3.6})
    body = json.loads(open(drifted).read())
    body["calib_sec"] = 0.9
    open(drifted, "w").write(json.dumps(body))
    assert bc.main(["bench_check.py", drifted]) == 0
    # Query 'a' regressed 3.6x while the machine drifted only 1.8x ->
    # still 2x against the corrected baseline: FAIL.
    mixed = _write(tmp_path, "m.json", {"a": 3.6, "b": 3.6})
    body = json.loads(open(mixed).read())
    body["calib_sec"] = 0.9
    open(mixed, "w").write(json.dumps(body))
    assert bc.main(["bench_check.py", mixed]) == 1
    # Clamp: a corrupt probe (100x) cannot disarm the gate past 4x.
    assert bc.drift_factor({"calib_sec": 50.0}, {"calib_sec": 0.5}) == 4.0
    # Pre-probe baselines: no correction.
    assert bc.drift_factor({"calib_sec": 0.9}, {"queries": {}}) == 1.0


def test_calibration_probe_executes(spark):
    """EXECUTE bench.py's machine-speed probe on a real session — the
    round-12 probe (`sum(xxhash64(id))`, no reduction) passed every
    unit test yet crashed the entire driver bench with
    ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode, because no
    test ever ran the expression. Small range keeps this fast; the
    expression shape (hash + modulus + sum) is identical to the 64M
    production probe, so an ANSI-illegal edit fails here first."""
    import bench

    calib = bench.calibration_probe(spark, rows=1_000_000, reps=1)
    assert calib > 0.0


def test_calibration_probe_survives_ansi_on(spark):
    """The probe must be legal under ANSI mode specifically (Spark 4
    default; the driver's session does not disable it)."""
    import bench

    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        calib = bench.calibration_probe(spark, rows=1_000_000, reps=1)
        assert calib > 0.0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_drift_prefers_cpu_probe_over_spark_probe():
    """ADVICE r12: an engine regression that slows the Spark probe must
    not feed back into its own correction — when both probes span the
    runs, the pure-CPU ratio is the one applied."""
    baseline = {"calib_sec": 1.0, "cpu_calib_sec": 1.0}
    # Spark probe says 2x slower (engine regression); CPU says steady.
    current = {"calib_sec": 2.0, "cpu_calib_sec": 1.0}
    assert bc.drift_factor(current, baseline) == 1.0
    # Fallback: no cpu probe on either side -> spark probe still used.
    assert bc.drift_factor({"calib_sec": 2.0}, {"calib_sec": 1.0}) == 2.0
    # Neither probe -> no correction.
    assert bc.drift_factor({}, {}) == 1.0


def test_drift_diagnostics_warn_on_large_and_disagreeing_drift():
    baseline = {"calib_sec": 1.0, "cpu_calib_sec": 1.0}
    # Probe disagreement (spark 2x, cpu 1x) -> engine-drift warning.
    warns = bc.drift_diagnostics(
        {"calib_sec": 2.0, "cpu_calib_sec": 1.0}, baseline
    )
    assert any("ENGINE" in w for w in warns)
    # Large genuine drift (both probes 2x) -> loud rescale warning.
    warns = bc.drift_diagnostics(
        {"calib_sec": 2.0, "cpu_calib_sec": 2.0}, baseline
    )
    assert any("rescaled" in w for w in warns)
    # Quiet case: modest agreeing drift -> no warnings.
    assert (
        bc.drift_diagnostics(
            {"calib_sec": 1.2, "cpu_calib_sec": 1.2}, baseline
        )
        == []
    )


def test_cpu_calibration_probe_executes():
    import bench

    c = bench.cpu_calibration_probe(elems=1_000_000, rounds=1, reps=1)
    assert c > 0.0


def test_live_run_on_fresh_sig_adopts_baseline(monkeypatch, tmp_path):
    """VERDICT r12 stretch #9: a LIVE run on a corpus with no committed
    same-sig baseline must write BENCH_LOCAL_r<N>.json itself (the
    round-start ritual as code) — and the file must gate the next run."""
    from pathlib import Path

    monkeypatch.setattr(bc, "ROOT", Path(tmp_path))
    # Round artifacts on disk say the last driver round was 41.
    (tmp_path / "CORRECTNESS_r41.json").write_text("{}")
    fresh = {"queries": {"q": 1.0}, "data_sig": "sig-new", "value": 1.0}
    monkeypatch.setattr(bc, "run_bench", lambda: fresh)
    # Cross-data: committed baseline has a different sig.
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: (
            "BENCH_rTEST.json",
            {"queries": {"q": 0.3}, "data_sig": "sig-old"},
        ),
    )
    assert bc.main(["bench_check.py"]) == 0
    adopted = tmp_path / "BENCH_LOCAL_r42.json"
    assert adopted.exists()
    assert json.loads(adopted.read_text())["data_sig"] == "sig-new"

    # No committed baseline at all: same adoption.
    adopted.unlink()
    monkeypatch.setattr(bc, "latest_committed_bench", lambda sig=None: None)
    assert bc.main(["bench_check.py"]) == 0
    assert adopted.exists()

    # A SAVED run must never write baselines (unknown concurrent load).
    adopted.unlink()
    saved = _write(tmp_path, "cur.json", {"q": 1.0}, sig="sig-new")
    assert bc.main(["bench_check.py", saved]) == 0
    assert not adopted.exists()


def test_host_unmeasurable_passes_informationally(monkeypatch, capsys):
    """Round-13 field event: the shared host ran 6-12x slower than the
    baseline window for over an hour. Beyond the drift clamp no timing
    conclusion is valid — the gate must say so and pass, not hard-fail
    every commit with false regressions."""
    base = {
        "queries": {"q": 1.0},
        "data_sig": "sig-a",
        "cpu_calib_sec": 0.65,
    }
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: ("BENCH_rTEST.json", base),
    )
    # 8x CPU drift, query 'regressed' 5x — all contention.
    cur = {
        "queries": {"q": 5.0},
        "data_sig": "sig-a",
        "cpu_calib_sec": 5.2,
    }
    monkeypatch.setattr(bc, "run_bench", lambda: cur)
    assert bc.main(["bench_check.py"]) == 0
    out = capsys.readouterr().out
    assert "HOST-UNMEASURABLE" in out
    # Below the clamp the gate stays hard: same data, confirmed 5x at
    # only 2x drift fails.
    cur2 = {
        "queries": {"q": 5.0},
        "data_sig": "sig-a",
        "cpu_calib_sec": 1.3,
    }
    monkeypatch.setattr(bc, "run_bench", lambda: cur2)
    assert bc.main(["bench_check.py"]) == 1


def test_adopt_refuses_to_clobber_existing_round_baseline(
    monkeypatch, tmp_path, capsys
):
    """Review r13: a live run against a foreign sf_dir (sf0.01 smoke, a
    stress corpus) must never overwrite the round-start baseline — the
    hard gate for the default corpus would silently die for the round."""
    from pathlib import Path

    monkeypatch.setattr(bc, "ROOT", Path(tmp_path))
    (tmp_path / "CORRECTNESS_r41.json").write_text("{}")
    good = {"queries": {"q": 1.0}, "data_sig": "sig-round", "sf": 0.1}
    (tmp_path / "BENCH_LOCAL_r42.json").write_text(json.dumps(good))
    foreign = {"queries": {"q": 0.1}, "data_sig": "sig-foreign", "sf": 0.01}
    monkeypatch.setattr(bc, "run_bench", lambda: foreign)
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: ("BENCH_LOCAL_r42.json", good),
    )
    assert bc.main(["bench_check.py"]) == 0
    assert "NOT adopting" in capsys.readouterr().out
    assert (
        json.loads((tmp_path / "BENCH_LOCAL_r42.json").read_text())[
            "data_sig"
        ]
        == "sig-round"
    )


def test_unmeasurable_host_never_adopts_baseline(monkeypatch, tmp_path, capsys):
    """Review r13: a fresh-sig run during a >4x-slow host window must
    NOT become the round's hard baseline — the cpu probe is data-
    independent, so the cross-data comparison is valid and checked
    BEFORE adoption."""
    from pathlib import Path

    monkeypatch.setattr(bc, "ROOT", Path(tmp_path))
    (tmp_path / "CORRECTNESS_r41.json").write_text("{}")
    old = {
        "queries": {"q": 1.0},
        "data_sig": "sig-old",
        "cpu_calib_sec": 0.65,
    }
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda sig=None: ("BENCH_rTEST.json", old),
    )
    inflated = {
        "queries": {"q": 6.0},
        "data_sig": "sig-new",
        "cpu_calib_sec": 5.0,  # ~7.7x the old probe: unmeasurable
    }
    monkeypatch.setattr(bc, "run_bench", lambda: inflated)
    assert bc.main(["bench_check.py"]) == 0
    out = capsys.readouterr().out
    assert "HOST-UNMEASURABLE" in out and "NOT adopted" in out
    assert not (tmp_path / "BENCH_LOCAL_r42.json").exists()


def test_probe_disagreement_faster_engine_is_a_note_not_alarm():
    baseline = {"calib_sec": 1.0, "cpu_calib_sec": 1.0}
    warns = bc.drift_diagnostics(
        {"calib_sec": 0.5, "cpu_calib_sec": 1.0}, baseline
    )
    assert any("faster" in w for w in warns)
    assert not any("investigate before shipping" in w for w in warns)


def test_parse_bench_stdout_skips_trailing_summary_line():
    """Round-14: bench.py prints the full per-query map THEN a compact
    summary (the driver archives only a bounded stdout tail, which
    front-truncated r13's full line). The gate must keep reading the
    MAP, not the summary."""
    full = {"metric": "headline_queries_total", "value": 2.0,
            "queries": {"q": 2.0}, "data_sig": "s"}
    summary = {"metric": "headline_summary", "value": 2.0,
               "n_queries": 1, "data_sig": "s", "queries_md5": "ab"}
    out = "some spark log noise\n%s\n%s\n" % (
        json.dumps(full), json.dumps(summary))
    assert bc.parse_bench_stdout(out) == full
    # Summary-only stdout (full line lost entirely) is a loud error,
    # not a silent gate against an empty map.
    import pytest
    with pytest.raises(RuntimeError):
        bc.parse_bench_stdout(json.dumps(summary) + "\n")


def test_bench_stdout_ends_with_compact_summary_line():
    """The LAST stdout line bench.py emits must be short, complete and
    parseable (what survives the driver's tail truncation), and must
    carry the self-contained record: totals + both probes + data_sig +
    a checksum of the per-query map."""
    import io
    import re
    from contextlib import redirect_stdout
    from pathlib import Path

    src = Path(bc.ROOT / "bench.py").read_text()
    # Structural check (running main() costs a full 65-query bench):
    # the summary print is the final print before spark.stop().
    m = re.search(r"print\(json\.dumps\(summary\)\)\s*\n\s*spark\.stop\(\)", src)
    assert m, "compact summary line must be the last thing printed"
    for field in ("n_queries", "queries_md5", "cpu_calib_sec", "data_sig"):
        assert f'"{field}"' in src


def test_fresh_sig_adoption_refused_in_drifted_window(
    monkeypatch, tmp_path, capsys
):
    """ADVICE r13: adopting a baseline while the pure-CPU probe reads
    1.5-4x off the committed baseline would arm the round's hard gate
    mis-scaled (loose after a slow window, tight after a fast one).
    Defer adoption; a later near-nominal run adopts instead."""
    from pathlib import Path

    monkeypatch.setattr(bc, "ROOT", Path(tmp_path))
    (tmp_path / "CORRECTNESS_r41.json").write_text("{}")
    base = {"queries": {"q": 0.5}, "data_sig": "sig-old",
            "cpu_calib_sec": 1.0}
    monkeypatch.setattr(
        bc, "latest_committed_bench",
        lambda sig=None: ("BENCH_rTEST.json", base),
    )
    adopted = tmp_path / "BENCH_LOCAL_r42.json"

    # Slow window: 2x the baseline probe — inside the 1.5-4x trap zone.
    slow = {"queries": {"q": 1.0}, "data_sig": "sig-new",
            "cpu_calib_sec": 2.0}
    monkeypatch.setattr(bc, "run_bench", lambda: slow)
    assert bc.main(["bench_check.py"]) == 0
    assert not adopted.exists()
    assert "NOT adopting" in capsys.readouterr().out

    # Fast window (probe 0.5x): symmetric refusal — a deflated baseline
    # gates later nominal runs ~2x TIGHT (false FAILs).
    fast = {"queries": {"q": 0.3}, "data_sig": "sig-new",
            "cpu_calib_sec": 0.5}
    monkeypatch.setattr(bc, "run_bench", lambda: fast)
    assert bc.main(["bench_check.py"]) == 0
    assert not adopted.exists()

    # Near-nominal window: adoption proceeds.
    ok = {"queries": {"q": 0.55}, "data_sig": "sig-new",
          "cpu_calib_sec": 1.1}
    monkeypatch.setattr(bc, "run_bench", lambda: ok)
    assert bc.main(["bench_check.py"]) == 0
    assert adopted.exists()
    assert json.loads(adopted.read_text())["data_sig"] == "sig-new"


def test_base_none_adoption_print_guarded(monkeypatch, tmp_path, capsys):
    """ADVICE r13: when adopt_baseline refuses (pre-existing file), the
    no-baseline branch must not print a contradictory 'adopted' line
    with an empty path."""
    from pathlib import Path

    monkeypatch.setattr(bc, "ROOT", Path(tmp_path))
    (tmp_path / "CORRECTNESS_r41.json").write_text("{}")
    # Pre-existing round baseline -> adopt_baseline refuses.
    (tmp_path / "BENCH_LOCAL_r42.json").write_text("not json")
    monkeypatch.setattr(bc, "latest_committed_bench", lambda sig=None: None)
    fresh = {"queries": {"q": 1.0}, "data_sig": "sig-new"}
    monkeypatch.setattr(bc, "run_bench", lambda: fresh)
    assert bc.main(["bench_check.py"]) == 0
    out = capsys.readouterr().out
    assert "NOT adopting" in out
    assert "adopted this run" not in out
