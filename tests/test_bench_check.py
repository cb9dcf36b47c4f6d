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
        bc, "latest_committed_bench", lambda: ("BENCH_rTEST.json", base)
    )
    regressed = _write(tmp_path, "cur.json", {"q": 2.0})
    assert bc.main(["bench_check.py", regressed]) == 1
    assert bc.main(["bench_check.py", regressed, "--lenient"]) == 0
    # --strict stays accepted as an explicit no-op for saved runs.
    assert bc.main(["bench_check.py", regressed, "--strict"]) == 1


def test_saved_run_passes_clean(monkeypatch, tmp_path):
    base = {"queries": {"q": 1.0}, "data_sig": "sig-a"}
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda: ("BENCH_rTEST.json", base)
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
        lambda: ("BENCH_rTEST.json",
                 {"queries": {"q": 1.0}, "data_sig": "sig-a"}),
    )
    regressed = _write(tmp_path, "cur.json", {"q": 2.0}, sig="sig-b")
    assert bc.main(["bench_check.py", regressed]) == 0
    # Legacy baseline (pre-data_sig rounds): same downgrade.
    monkeypatch.setattr(
        bc,
        "latest_committed_bench",
        lambda: ("BENCH_rTEST.json", {"queries": {"q": 1.0}}),
    )
    assert bc.main(["bench_check.py", regressed]) == 0


def test_unreadable_saved_file_is_usage_error(tmp_path):
    assert bc.main(["bench_check.py", str(tmp_path / "missing.json")]) == 2
