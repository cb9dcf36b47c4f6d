"""Exit-contract tests for the bench trend gate (ADVICE r4: saved-JSON
mode must keep the hard CI contract by default)."""

from __future__ import annotations

import json

import bench_check as bc


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries}))
    return str(p)


def test_flag_regressions_respects_ratio_and_floor():
    base = {"queries": {"fast": 0.10, "slow": 2.0}}
    # fast: 2x ratio but only +0.1s absolute — under the floor, ignored.
    # slow: 1.6x and +1.2s — flagged.
    cur = {"queries": {"fast": 0.20, "slow": 3.2}}
    assert bc.flag_regressions(cur, base) == ["slow"]


def test_saved_run_defaults_to_strict_exit(monkeypatch, tmp_path):
    base = {"queries": {"q": 1.0}}
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda: ("BENCH_rTEST.json", base)
    )
    regressed = _write(tmp_path, "cur.json", {"q": 2.0})
    assert bc.main(["bench_check.py", regressed]) == 1
    assert bc.main(["bench_check.py", regressed, "--lenient"]) == 0
    # --strict stays accepted as an explicit no-op for saved runs.
    assert bc.main(["bench_check.py", regressed, "--strict"]) == 1


def test_saved_run_passes_clean(monkeypatch, tmp_path):
    base = {"queries": {"q": 1.0}}
    monkeypatch.setattr(
        bc, "latest_committed_bench", lambda: ("BENCH_rTEST.json", base)
    )
    ok = _write(tmp_path, "ok.json", {"q": 1.05})
    assert bc.main(["bench_check.py", ok]) == 0


def test_unreadable_saved_file_is_usage_error(tmp_path):
    assert bc.main(["bench_check.py", str(tmp_path / "missing.json")]) == 2
