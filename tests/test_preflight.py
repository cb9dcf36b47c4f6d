"""Contract tests for scripts/preflight.py's --fast refusal: a commit
that edits the bench harness must not be able to skip executing it
(round-12 lesson — an untested bench.py probe shipped via --fast and
crashed the entire driver bench, BENCH_r12.json rc=1)."""

from __future__ import annotations

import importlib.util
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def preflight():
    spec = importlib.util.spec_from_file_location(
        "preflight", os.path.join(ROOT, "scripts", "preflight.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fast_refused_when_bench_harness_dirty(preflight, monkeypatch):
    """--fast + dirty bench.py must fall through to the bench smoke and
    trend gate (fast downgraded to full)."""
    calls = []
    monkeypatch.setattr(preflight, "bench_harness_dirty", lambda: True)
    monkeypatch.setattr(preflight, "artifacts_committed", lambda: calls.append("artifacts"))
    monkeypatch.setattr(preflight, "contract", lambda: calls.append("contract"))
    monkeypatch.setattr(preflight, "bench_smoke", lambda: calls.append("smoke"))
    monkeypatch.setattr(
        preflight, "stage", lambda name, argv: calls.append(name.split()[0])
    )
    monkeypatch.setattr(preflight.sys, "argv", ["preflight.py", "--fast"])
    preflight.main()
    assert "smoke" in calls, "bench smoke skipped despite dirty harness"
    assert "bench" in calls, "trend gate skipped despite dirty harness"


def test_fast_skips_trend_gate_but_never_the_smoke(preflight, monkeypatch):
    """--fast with a clean harness skips the expensive trend gate — but
    the bench smoke runs UNCONDITIONALLY (review r13: the dirty check
    sees only the working tree, so a committed-then-preflighted bench
    edit would otherwise skip the probe exactly like the r12 failure)."""
    calls = []
    monkeypatch.setattr(preflight, "bench_harness_dirty", lambda: False)
    monkeypatch.setattr(preflight, "artifacts_committed", lambda: calls.append("artifacts"))
    monkeypatch.setattr(preflight, "contract", lambda: calls.append("contract"))
    monkeypatch.setattr(preflight, "bench_smoke", lambda: calls.append("smoke"))
    monkeypatch.setattr(
        preflight, "stage", lambda name, argv: calls.append(name.split()[0])
    )
    monkeypatch.setattr(preflight.sys, "argv", ["preflight.py", "--fast"])
    preflight.main()
    assert "smoke" in calls
    assert "bench" not in calls
    assert "oracle" in calls


def test_dirty_detection_uses_git_status(preflight):
    """bench_harness_dirty reflects actual git porcelain state for the
    two harness files — sanity that the guard is wired to git, not a
    stub (value depends on working-tree state, so only type-check)."""
    assert isinstance(preflight.bench_harness_dirty(), bool)
