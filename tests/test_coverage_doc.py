"""COVERAGE.md's headline totals must equal the live registry (VERDICT
r5 nit #4: the hand-maintained "168 registered, 157 ... oracles" line
had drifted from the actual 169/158). The doc line is now pinned to the
code: adding or removing a registered query without updating the totals
turns this test red."""

from __future__ import annotations

import re
from pathlib import Path

from newsflow import registry

ROOT = Path(__file__).resolve().parents[1]


def test_coverage_totals_match_registry():
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(
        r"current\s+totals:\s+(\d+) registered, (\d+) with exact DuckDB oracles",
        text,
    )
    assert m, "COVERAGE.md is missing the machine-checked totals line"
    documented_registered, documented_oracled = int(m.group(1)), int(m.group(2))
    specs = registry.all_specs()
    assert documented_registered == len(specs), (
        f"COVERAGE.md says {documented_registered} registered; registry has "
        f"{len(specs)} — update the totals line"
    )
    n_oracled = sum(1 for s in specs.values() if s.oracle)
    assert documented_oracled == n_oracled, (
        f"COVERAGE.md says {documented_oracled} oracled; registry has "
        f"{n_oracled} — update the totals line"
    )
