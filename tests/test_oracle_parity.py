"""The gate rehearsal: every registered query with an oracle must match
DuckDB exactly at sf0.01 — the same scale the correctness driver uses."""

from __future__ import annotations

import pytest

from newsflow import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_parity

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
NO_ORACLE_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck_oracle, name):
    spec = SPECS[name]
    sdf = spec.build(spark, SF_ORACLE)
    assert_parity(sdf, spec.oracle, duck_oracle, name=name)


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_rows_only_query_runs(spark, name):
    """Queries without an oracle (non-SQL-expressible) must still run and
    produce a stable schema."""
    spec = SPECS[name]
    sdf = spec.build(spark, SF_ORACLE)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(SPECS)
