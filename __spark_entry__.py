"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``newsflow.registry`` — the engine's single source of truth
for implemented queries and their DuckDB oracles. The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from newsflow import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary, SURVEY.md §7 Phase 0) on sf0.001."""
    from newsflow.ops.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return registry.oracle_sql()
