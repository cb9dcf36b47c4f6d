"""Plan-invariance: results must be bit-identical when the physical
plan changes shape (different shuffle partitioning → different partial-
aggregation order). This is the property that makes the decimal-sum /
epsilon-round helpers necessary — and the driver's hash gate possible."""

from __future__ import annotations

import pytest

from newsflow import registry
from tests.conftest import SF_ORACLE

SPECS = registry.all_specs()

# Float-aggregate-heavy queries where naive double sums would drift.
NAMES = [
    "pricing_summary",
    "event_type_stats",
    "gdelt_weekly_stats",
    "modality_shares_by_lang",
    "order_price_quantiles",
]


def _rows(spark, name):
    df = SPECS[name].build(spark, SF_ORACLE)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", NAMES)
def test_result_invariant_to_shuffle_partitioning(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "57")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
