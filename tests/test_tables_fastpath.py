"""Driver-side fast paths in `newsflow.tables` (r14 optimization):
schema cache, one-shot runtime confs, and spread's stat-based split
estimate must not change what any query sees."""

from __future__ import annotations

import pytest

from newsflow import tables
from newsflow.tables import TABLES, load_table, spread
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", TABLES)
def test_cached_schema_matches_direct_read(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    # Second load hits the cache; schema must equal a raw re-read's
    # (post events-normalization both go through the same branch).
    again = load_table(spark, SF_SMOKE, name)
    assert df.schema == again.schema
    if name == "events":
        assert dict(df.dtypes)["ts"] == "timestamp"


def test_spread_hint_repartitions_small_scan(spark):
    df = load_table(spark, SF_SMOKE, "documents")
    assert getattr(df, "_newsflow_scan_bytes", None)
    target = spark.sparkContext.defaultParallelism
    assert spread(df).rdd.getNumPartitions() >= min(2, target)


def test_spread_hint_passthrough_on_large_estimate(spark):
    # A hint far above maxPartitionBytes estimates >= target splits and
    # must leave the frame untouched (the 100 TB no-op contract).
    df = load_table(spark, SF_SMOKE, "documents")
    df._newsflow_scan_bytes = 1 << 40
    assert spread(df) is df


def test_spread_falls_back_without_hint(spark):
    df = spark.range(100)
    out = spread(df)
    assert out.rdd.getNumPartitions() >= df.rdd.getNumPartitions()


def test_spread_hint_uses_sparks_split_formula(spark):
    # Mid-size single file: Spark's file source sizes splits as
    # min(maxPartitionBytes, max(openCost, bytes/parallelism)), so a
    # 300 MB file already scans as ~parallelism splits and must pass
    # through — a naive size//maxPartitionBytes estimate would bolt a
    # full-table repartition onto it (r14 code-review finding).
    df = load_table(spark, SF_SMOKE, "documents")
    target = spark.sparkContext.defaultParallelism
    df._newsflow_scan_bytes = 300 * 1024 * 1024
    assert spread(df) is df, (
        f"300MB file should estimate >= {target} splits and pass through"
    )


def test_runtime_confs_restored_after_external_mutation(spark):
    # The defensive-apply contract (session.py): a session handed to us
    # whose semantics-critical conf was mutated between queries must be
    # re-pinned — the canary read covers it without 9 round-trips.
    tables._apply_runtime_confs_once(spark)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    tables._apply_runtime_confs_once(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_runtime_confs_reapplied_on_aqe_flip(spark, monkeypatch):
    # Pin the knob first: under a NEWSFLOW_AQE=off determinism-audit
    # run the session starts with adaptive off, and this test's
    # baseline assumes the default-on state.
    monkeypatch.setenv("NEWSFLOW_AQE", "")
    tables._apply_runtime_confs_once(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    monkeypatch.setenv("NEWSFLOW_AQE", "off")
    tables._apply_runtime_confs_once(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    monkeypatch.delenv("NEWSFLOW_AQE")
    tables._apply_runtime_confs_once(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
