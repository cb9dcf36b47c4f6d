"""SparkSession construction with scale-oriented defaults.

The reference (`gdelt/scripts/*.py`) builds bare Glue sessions with no
tuning; the new engine enables AQE, Arrow transfer, and parquet pushdown
explicitly so the same code runs well from local[32] tests up to a
multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must be set at session-build time (static).
BUILD_CONFS: dict[str, str] = {
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("NEWSFLOW_DRIVER_MEM", "8g"),
    # Arrow self-destruct halves peak memory on large toPandas boundaries.
    "spark.sql.execution.arrow.pyspark.selfDestruct.enabled": "true",
}

# Confs that are runtime-settable SQL confs; applied defensively to any
# session we are handed (the correctness driver passes its own session).
RUNTIME_CONFS: dict[str, str] = {
    # Adaptive execution: runtime partition coalescing, skew-join splitting,
    # and join-strategy re-planning — essential at 100 TB where static
    # estimates are wrong.
    # Python DataSource filter pushdown (sources/http_datasource.py
    # implements pushFilters; Spark requires this conf once a reader does).
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the JVM↔Python boundary (toPandas / pandas_udf).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS); vanilla Spark
    # refuses it (PARQUET_TYPE_ILLEGAL — the same incompatibility the
    # reference hit, see SURVEY.md §1.2 / gdelt/scripts/
    # transform_pandas_friendly_to_spark_friendly.py:17-21). Read nanos as
    # raw longs; newsflow.tables converts to µs timestamps natively.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp rendering for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # Spark's default parquet timestamp encoding is legacy INT96, which
    # carries NO column statistics — every time-range predicate then
    # reads every row group. TIMESTAMP_MICROS is a stats-bearing int64
    # (and what every modern reader expects), making time-clustered
    # layouts (ops/layout.py) actually skippable.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent).

    ``NEWSFLOW_AQE=off`` disables adaptive execution (+ coalescing and
    skew-join splitting) for a replay run — the determinism audit knob:
    every oracled result must be identical with AQE on and off, since
    AQE re-plans but must not change semantics. The r3 review ran this
    replay by hand-editing confs; the env knob makes it repeatable:

        NEWSFLOW_AQE=off python -m pytest tests/test_oracle_parity.py
    """
    confs = dict(RUNTIME_CONFS)
    if os.environ.get("NEWSFLOW_AQE", "").lower() == "off":
        confs["spark.sql.adaptive.enabled"] = "false"
        confs["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
        confs["spark.sql.adaptive.skewJoin.enabled"] = "false"
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be fixed in some deployments; never fail the query
            # path over a tuning knob.
            pass
    return spark


def get_spark(
    app_name: str = "newsflow",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with newsflow defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback all
    cores); ``shuffle_partitions`` defaults to 2× the local parallelism —
    small enough to avoid tiny-task overhead locally, while AQE coalesces
    further at runtime. On a real cluster callers pass an explicit value
    sized to input volume.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 2 * cpus

    builder = SparkSession.builder.master(master).appName(app_name)
    confs = {
        **BUILD_CONFS,
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        **(extra_confs or {}),
    }
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
