"""Table loading over the driver-generated parquet testdata.

Explicit, fail-fast schemas (SURVEY.md §1.3: the reference infers schemas
everywhere; the new engine declares them). ``events.ts`` is stored as
parquet TIMESTAMP(NANOS), which Spark cannot read natively — we read nanos
as longs (``spark.sql.legacy.parquet.nanosAsLong``) and convert to µs
timestamps with integer arithmetic (``div`` — a float division would lose
precision above 2^53 ns).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events timestamp column.

    The driver has shipped ``events.ts`` as both TIMESTAMP(NANOS)
    (readable only via ``nanosAsLong``) and plain TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Both forms normalize
    to a µs TIMESTAMP_LTZ under the UTC session zone — identical
    instants, and the type every downstream ``unix_micros``/watermark
    path was written against.
    """
    _apply_runtime_confs_once(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = _read_with_cached_schema(spark, path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns → µs truncation, matching how DuckDB's TIMESTAMP_NS
            # compares in the oracle queries (epoch_ns(ts)//1000).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Same wall-clock µs reinterpreted as UTC instants (session
            # tz is pinned to UTC in RUNTIME_CONFS, so this is exact).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    try:
        import os as _os

        if _os.path.isfile(path):
            # Scan-size hint for `spread`: lets it estimate the scan's
            # split count from one stat call instead of forcing a full
            # physical plan via `.rdd` (~140 ms of driver time per call,
            # paid inside every benched query build). Single local files
            # only; directories/object stores fall back to the exact
            # path.
            df._newsflow_scan_bytes = _os.path.getsize(path)
    except OSError:
        pass
    return df


# Parquet SCHEMA cache, keyed by (path, size, mtime): the testdata is
# immutable within a process, and `spark.read.parquet` re-reads the
# footer to resolve the schema on every call — ~100 ms of driver time
# per benched query build (guide §1.2: per-query driver work). Schemas
# are metadata, not results: a fresh process re-reads them once, so
# nothing is precomputed across bench runs. Session-independent (file
# metadata). The size/mtime key (ADVICE r14) invalidates the entry if
# a file at the same path is rewritten in-process with a different
# schema (test fixtures); directories fall back to (path,) — their
# per-file stats aren't worth a listing here.
_PARQUET_SCHEMA_CACHE: dict[tuple, object] = {}


def _schema_cache_key(path: str) -> tuple:
    import os as _os

    try:
        st = _os.stat(path)
        return (path, st.st_size, st.st_mtime_ns)
    except OSError:
        return (path,)


def _read_with_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    key = _schema_cache_key(path)
    schema = _PARQUET_SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _PARQUET_SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _apply_runtime_confs_once(spark: SparkSession) -> None:
    """`apply_runtime_confs`, skipped when this exact session object has
    already been configured (9 py4j conf round-trips per call otherwise,
    once per load_table). Keyed on the AQE knob so an env flip between
    calls still re-applies, and guarded by a two-conf CANARY read —
    the session time zone (the conf the events-ts normalization's
    exactness depends on, see tables docstring) and parquet
    ``nanosAsLong`` (the conf the events READ depends on; ADVICE r14:
    its external drift previously failed fast only by luck of the
    error path). A drifted canary re-applies the full set; AQE/pushdown
    drift cannot change results (the determinism audit asserts that)
    so these two cover the semantic surface."""
    import os as _os

    key = _os.environ.get("NEWSFLOW_AQE", "")
    if getattr(spark, "_newsflow_confs_applied", None) == key:
        try:
            if (
                spark.conf.get("spark.sql.session.timeZone") == "UTC"
                and spark.conf.get(
                    "spark.sql.legacy.parquet.nanosAsLong"
                ).lower()
                == "true"
            ):
                return
        except Exception:
            pass
    apply_runtime_confs(spark)
    spark._newsflow_confs_applied = key


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a small-file scan across the cluster before CPU-heavy work.

    The driver testdata parquet is one row group per file, so its scan
    stage is a single task no matter how many cores exist — and any
    per-row heavy projection chained onto the scan (shingle+hash
    signatures, vector math) runs serially. Round-robin repartitioning a
    few-MB input costs one tiny shuffle and buys full-core parallelism
    for the compute stage.

    At real scale this is a no-op: 100 TB tables scan as thousands of
    splits, so ``getNumPartitions() >= target`` and the input passes
    through unchanged. Only callers whose downstream cost is dominated by
    per-row CPU should use this; scan-bound aggregations are better off
    without the extra exchange.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    hint = getattr(df, "_newsflow_scan_bytes", None)
    if hint is not None:
        # Estimate the scan's split count with Spark's own file-source
        # formula — maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, bytes / defaultParallelism)) — from one
        # stat call by load_table, instead of `.rdd`, which physically
        # plans the whole query just to read its partition count
        # (measured ~140 ms per fresh frame; guide §1.2 per-task work,
        # here per-QUERY work). Replicating the full formula (not just
        # size/maxPartitionBytes) keeps the passthrough decision aligned
        # with what Spark actually plans for mid-size files, so the
        # hinted branch agrees with the old exact check across the size
        # range. Both branches stay correct either way; only the tiny
        # round-robin exchange is at stake.
        conf = None
        try:
            conf = df.sparkSession._jsparkSession.sessionState().conf()
            max_bytes = int(conf.filesMaxPartitionBytes())
        except Exception:
            max_bytes = 128 * 1024 * 1024
        try:
            open_cost = int(conf.filesOpenCostInBytes())
        except Exception:
            open_cost = 4 * 1024 * 1024
        # bytesPerCore includes the per-file open-cost addend, exactly
        # as FilePartition computes it (ADVICE r14): one hinted file
        # here, so (bytes + openCost) / parallelism.
        split = min(
            max_bytes,
            max(open_cost, (int(hint) + open_cost) // max(1, target)),
        )
        est_parts = max(1, -(-int(hint) // max(1, split)))
        if est_parts < target:
            return df.repartition(target)
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small literal DataFrame as a JVM ``LocalRelation``, not a
    Python-RDD scan.

    ``spark.createDataFrame(list, schema)`` parks the rows in a pickled
    Python RDD (``LogicalRDD``): every downstream action launches Python
    worker tasks just to re-emit the literals, and a broadcast of such a
    frame runs a Python job first. Measured on this host (guide §4, the
    Python boundary): a 1-row marker write 4.1 s via the list path vs
    0.16 s as a LocalRelation; a count of a 300-row list frame 0.43 s vs
    0.24 s. Routing through pandas engages the Arrow conversion, which
    embeds the rows in the plan as JVM-resident literals — zero Python
    at execution, identical rows/schema/values.

    Falls back to the plain path if the Arrow conversion rejects the
    rows (exotic types) — correctness never depends on the fast path.
    CONTRACT (ADVICE r14): rows must be plain non-None literals — pandas
    silently coerces None to NaN in numeric columns, which would NOT
    raise and could diverge from the list path's NULL. Enforced below:
    any None (top-level value) routes to the plain path. Engine call
    sites all pass clean literals; the check is a cheap guard over
    small-by-contract frames.
    """
    try:
        import pandas as pd
        from pyspark.sql.types import StructType

        fields = list(StructType.fromDDL(schema))
        rows = list(rows)
        if any(v is None for row in rows for v in row):
            return spark.createDataFrame(rows, schema)
        if not rows:
            # Zero-row frame straight off a JVM Range scan — the pandas
            # conversion rejects all-object empty columns.
            return spark.range(0).selectExpr(
                *(
                    f"CAST(NULL AS {f.dataType.simpleString()})"
                    f" AS `{f.name}`"
                    for f in fields
                )
            )
        pdf = pd.DataFrame.from_records(rows, columns=[f.name for f in fields])
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql entry path
    (reference pattern: ``createOrReplaceTempView`` at
    gdelt/scripts/general_ml_and_source_sentiment_analysis.py:26)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
