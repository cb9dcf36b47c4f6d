"""Embedding-corpus health and maintenance operators: per-dimension
feature statistics, int8 scalar-quantization error, and per-label norm
profiles.

A 100 TB training pipeline that stores an ``array<float>`` embedding
column needs these before any ANN/dedup stage is trusted: dead or
low-variance dimensions (dim stats), quantization feasibility for the
vector store (int8 error), and norm drift per label/shard (norm
profile). All three are pure JVM expression plans.

Determinism notes: every formula here is built from IEEE-exact
operations only (+, -, *, /, sqrt, floor, min/max, comparisons), which
both engines round identically bit-for-bit — unlike ln/exp there is no
transcendental ulp drift, so only SUMMATION ORDER needs neutralizing,
which the decimal-cast sum does. float32 → double widening is exact.

Scale shape: posexplode multiplies rows by the (fixed, small) dimension
count but stays a row-local projection; the only shuffles are groupBy
dim (cardinality = n_dims → tiny) or groupBy vec_id (pre-aggregated
map-side). The 64-row per-dim scale table broadcasts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.registry import register
from newsflow.sim.knn import as_double_array, norm_expr
from newsflow.tables import load_table, spread

# Shared exploded relation: (vec_id, dim, x) with x as exact double.
_SQL_EXPLODED = """
  SELECT vec_id, i AS dim, embedding[i + 1]::DOUBLE AS x
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
"""


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exploded_df(spread(load_table(spark, sf_dir, "embeddings")))


def exploded_df(embs: DataFrame) -> DataFrame:
    return embs.select(
        "vec_id",
        F.posexplode(as_double_array(F.col("embedding"))).alias("dim", "x"),
    )


@register(
    "embedding_dim_stats",
    oracle=f"""
    WITH ex AS ({_SQL_EXPLODED}),
    ag AS (
      SELECT dim, count(*) AS n_vecs,
             sum(CAST(x AS DECIMAL(25,12))) AS s,
             sum(CAST(x * x AS DECIMAL(25,12))) AS s2
      FROM ex GROUP BY 1
    )
    SELECT dim, CAST(n_vecs AS BIGINT) AS n_vecs,
           (round(CAST(s AS DOUBLE) / n_vecs + 1e-9, 6) + 0.0) AS mean_val,
           (round(CAST(s2 AS DOUBLE) / n_vecs
                  - (CAST(s AS DOUBLE) / n_vecs)
                    * (CAST(s AS DOUBLE) / n_vecs) + 1e-9, 6) + 0.0)
             AS var_val
    FROM ag
    """,
    tags=("similarity", "embedding", "quality"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding matrix — the dead- and
    degenerate-dimension detector run before trusting any vector index.

    One posexplode projection + one groupBy keyed on the dimension
    (cardinality = n_dims, so the shuffle output is tiny and partial
    aggregation does all the work map-side). Sums are decimal-exact so
    partition order is free; variance is computed from the exact sums
    with the shared E[x²]−E[x]² formula.
    """
    ex = _exploded(spark, sf_dir)
    ag = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("x").cast("decimal(25,12)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(25,12)")).alias("s2"),
    )
    return ag.select(
        "dim",
        "n_vecs",
        F.expr("(round(CAST(s AS DOUBLE) / n_vecs + 1e-9, 6) + 0.0)").alias(
            "mean_val"
        ),
        F.expr(
            "(round(CAST(s2 AS DOUBLE) / n_vecs"
            " - (CAST(s AS DOUBLE) / n_vecs)"
            " * (CAST(s AS DOUBLE) / n_vecs) + 1e-9, 6) + 0.0)"
        ).alias("var_val"),
    )


# Symmetric per-dimension int8 quantization: scale_d = max|x_d| / 127,
# q = clamp(floor(x/scale + 0.5), ±127). floor() types differ across
# engines (BIGINT in Spark, DOUBLE in DuckDB) but the VALUE is integral
# and all downstream arithmetic promotes to double, so results are
# bit-equal; the zero-scale (dead-dimension) case quantizes to 0 exactly.
_SQL_Q = (
    "(CASE WHEN scale > 0 THEN"
    " least(greatest(floor(x / scale + 0.5), -127.0), 127.0)"
    " ELSE 0.0 END)"
)
_SQL_ERR = f"((x - {_SQL_Q} * scale) * (x - {_SQL_Q} * scale))"


@register(
    "embedding_int8_quant_error",
    oracle=f"""
    WITH ex AS ({_SQL_EXPLODED}),
    scales AS (
      SELECT dim, max(abs(x)) / 127.0 AS scale FROM ex GROUP BY 1
    ),
    err AS (
      SELECT vec_id, {_SQL_ERR} AS e
      FROM ex JOIN scales USING (dim)
    )
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
           (round(CAST(sum(CAST(e AS DECIMAL(25,14))) AS DOUBLE)
                  / count(*) + 1e-9, 8) + 0.0) AS mse,
           (round(max(e) + 1e-9, 8) + 0.0) AS max_sq_err
    FROM err GROUP BY vec_id
    """,
    tags=("similarity", "embedding", "quality"),
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector reconstruction error of symmetric per-dimension int8
    quantization — the go/no-go measurement before shipping embeddings
    to a quantized vector store.

    The per-dim scale table is one tiny groupBy (n_dims rows) broadcast
    back; quantize + error is then a row-local projection and the
    per-vector MSE a pre-aggregated groupBy on vec_id. Every operation
    is IEEE-exact (no transcendentals), so the only cross-engine hazard
    — summation order — is closed by the decimal sum.
    """
    return int8_quant_error_df(_exploded(spark, sf_dir))


def int8_quant_error_df(ex: DataFrame) -> DataFrame:
    scales = ex.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale")
    )
    err = ex.join(F.broadcast(scales), "dim").select(
        "vec_id", F.expr(_SQL_ERR).alias("e")
    )
    return err.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.expr(
            "(round(CAST(sum(CAST(e AS DECIMAL(25,14))) AS DOUBLE)"
            " / count(*) + 1e-9, 8) + 0.0)"
        ).alias("mse"),
        F.expr("(round(max(e) + 1e-9, 8) + 0.0)").alias("max_sq_err"),
    )


_SQL_NORM = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"


@register(
    "embedding_norm_profile",
    oracle=f"""
    WITH nr AS (
      SELECT label, (round({_SQL_NORM} + 1e-9, 8) + 0.0) AS nrm
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           (round(CAST(sum(CAST(nrm AS DECIMAL(25,10))) AS DOUBLE)
                  / count(*) + 1e-9, 6) + 0.0) AS avg_norm,
           (round(min(nrm) + 1e-9, 6) + 0.0) AS min_norm,
           (round(max(nrm) + 1e-9, 6) + 0.0) AS max_norm,
           CAST(count_if(nrm < 1e-6) AS BIGINT) AS n_near_zero
    FROM nr GROUP BY label
    """,
    tags=("similarity", "embedding", "quality"),
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile (mean/min/max, near-zero count) — the
    norm-drift monitor for embedding shards; a label whose norms
    collapse or explode poisons cosine-based dedup and retrieval.

    Norm is the sequential in-array dot product both engines evaluate in
    index order (sqrt is IEEE-exact); norms are rounded row-locally,
    then one groupBy on the label with a decimal-exact mean.
    """
    embs = load_table(spark, sf_dir, "embeddings")
    nr = embs.select(
        "label",
        (
            F.round(
                norm_expr(as_double_array(F.col("embedding"))) + F.lit(1e-9), 8
            )
            + F.lit(0.0)
        ).alias("nrm"),
    )
    return nr.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr(
            "(round(CAST(sum(CAST(nrm AS DECIMAL(25,10))) AS DOUBLE)"
            " / count(*) + 1e-9, 6) + 0.0)"
        ).alias("avg_norm"),
        F.expr("(round(min(nrm) + 1e-9, 6) + 0.0)").alias("min_norm"),
        F.expr("(round(max(nrm) + 1e-9, 6) + 0.0)").alias("max_norm"),
        F.count_if(F.col("nrm") < 1e-6).alias("n_near_zero"),
    )
