"""SQ8 ANN tier: symmetric per-dimension int8 scalar quantization with
exact float re-rank — the sixth rung of the ANN ladder (exact →
sign-LSH → IVF → PQ → IVF-PQ → SQ8), VERDICT r6 stretch #9.

The production shape (FAISS ``SQ8``/ScaNN int8 stores): keep the whole
index as int8 codes (4× smaller than float32, sequential-scan friendly),
score candidates with the QUANTIZED vectors, then re-score a small
candidate pool with the full-precision vectors. Unlike PQ the
quantization here is per-DIMENSION (scale_d = max|x_d| / 127 — exactly
the quantizer `embedding_int8_quant_error` already measures), so
encoding is row-local with a 64-entry broadcast scale table: no
codebook fit, no training jobs.

Determinism recipe (all exactly oracle-able):
- quantize: q = clamp(floor(x/scale + 0.5), ±127) — integral values,
  IEEE-exact in both engines (health.py's ``_SQL_Q``);
- approximate cosine over the RECONSTRUCTED vectors (q·scale), computed
  as in-array sequential folds (bit-identical to DuckDB
  ``list_dot_product``), rounded at 6 before ranking;
- candidate pool: top-``SQ8_POOL`` per query on (rounded approx DESC,
  neighbor_id); re-rank: exact float cosine over the pool, top-k on the
  same ordering discipline.

Scale shape: the scale table is one 64-row groupBy broadcast back;
reconstruction is a row-local ``transform`` (index lambda) — the corpus
never shuffles; the approx stage is the `cosine_topk` plan (query side
broadcast, per-query top-pool window); the re-rank touches only
|queries| × pool rows joined back to the float vectors by vec_id. At
100 TB the int8 store is the column you actually scan — here the
reconstruction models its scoring exactly while the float column plays
the re-rank store.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.sim import knn
from newsflow.sim.health import exploded_df

SQ8_POOL = 20  # 4x k — the re-rank candidate pool per query

#: reconstructed value for one dimension: quantize then de-quantize.
#: `sc` is the broadcast 64-entry scale array (1-indexed element_at).
_RECON_LAMBDA = (
    "transform(embedding, (x, i) -> CASE"
    " WHEN element_at(sc, i + 1) > 0d THEN"
    "  least(greatest(floor(cast(x as double) / element_at(sc, i + 1)"
    "   + 0.5d), -127.0d), 127.0d) * element_at(sc, i + 1)"
    " ELSE 0.0d END)"
)


def sq8_reconstructed(embeddings: DataFrame) -> DataFrame:
    """(vec_id, embedding) with every vector replaced by its int8
    quantize→dequantize reconstruction — the scored form of an SQ8
    store. Scales derive from the SAME frame (the index side)."""
    ex = exploded_df(embeddings)
    scales = (
        ex.groupBy("dim")
        .agg((F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, scale))),"
                " s -> s.scale)"
            ).alias("sc")
        )
    )
    return embeddings.crossJoin(F.broadcast(scales)).select(
        "vec_id", F.expr(_RECON_LAMBDA).alias("embedding")
    )


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = SQ8_POOL,
) -> DataFrame:
    """Int8-scored candidate pool + exact re-rank, `cosine_topk` output
    schema (query_id, neighbor_id, cosine_sim)."""
    recon = sq8_reconstructed(embeddings)
    recon_q = recon.join(
        queries.select("vec_id"), "vec_id", "left_semi"
    )
    pool_df = knn.cosine_topk(recon, recon_q, k=pool).select(
        "query_id", "neighbor_id"
    )

    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        knn.as_double_array("embedding").alias("vec"),
    ).withColumn("vec_norm", knn.norm_expr(F.col("vec")))
    qs = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            knn.as_double_array("embedding").alias("qvec"),
        ).withColumn("q_norm", knn.norm_expr(F.col("qvec")))
    )
    sims = (
        pool_df.join(corpus, "neighbor_id")
        .join(qs, "query_id")
        .withColumn(
            "sim",
            knn.dot_expr(F.col("qvec"), F.col("vec"))
            / (F.col("q_norm") * F.col("vec_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(dround(F.col("sim"), 6)), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("sim"), 6).alias("cosine_sim"),
        )
    )


def sq8_topk_oracle_sql(k: int = 5, pool: int = SQ8_POOL,
                        max_query_id: int = 8) -> str:
    """DuckDB replay: same quantizer, same reconstructed-list dot
    products (list order = index order = Spark's sequential fold), same
    two-stage rounded ranking."""
    from newsflow.sim.health import _SQL_EXPLODED, _SQL_Q

    cos = (
        "list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(q.embedding::DOUBLE[],"
        " q.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(e.embedding::DOUBLE[],"
        " e.embedding::DOUBLE[])))"
    )
    recon_cos = (
        "list_dot_product(q.re, e.re) / "
        "(sqrt(list_dot_product(q.re, q.re)) * "
        "sqrt(list_dot_product(e.re, e.re)))"
    )
    return f"""
    WITH ex AS ({_SQL_EXPLODED}),
    scales AS (
      SELECT dim, max(abs(x)) / 127.0 AS scale FROM ex GROUP BY 1
    ),
    rq AS (
      SELECT vec_id, dim, {_SQL_Q} * scale AS rx
      FROM ex JOIN scales USING (dim)
    ),
    recon AS (
      SELECT vec_id, list(rx ORDER BY dim) AS re FROM rq GROUP BY vec_id
    ),
    pool AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY (round({recon_cos} + 1e-9, 6) + 0.0) DESC,
                          e.vec_id
               ) AS rn
        FROM recon q JOIN recon e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {max_query_id}
      ) WHERE rn <= {pool}
    )
    SELECT query_id, neighbor_id,
           (round(sim + 1e-9, 6) + 0.0) AS cosine_sim
    FROM (
      SELECT p.query_id, p.neighbor_id, {cos} AS sim,
             row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY (round({cos} + 1e-9, 6) + 0.0) DESC,
                        p.neighbor_id
             ) AS rn
      FROM pool p
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings e ON e.vec_id = p.neighbor_id
    ) WHERE rn <= {k}
    """
