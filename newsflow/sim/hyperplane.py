"""Native random-hyperplane (sign) LSH for cosine ANN — deterministic,
engine-portable, exactly oracle-able.

Charikar's SimHash-for-vectors (STOC'02): a random hyperplane h splits
the sphere; sign(v·h) bits agree for similar vectors with probability
1 − θ/π. T tables × b bits give any-table collision probability
1 − (1 − p^b)^T. Unlike the MLlib BucketedRandomProjectionLSH tier
(`sim/lsh.py`, kept as a cross-check), the hyperplanes here are a
DETERMINISTIC Rademacher (±1) matrix derived from md5 — no RNG, no
seed-dependence, identical in every engine — so the whole retrieval
pipeline has an exact DuckDB oracle rather than a recall test.

Execution shape mirrors `dedup/simhash.py`:
  codes (row-local) → per-table bucket join (AQE broadcasts the small
  query side) → FIRST-matching-table predicate instead of a pair
  distinct() → exact cosine re-rank → per-query top-k window.
Every stage is JVM expressions; the only shuffles are the bucket join
and the final top-k window on candidate pairs.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround, sql_dround
from newsflow.sim.knn import as_double_array

N_TABLES = 24
N_BITS = 4
SEED_TAG = "newsflow-hyperplane-lsh"


@lru_cache(maxsize=4)
def rademacher_planes(
    n_planes: int = N_TABLES * N_BITS, dim: int = 64, tag: str = SEED_TAG
) -> tuple[tuple[int, ...], ...]:
    """±1 hyperplane matrix from md5 bits — deterministic everywhere.

    Rademacher entries satisfy the Johnson–Lindenstrauss/sign-LSH
    requirements (Achlioptas 2003: database-friendly random projections)
    and make the projection a signed SUM — no multiplies, tiny literals.
    """
    planes = []
    for p in range(n_planes):
        bits: list[int] = []
        chunk = 0
        while len(bits) < dim:
            digest = hashlib.md5(f"{tag}:{p}:{chunk}".encode()).digest()
            for byte in digest:
                for k in range(8):
                    bits.append(1 if (byte >> k) & 1 else -1)
            chunk += 1
        planes.append(tuple(bits[:dim]))
    return tuple(planes)


def _dot_sql(vec: str, plane: tuple[int, ...]) -> str:
    lits = ",".join(f"{x}.0" for x in plane)
    return f"list_dot_product({vec}, [{lits}])"


def _dot_spark(vec: str, plane: tuple[int, ...]) -> str:
    lits = ",".join(f"{x}.0D" for x in plane)
    return (
        f"aggregate(zip_with({vec}, array({lits}), (x, y) -> x * y),"
        f" 0D, (a, x) -> a + x)"
    )


def _codes_expr(vec: str, dim: int, sql: bool) -> list[str]:
    """One b-bit bucket code per table: bit j set iff v·h_{t,b+j} > 0."""
    planes = rademacher_planes(N_TABLES * N_BITS, dim)
    dot = _dot_sql if sql else _dot_spark
    codes = []
    for t in range(N_TABLES):
        bits = [
            f"(CASE WHEN {dot(vec, planes[t * N_BITS + j])} > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(N_BITS)
        ]
        codes.append("(" + " + ".join(bits) + ")")
    return codes


def _with_codes(embeddings: DataFrame, id_alias: str, dim: int) -> DataFrame:
    vec = as_double_array(F.col("embedding"))
    base = embeddings.select(
        F.col("vec_id").alias(id_alias), vec.alias("v")
    )
    codes = _codes_expr("v", dim, sql=False)
    return base.withColumn(
        "codes", F.expr("array(" + ",".join(codes) + ")")
    )


def hyperplane_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: (query_id, neighbor_id, cosine_sim) for
    neighbors colliding with the query in ≥1 of the T sign-LSH tables,
    exact-cosine re-ranked. Deterministic: same output on any engine,
    any partitioning, any run."""
    corpus = _with_codes(embeddings, "neighbor_id", dim)
    qs = _with_codes(queries, "query_id", dim)
    tables = F.explode(
        F.sequence(F.lit(0), F.lit(N_TABLES - 1))
    ).alias("t")
    c = corpus.select("neighbor_id", "v", "codes", tables).withColumn(
        "code", F.expr("codes[t]")
    )
    q = qs.select(
        F.col("query_id"),
        F.col("v").alias("qv"),
        F.col("codes").alias("qcodes"),
        tables,
    ).withColumn("code", F.expr("qcodes[t]"))
    pairs = (
        c.join(q, ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # FIRST matching table only — row-local pair dedup, no distinct.
        .filter(
            F.expr(
                f"filter(sequence(0, {N_TABLES - 1}),"
                f" i -> codes[i] = qcodes[i])[0] = t"
            )
        )
    )
    dot = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    )
    nrm = "aggregate(zip_with({0}, {0}, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    sim = dot / (
        F.sqrt(F.expr(nrm.format("v"))) * F.sqrt(F.expr(nrm.format("qv")))
    )
    # Rank by the ROUNDED similarity so ties below float noise resolve
    # identically in Spark and the oracle (see knn.cosine_topk).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(dround(F.col("sim"), round_to)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("sim"), round_to).alias("cosine_sim"),
        )
    )


def hyperplane_topk_oracle_sql(
    k: int = 5, dim: int = 64, max_query_id: int = 8, round_to: int = 6
) -> str:
    """DuckDB twin of hyperplane_topk over the embeddings view — the
    SAME md5-derived ±1 planes as SQL literals, the same first-table
    dedup, the same re-rank. (±1 entries mean the per-element products
    are exact; only the summation order can differ between engines, and
    a sign flip would need |v·h| at float-noise scale — absent on this
    data, as oracle parity proves.)"""
    codes = _codes_expr("e", dim, sql=True)
    code_arr = "[" + ", ".join(codes) + "]"
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), coded AS (
      SELECT vec_id, e, {code_arr} AS codes FROM v
    ), q AS (
      SELECT vec_id AS query_id, e AS qe, codes AS qcodes
      FROM coded WHERE vec_id < {max_query_id}
    ), pairs AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, c.e, q.qe
      FROM coded c
      JOIN q ON c.vec_id <> q.query_id
      CROSS JOIN UNNEST(range({N_TABLES})) AS u(t)
      WHERE c.codes[t + 1] = q.qcodes[t + 1]
        AND list_filter(range({N_TABLES}),
                        i -> c.codes[i + 1] = q.qcodes[i + 1])[1] = t
    ), sims AS (
      SELECT query_id, neighbor_id,
             list_dot_product(e, qe)
               / (sqrt(list_dot_product(e, e))
                  * sqrt(list_dot_product(qe, qe))) AS sim
      FROM pairs
    )
    SELECT query_id, neighbor_id,
           {sql_dround("sim", round_to)} AS cosine_sim
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY {sql_dround("sim", round_to)} DESC, neighbor_id
      ) AS rn FROM sims
    ) WHERE rn <= {k}
    """
