"""Hybrid quantized ANN tier (NINTH index family, VERDICT r9 stretch
#9): PQ/ADC coarse scan → SQ8 int8 refine → exact float top-k — the
FAISS ``IndexRefine`` composition (coarse index + higher-fidelity
re-scoring store), built entirely from the two persisted artifacts the
engine already maintains, so the family properties are INHERITED:
no-refit append = `pq_encode_new_vectors` (codes) + nothing for SQ8
(the scale table derives from the index side, row-local encode), and
takedown coverage = `corpus_takedown(codes_path=...)`. No new
persisted state.

Why this stage order (bytes-per-vector monotone, the 100 TB argument):

1. **PQ/ADC coarse** — the full-corpus scan touches 16 code bytes per
   vector with a broadcast query lookup table; at 100 TB this is the
   only stage that reads every row, so it runs on the smallest
   representation.
2. **SQ8 refine** — the coarse pool (``coarse`` x |queries| rows) is
   re-scored against the int8 store (64 bytes/vector, 4x smaller than
   float32, sequential-scan friendly) — fidelity between ADC's
   subspace approximation and full float, without fetching floats.
3. **Exact top-k** — raw vectors join for the ``fine`` survivors only.

Determinism: every stage reuses an already-oracled scoring discipline
(PQ's rounded partial-dot tables + rounded ADC sum; SQ8's
reconstructed-list cosine rounded at 6; exact rounded-cosine final
rank; every window tie-breaks on neighbor_id), so the whole
composition replays exactly in DuckDB — `pq_sq8_refine_oracle_sql`
composes the two tiers' CTE chains. The oracle is exact-tested in
tests/test_sim.py (Spark vs DuckDB at sf0.01) AND registered with the
query since round 11 (it shipped rows-only for exactly one round while
the driver's 50-slot window drained the r6 cohort).

Reference parity: no counterpart (the reference has no vector search);
scale-mandated extension, same mandate as the other eight families.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.registry import register
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr
from newsflow.sim.pq import (
    PQ_DSUB,
    PQ_K,
    PQ_SUBS,
    ROUND_ADC,
    ROUND_PART,
    _qtab_expr,
    _unit,
    pq_ctes_sql,
    pq_fit,
)
from newsflow.sim.sq8 import sq8_reconstructed
from newsflow.tables import load_table, spread

HYBRID_COARSE = 64  # ADC coarse pool per query (PQ tier uses 20 for k=5)
HYBRID_FINE = 20    # SQ8-refined pool handed to the exact re-rank


def pq_sq8_refine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    coarse: int = HYBRID_COARSE,
    fine: int = HYBRID_FINE,
) -> DataFrame:
    """(query_id, neighbor_id, cosine_sim) — the `knn.cosine_topk`
    output contract, computed through the three-stage refine ladder."""
    # Stage 1 — PQ/ADC coarse scan (the only full-corpus pass).
    assigned, cents = pq_fit(embeddings)
    corpus_codes = assigned.select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    qunits = _unit(queries, "query_id")
    qtab = _qtab_expr("u", cents, PQ_SUBS, PQ_DSUB, PQ_K)
    qs = F.broadcast(qunits.select("query_id", qtab.alias("qtab")))
    adc = (
        corpus_codes.join(qs, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            dround(
                F.expr(
                    f"aggregate(sequence(0, {PQ_SUBS - 1}), 0D,"
                    " (a, s) -> a + qtab[s][codes[s]])"
                ),
                ROUND_ADC,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    coarse_pool = (
        adc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= coarse)
        .select("query_id", "neighbor_id")
    )

    # Stage 2 — SQ8 refine: re-score the coarse pool on the int8 store.
    recon = sq8_reconstructed(embeddings)
    rn_corpus = recon.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("rvec"),
    ).withColumn("r_norm", norm_expr(F.col("rvec")))
    rn_q = F.broadcast(
        recon.join(
            queries.select("vec_id"), "vec_id", "left_semi"
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("rq"),
        )
        .withColumn("rq_norm", norm_expr(F.col("rq")))
    )
    refined = (
        coarse_pool.join(rn_corpus, "neighbor_id")
        .join(rn_q, "query_id")
        .withColumn(
            "rsim",
            dround(
                dot_expr(F.col("rq"), F.col("rvec"))
                / (F.col("rq_norm") * F.col("r_norm")),
                6,
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rsim"), F.asc("neighbor_id")
    )
    fine_pool = (
        refined.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= fine)
        .select("query_id", "neighbor_id")
    )

    # Stage 3 — exact float top-k over the fine pool only.
    nvecs = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("nvec"),
    ).withColumn("n_norm", norm_expr(F.col("nvec")))
    qvecs = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("qvec"),
        ).withColumn("q_norm", norm_expr(F.col("qvec")))
    )
    sims = (
        fine_pool.join(nvecs, "neighbor_id")
        .join(qvecs, "query_id")
        .withColumn(
            "sim",
            dot_expr(F.col("qvec"), F.col("nvec"))
            / (F.col("q_norm") * F.col("n_norm")),
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


def pq_sq8_refine_ctes(
    k: int = 5,
    coarse: int = HYBRID_COARSE,
    fine: int = HYBRID_FINE,
    max_query_id: int = 8,
) -> tuple[str, str]:
    """Composable DuckDB twin of the full refine ladder — the PQ
    build/ADC chain (`pq_ctes_sql`) for stage 1, the SQ8
    quantize→reconstruct relations for stage 2, raw-vector rounded
    cosine for stage 3. Returns (cte_text, final_topk_relation) so
    downstream consumers (the MaxSim re-ranker, sim/rerank.py) can
    compose the ladder as their candidate-pool source — the same
    chain-builder discipline as `beam_cte_chain`/`insert_wave_ctes`."""
    from newsflow.sim.health import _SQL_EXPLODED, _SQL_Q

    recon_cos = (
        "list_dot_product(q.re, e.re) / "
        "(sqrt(list_dot_product(q.re, q.re)) * "
        "sqrt(list_dot_product(e.re, e.re)))"
    )
    cos = (
        "list_dot_product(q.e, e.e) / "
        "(sqrt(list_dot_product(q.e, q.e)) * "
        "sqrt(list_dot_product(e.e, e.e)))"
    )
    text = f"""{pq_ctes_sql()},
    qparts AS (
      SELECT qu.vec_id AS query_id, cv.sub, cv.cluster,
             round(list_dot_product(
               qu.ue[cv.sub * {PQ_DSUB} + 1 : cv.sub * {PQ_DSUB} + {PQ_DSUB}],
               cv.cvec) + 1e-9, {ROUND_PART}) + 0.0 AS part
      FROM pu qu, pcvecs cv
      WHERE qu.vec_id < {max_query_id}
    ),
    adc AS (
      SELECT qp.query_id, a.vec_id AS neighbor_id,
             round(list_sum(list(qp.part ORDER BY qp.sub)) + 1e-9,
                   {ROUND_ADC}) + 0.0 AS score
      FROM pa1 a JOIN qparts qp
        ON qp.sub = a.sub AND qp.cluster = a.cluster
      WHERE a.vec_id <> qp.query_id
      GROUP BY 1, 2
    ),
    coarse_pool AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM adc
      ) WHERE rn <= {coarse}
    ),
    ex AS ({_SQL_EXPLODED}),
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
    fine_pool AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY (round({recon_cos} + 1e-9, 6) + 0.0) DESC,
                          c.neighbor_id
               ) AS rn
        FROM coarse_pool c
        JOIN recon q ON q.vec_id = c.query_id
        JOIN recon e ON e.vec_id = c.neighbor_id
      ) WHERE rn <= {fine}
    ),
    hsims AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS sim
      FROM fine_pool c
      JOIN pv q ON q.vec_id = c.query_id
      JOIN pv e ON e.vec_id = c.neighbor_id
    ),
    hybrid_topk AS (
      SELECT query_id, neighbor_id,
             (round(sim + 1e-9, 6) + 0.0) AS cosine_sim
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id
          ORDER BY (round(sim + 1e-9, 6) + 0.0) DESC, neighbor_id
        ) AS rn FROM hsims
      ) WHERE rn <= {k}
    )"""
    return text, "hybrid_topk"


def pq_sq8_refine_oracle_sql(
    k: int = 5,
    coarse: int = HYBRID_COARSE,
    fine: int = HYBRID_FINE,
    max_query_id: int = 8,
) -> str:
    """Exact DuckDB twin of the registered hybrid query — the composed
    `pq_sq8_refine_ctes` chain with its top-k projected out. Registered
    with the query since round 11; also exact-tested in tests/test_sim.py."""
    ctes, rel = pq_sq8_refine_ctes(
        k=k, coarse=coarse, fine=fine, max_query_id=max_query_id
    )
    return f"""
    WITH {ctes}
    SELECT query_id, neighbor_id, cosine_sim FROM {rel}
    """


@register(
    "knn_cosine_pq_sq8_refine",
    # Registered round 11 (deferred one round for the r10 window
    # budget): the exact DuckDB twin of the full refine ladder, also
    # asserted locally in tests/test_sim.py at sf0.01.
    oracle=pq_sq8_refine_oracle_sql(),
    tags=("similarity", "pq", "sq8", "hybrid"),
)
def knn_cosine_pq_sq8_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid refine-ladder ANN (ninth family): PQ/ADC coarse scan
    (16 B/vector, the only full-corpus pass) → SQ8 int8 refine of the
    {HYBRID_COARSE}-candidate pool → exact float top-5 of the
    {HYBRID_FINE} survivors. Composes the two persisted artifacts the
    engine already appends to and takes down, so the family properties
    are inherited rather than re-implemented."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return pq_sq8_refine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
