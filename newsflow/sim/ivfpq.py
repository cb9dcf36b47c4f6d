"""IVF-PQ: the residual product-quantization ANN tier (Jégou et al.
TPAMI'11 §IV) — the composition a production vector index actually
ships: a coarse quantizer splits the corpus into cells; each vector is
stored as its cell id plus PQ codes of its RESIDUAL (vector − cell
centroid); queries probe the ``n_probe`` nearest cells and score only
those cells' members by ADC over the residual codes, then exact-rerank
the top candidates.

Everything reuses sim/pq.py's parameterized toolkit, in unit space:

- Coarse quantizer = `subspace_fit` with ONE 64-dim subspace and
  ``IVFPQ_CELLS`` codewords (plain unit-space k-means through the same
  deterministic code path and the same SQL chain).
- Residual codebooks = `subspace_fit` on (u − centroid[cell]) with the
  standard 16×4-dim subspaces.
- Candidate score = round(q·c_cell + Σ_s table[s][code_s]) — the
  estimated cosine under x̂ = c + r̂; exact cosine re-rank of the top
  ``IVFPQ_CANDIDATES`` per query.

Why this beats plain PQ at 100 TB: the ADC scan touches ``n_probe /
n_cells`` of the code table instead of all of it (the cell id is the
bucketing/layout key, same as ivf.py), and residual magnitudes are
much smaller than raw vectors so the same codebook budget quantizes
them more accurately. Recall is floor-gated in
tests/test_recall_gates.py (double approximation — probe misses bound
recall, measured mean 0.9 / min 0.6 at sf0.01 with 2/8 cells)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.sim.kmeans import ROUND_DIST
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr
from newsflow.sim.pq import (
    PQ_DSUB,
    PQ_K,
    PQ_SUBS,
    ROUND_ADC,
    ROUND_PART,
    _qtab_expr,
    _unit,
    subspace_ctes_sql,
    subspace_fit,
    unit_dims_ctes_sql,
)

IVFPQ_CELLS = 8
IVFPQ_NPROBE = 2
IVFPQ_CANDIDATES = 32
EMB_DIM = PQ_SUBS * PQ_DSUB


def _carr_sql(cents: dict) -> str:
    """Literal array-of-arrays of the coarse centroids, indexable by
    the 0-based cell column."""
    cells = []
    for c in range(IVFPQ_CELLS):
        cells.append(
            "array("
            + ", ".join(f"{x!r}D" for x in cents[(0, c)])
            + ")"
        )
    return "array(" + ", ".join(cells) + ")"


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = IVFPQ_NPROBE,
    r: int = IVFPQ_CANDIDATES,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k; output contract matches
    `knn.cosine_topk`.

    Scale shape: corpus state after the build is (neighbor_id, cell,
    16 nibble codes); the probe join hits only the probed cells'
    partitions (cell = layout key); ADC is a row-local 16-term fold;
    the two rank-limited windows are bounded by r x |queries|; exact
    re-rank joins raw vectors for candidates only."""
    units = _unit(embeddings, "vec_id")
    coarse, ccents = subspace_fit(
        units, n_subs=1, dsub=EMB_DIM, k=IVFPQ_CELLS
    )
    carr = _carr_sql(ccents)
    cells = coarse.select(
        "vec_id", "u", F.element_at("codes", 1).alias("cell")
    )
    res = cells.select(
        "vec_id",
        "cell",
        F.expr(f"zip_with(u, {carr}[cell], (x, y) -> x - y)").alias("u"),
    )
    encoded, books = subspace_fit(res, PQ_SUBS, PQ_DSUB, PQ_K)
    corpus = encoded.select(
        F.col("vec_id").alias("neighbor_id"), "cell", "codes"
    )

    qunits = _unit(queries, "query_id")
    # Runtime cell ranking over the literal centroid array — compact
    # codegen (same rationale as pq.books_sql).
    probe_sorted = F.expr(
        f"array_sort(transform(sequence(0, {IVFPQ_CELLS - 1}), c -> "
        f"named_struct("
        f"'d', round(aggregate(zip_with(u, {carr}[c],"
        f" (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
        f" + 1e-09, {ROUND_DIST}) + 0.0,"
        f"'c', CAST(c AS INT))))"
    )
    probed = qunits.withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(probe_sorted, 1, n_probe), lambda s: s["c"]
            )
        ),
    )
    qres = probed.select(
        "query_id",
        "cell",
        dround(
            dot_expr(F.col("u"), F.expr(f"{carr}[cell]")), ROUND_PART
        ).alias("qc"),
        F.expr(f"zip_with(u, {carr}[cell], (x, y) -> x - y)").alias("qr"),
    )
    qtab = _qtab_expr("qr", books, PQ_SUBS, PQ_DSUB, PQ_K)
    qside = F.broadcast(
        qres.select("query_id", "cell", "qc", qtab.alias("qtab"))
    )

    adc = (
        corpus.join(qside, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            dround(
                F.col("qc")
                + F.expr(
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
    cands = (
        adc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= r)
        .select("query_id", "neighbor_id")
    )

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
        cands.join(nvecs, "neighbor_id")
        .join(qvecs, "query_id")
        .withColumn(
            "sim",
            dot_expr(F.col("qvec"), F.col("nvec"))
            / (F.col("q_norm") * F.col("n_norm")),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(dround(F.col("sim"), round_to)), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("sim"), round_to).alias("cosine_sim"),
        )
    )


def ivfpq_oracle_sql(
    k: int = 5,
    n_probe: int = IVFPQ_NPROBE,
    r: int = IVFPQ_CANDIDATES,
    max_query_id: int = 8,
) -> str:
    """Exact end-to-end IVF-PQ oracle: the coarse chain (cq*), the
    residual dims, the residual-codebook chain (rq*), the probe
    ranking, the per-(query, cell) residual lookup tables, the ADC
    scores over probed cells only, the candidate cut, and the exact
    re-rank — the full composed index replayed in SQL."""
    cos = (
        "list_dot_product(q.e, e.e) / "
        "(sqrt(list_dot_product(q.e, q.e)) * "
        "sqrt(list_dot_product(e.e, e.e)))"
    )
    return f"""
    WITH {unit_dims_ctes_sql()},
    fdims AS (
      SELECT vec_id, 0 AS sub, i AS dim, ue[i + 1] AS val
      FROM pu, UNNEST(range(len(ue))) AS t(i)
    ),
    {subspace_ctes_sql("cq", "fdims", IVFPQ_CELLS)},
    rdims AS (
      SELECT f.vec_id, CAST(f.dim // {PQ_DSUB} AS INT) AS sub,
             f.dim % {PQ_DSUB} AS dim, f.val - c.val AS val
      FROM fdims f
      JOIN cqa1 a ON a.vec_id = f.vec_id
      JOIN cqc1 c ON c.cluster = a.cluster AND c.dim = f.dim
    ),
    {subspace_ctes_sql("rq", "rdims", PQ_K)},
    probe AS (
      SELECT vec_id AS query_id, cluster AS cell FROM (
        SELECT vec_id, cluster,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY d2, cluster
               ) AS rn
        FROM (
          SELECT d.vec_id, c.cluster,
                 round(sum((d.val - c.val) * (d.val - c.val)) + 1e-9,
                       {ROUND_DIST}) + 0.0 AS d2
          FROM fdims d JOIN cqc1 c ON c.dim = d.dim
          WHERE d.vec_id < {max_query_id}
          GROUP BY 1, 2
        )
      ) WHERE rn <= {n_probe}
    ),
    qres AS (
      SELECT p.query_id, p.cell,
             round(list_dot_product(qu.ue, cv.cvec) + 1e-9,
                   {ROUND_PART}) + 0.0 AS qc,
             list_transform(range(1, len(qu.ue) + 1),
                            i -> qu.ue[i] - cv.cvec[i]) AS qr
      FROM probe p
      JOIN pu qu ON qu.vec_id = p.query_id
      JOIN cqcvecs cv ON cv.cluster = p.cell
    ),
    qparts AS (
      SELECT q.query_id, q.cell, cv.sub, cv.cluster,
             round(list_dot_product(
               q.qr[cv.sub * {PQ_DSUB} + 1 : cv.sub * {PQ_DSUB} + {PQ_DSUB}],
               cv.cvec) + 1e-9, {ROUND_PART}) + 0.0 AS part
      FROM qres q, rqcvecs cv
    ),
    adc AS (
      SELECT qp.query_id, t.vec_id AS neighbor_id,
             round(max(qr2.qc)
                   + list_sum(list(qp.part ORDER BY qp.sub)) + 1e-9,
                   {ROUND_ADC}) + 0.0 AS score
      FROM probe p
      JOIN cqa1 t ON t.cluster = p.cell
      JOIN rqa1 tc ON tc.vec_id = t.vec_id
      JOIN qparts qp ON qp.query_id = p.query_id AND qp.cell = p.cell
                    AND qp.sub = tc.sub AND qp.cluster = tc.cluster
      JOIN qres qr2 ON qr2.query_id = p.query_id AND qr2.cell = p.cell
      WHERE t.vec_id <> p.query_id
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM adc
      ) WHERE rn <= {r}
    ),
    isims AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS sim
      FROM cand c
      JOIN pv q ON q.vec_id = c.query_id
      JOIN pv e ON e.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           (round(sim + 1e-9, 6) + 0.0) AS cosine_sim
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY (round(sim + 1e-9, 6) + 0.0) DESC, neighbor_id
      ) AS rn FROM isims
    ) WHERE rn <= {k}
    """
