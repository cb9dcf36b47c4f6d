"""Optimized Product Quantization (OPQ) — the eighth index family,
closing the production quantizer ladder: exact / sign-LSH / MLlib LSH /
IVF / PQ / IVF-PQ / SQ8 / NSW-graph / **OPQ**.

OPQ (Ge et al., "Optimized Product Quantization for Approximate
Nearest Neighbor Search", CVPR 2013) rotates vectors before the PQ
split so quantization error spreads evenly across subspaces. The full
non-parametric form learns an arbitrary orthogonal matrix by
alternating Procrustes/SVD solves — not replayable in SQL, so it would
break this repo's exact-oracle discipline. This module implements the
PARAMETRIC simplification restricted to the permutation subgroup of
orthogonal matrices: **variance-balanced dimension allocation**. Rank
dimensions by energy (sum of squares over the unit-normalized corpus)
and deal them to the ``PQ_SUBS`` subspaces in a snake pattern, so each
subspace receives one dim per round from alternating ends of the
ranking — the classic balanced-allocation heuristic the OPQ paper's
parametric variant (eigenvalue allocation, §4) applies in PCA space,
here applied in the raw basis so the whole fit stays deterministic and
exactly DuckDB-replayable. Permutations preserve dot products, so
cosine semantics are untouched; only the SUBSPACE PARTITION of the
coordinates changes, which is exactly the degree of freedom plain PQ
(sim/pq.py — contiguous 4-dim slices in storage order) leaves on the
table when adjacent dims have correlated/unequal energy.

Scale shape: the allocation adds ONE tiny aggregate to the PQ build —
a posexplode→groupBy(dim) energy sum (64 output rows, map-side
combined) and an O(dims) collect; the permutation itself is a literal
in the encode/query expressions (row-local, zero shuffle). Everything
downstream (codebook fit, nibble-code corpus, ADC scan, exact re-rank)
is byte-for-byte the PQ machinery.

Determinism recipe (extends sim/pq.py's): per-dim energy is a
decimal-exact sum of double squares rounded at ``ROUND_ENERGY``;
ranking resolves ties on (energy DESC, dim ASC); the snake is integer
arithmetic. Both engines replay the identical ranking, so the literal
permutation Spark interpolates equals the oracle's relational one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr
from newsflow.sim.pq import (
    ADC_CANDIDATES,
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

ROUND_ENERGY = 6
N_DIMS = PQ_SUBS * PQ_DSUB
# Measured at the check SF: the permuted-basis codebooks rank true
# neighbors slightly deeper for one probe query than the straight-split
# ones (isotropic synthetic embeddings give the allocation no variance
# gradient to exploit), so the OPQ tier re-ranks a 1.5x candidate pool
# to hold the shared ANN recall floors (mean 0.95 / min 0.8 at r=96 vs
# 0.90/0.6 at PQ's 64). Still constant per query — scale-free.
OPQ_ADC_CANDIDATES = 96


def _energy_agg(rows: DataFrame, val: F.Column) -> DataFrame:
    return rows.groupBy(F.col("odim").cast("long").alias("odim")).agg(
        (
            F.round(
                F.sum((val * val).cast("decimal(28,12)")).cast("double")
                + F.lit(1e-9),
                ROUND_ENERGY,
            )
            + F.lit(0.0)
        ).alias("energy")
    )


def dim_energy(units: DataFrame) -> DataFrame:
    """Per-dimension energy of a (vec_id, u) unit frame:
    ``round(Σ val², ROUND_ENERGY)`` with a decimal-exact sum — the
    ranking key for the allocation. 64 output rows, map-side combined.

    Use this form ONLY on a MATERIALIZED frame: on the lazy `_unit`
    projection, Catalyst inlines the norm fold into the normalize
    lambda, re-evaluating it per element — a dims-factor blowup
    (measured 7.7 s vs the 1.0 s `dim_energy_raw` at sf1). Cold paths
    go through `dim_energy_raw`."""
    return _energy_agg(
        units.select(F.posexplode("u").alias("odim", "val")), F.col("val")
    )


def dim_energy_raw(embeddings: DataFrame) -> DataFrame:
    """`dim_energy` from the RAW embeddings, sidestepping the lazy-unit
    inlining hazard: the norm is a plain column in the Generate's child
    projection (evaluated once per row — projections don't collapse
    across Generate), and the per-element normalize division happens
    AFTER the explode. Bitwise-identical energies (same IEEE ops in the
    same order); 7.7 s → 1.0 s at sf1."""
    base = embeddings.select(
        as_double_array(F.col("embedding")).alias("vec")
    ).withColumn("nrm", norm_expr(F.col("vec")))
    rows = base.select("nrm", F.posexplode("vec").alias("odim", "raw"))
    return _energy_agg(rows, F.col("raw") / F.col("nrm"))


def allocation_df(embeddings: DataFrame) -> DataFrame:
    """The dimension→subspace allocation as a DataFrame
    (odim, energy, sub, slot) — fully declarative (window rank + snake
    integer arithmetic) over the raw embeddings, used by the oracled
    `opq_dim_allocation` query and mirrored literally by
    `snake_allocation`. The 64-row rank window is a deliberate
    single-partition sort over the aggregate output, not the corpus."""
    w = Window.orderBy(F.col("energy").desc(), F.col("odim").asc())
    ranked = dim_energy_raw(embeddings).withColumn(
        "p", F.row_number().over(w) - F.lit(1)
    )
    rnd = F.expr(f"p div {PQ_SUBS}")
    idx = F.col("p") % PQ_SUBS
    return ranked.select(
        "odim",
        "energy",
        F.when(rnd % 2 == 0, idx)
        .otherwise(F.lit(PQ_SUBS - 1) - idx)
        .cast("long")
        .alias("sub"),
        rnd.cast("long").alias("slot"),
    )


def snake_allocation(
    energies: list[tuple[int, float]],
    n_subs: int = PQ_SUBS,
    dsub: int = PQ_DSUB,
) -> list[int]:
    """Driver-side twin of `allocation_df`'s rank+snake (the energies
    list is the bounded 64-row collect): returns ``perm`` with
    ``perm[new_pos] = old_dim`` where ``new_pos = sub * dsub + slot``.
    Sort key (energy DESC, odim ASC) matches the SQL window exactly —
    energies are already rounded at ``ROUND_ENERGY`` so the two engines
    see identical keys."""
    order = sorted(energies, key=lambda t: (-t[1], t[0]))
    perm = [0] * (n_subs * dsub)
    for p, (odim, _) in enumerate(order):
        rnd, idx = divmod(p, n_subs)
        sub = idx if rnd % 2 == 0 else n_subs - 1 - idx
        perm[sub * dsub + rnd] = odim
    return perm


def permute_expr(perm: list[int], col: str = "u") -> F.Column:
    """Row-local array permutation from a literal index list (0-based
    Spark `[]` indexing) — zero shuffle, compact codegen."""
    lit = ", ".join(str(i) for i in perm)
    return F.expr(f"transform(array({lit}), i -> {col}[i])")


def opq_fit(embeddings: DataFrame) -> tuple[DataFrame, dict, list[int]]:
    """OPQ codebook fit: energy-ranked snake allocation, permute the
    unit vectors, then the SAME deterministic per-subspace Lloyd fit as
    plain PQ (`subspace_fit`). Returns (encoded frame over permuted
    units, codebook dict, permutation)."""
    energies = [
        (int(r["odim"]), float(r["energy"]))
        for r in dim_energy_raw(embeddings).collect()
    ]
    perm = snake_allocation(energies)
    # MATERIALIZE the unit frame BEFORE permuting: a permute gather over
    # the lazy `_unit` projection re-evaluates the normalize transform
    # (with its inlined norm fold) per gathered element when
    # subspace_fit's cache materializes — a dims²-factor blowup
    # (measured: opq_fit 30 s → ~6 s at sf1). Same storage class as
    # subspace_fit's own cache: the persisted index-build intermediate.
    units = _unit(embeddings, "vec_id").localCheckpoint(eager=True)
    permuted = units.select("vec_id", permute_expr(perm).alias("u"))
    assigned, cents = subspace_fit(permuted)
    return assigned, cents, perm


def opq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    r: int = OPQ_ADC_CANDIDATES,
    round_to: int = 6,
) -> DataFrame:
    """OPQ/ADC approximate cosine top-k — `pq_topk`'s contract
    (query_id, neighbor_id, cosine_sim) with the allocation applied to
    BOTH sides before encoding/lookup (permutations preserve dots, so
    the ADC score approximates the same cosine). The exact re-rank of
    the top ``r`` runs on RAW vectors, unchanged.

    Scale shape identical to `pq_topk`: nibble-code corpus scan,
    broadcast query lookup tables, row-local 16-term ADC fold, two
    rank-bounded windows; the allocation adds one 64-row aggregate."""
    assigned, cents, perm = opq_fit(embeddings)
    corpus = assigned.select(F.col("vec_id").alias("neighbor_id"), "codes")

    # MATERIALIZE the permuted query units (query-batch-bounded, 8 rows
    # at the check SF): the qtab expression slices `u` 16x16 times per
    # row, and a lazy permute wrapper re-inlines the nested
    # permute+normalize transform into every slice — measured 6.6 s vs
    # 0.4 s for the ADC stage at sf0.1 (the BENCH_sf1.md lazy-plan
    # re-inlining hazard, query-side instance).
    qunits = (
        _unit(queries, "query_id")
        .select("query_id", permute_expr(perm).alias("u"))
        .localCheckpoint(eager=True)
    )
    qtab = _qtab_expr("u", cents, PQ_SUBS, PQ_DSUB, PQ_K)
    qs = F.broadcast(qunits.select("query_id", qtab.alias("qtab")))

    adc = (
        corpus.join(qs, F.col("neighbor_id") != F.col("query_id"))
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


def alloc_ctes_sql() -> str:
    """energy → rank → snake allocation as reusable CTEs over ``udims``
    (emits ``oalloc``: odim, energy, sub, slot) — the relational twin
    of `allocation_df` / `snake_allocation`."""
    return f"""oenergy AS (
      SELECT CAST(sub * {PQ_DSUB} + dim AS BIGINT) AS odim,
             (round(cast(sum(cast(val * val AS DECIMAL(28,12))) as double)
                    + 1e-9, {ROUND_ENERGY}) + 0.0) AS energy
      FROM udims GROUP BY 1
    ),
    oranked AS (
      SELECT odim, energy,
             row_number() OVER (ORDER BY energy DESC, odim) - 1 AS p
      FROM oenergy
    ),
    oalloc AS (
      SELECT odim, energy,
             CAST(CASE WHEN (p // {PQ_SUBS}) % 2 = 0 THEN p % {PQ_SUBS}
                  ELSE {PQ_SUBS} - 1 - (p % {PQ_SUBS}) END AS BIGINT)
               AS sub,
             CAST(p // {PQ_SUBS} AS BIGINT) AS slot
      FROM oranked
    )"""


def opq_alloc_oracle_sql() -> str:
    """Oracle for `opq_dim_allocation`: the allocation table itself."""
    return f"""
    WITH {unit_dims_ctes_sql()},
    {alloc_ctes_sql()}
    SELECT odim, energy, sub, slot FROM oalloc
    """


def opq_ctes_sql() -> str:
    """The OPQ build chain as a reusable WITH body: shared unit dims →
    allocation → permuted dims (``oudims``) → the SAME unrolled-Lloyd
    subspace chain as PQ over the permuted basis (cvecs at
    ``ocvecs``, assignments at ``oa1``)."""
    return (
        unit_dims_ctes_sql()
        + ",\n    "
        + alloc_ctes_sql()
        + f""",
    oudims AS (
      SELECT u.vec_id, CAST(a.sub AS INT) AS sub, a.slot AS dim, u.val
      FROM udims u
      JOIN oalloc a ON a.odim = u.sub * {PQ_DSUB} + u.dim
    ),
    """
        + subspace_ctes_sql("o", "oudims", PQ_K)
    )


def opq_oracle_sql(
    k: int = 5, r: int = OPQ_ADC_CANDIDATES, max_query_id: int = 8
) -> str:
    """Exact end-to-end OPQ oracle (`pq_oracle_sql`'s structure over
    the permuted basis): allocation, permuted-basis codebook fit and
    corpus assignment, per-query partial-dot lookups from the permuted
    query subvectors, rounded sequential ADC sum, candidate cut, exact
    rounded-cosine re-rank on RAW vectors."""
    cos = (
        "list_dot_product(q.e, e.e) / "
        "(sqrt(list_dot_product(q.e, q.e)) * "
        "sqrt(list_dot_product(e.e, e.e)))"
    )
    return f"""
    WITH {opq_ctes_sql()},
    oqsub AS (
      SELECT vec_id AS query_id, sub, list(val ORDER BY dim) AS qsub
      FROM oudims WHERE vec_id < {max_query_id}
      GROUP BY 1, 2
    ),
    oqparts AS (
      SELECT qu.query_id, cv.sub, cv.cluster,
             round(list_dot_product(qu.qsub, cv.cvec) + 1e-9,
                   {ROUND_PART}) + 0.0 AS part
      FROM oqsub qu JOIN ocvecs cv ON cv.sub = qu.sub
    ),
    oadc AS (
      SELECT qp.query_id, a.vec_id AS neighbor_id,
             round(list_sum(list(qp.part ORDER BY qp.sub)) + 1e-9,
                   {ROUND_ADC}) + 0.0 AS score
      FROM oa1 a JOIN oqparts qp
        ON qp.sub = a.sub AND qp.cluster = a.cluster
      WHERE a.vec_id <> qp.query_id
      GROUP BY 1, 2
    ),
    ocand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM oadc
      ) WHERE rn <= {r}
    ),
    osims AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS sim
      FROM ocand c
      JOIN pv q ON q.vec_id = c.query_id
      JOIN pv e ON e.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           (round(sim + 1e-9, 6) + 0.0) AS cosine_sim
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY (round(sim + 1e-9, 6) + 0.0) DESC, neighbor_id
      ) AS rn FROM osims
    ) WHERE rn <= {k}
    """


def quantization_error_df(
    assigned: DataFrame, cents: dict, tier: str
) -> DataFrame:
    """Mean squared reconstruction error of a fitted product quantizer —
    the OPQ paper's objective (Ge et al. CVPR'13 eq. 1): mean over
    vectors of ||u − recon(u)||², recon = concatenation of assigned
    codewords. One row (tier, n_vectors, mse).

    Determinism recipe: per-(vec, sub, dim) squared residual in double
    (IEEE multiply/subtract, identical both engines), decimal-exact
    grand sum, one rounded division — the same unordered-decimal-sum
    discipline as every stats aggregate here, so the SQL twin is exact.
    The residual lookup is row-local against the codebook literal (the
    posexplode emits 64 rows per vector; sums are map-side combined)."""
    from newsflow.sim.pq import books_sql

    books = books_sql(cents, PQ_SUBS, PQ_K)
    terms = assigned.select(
        "vec_id", "codes", F.posexplode("u").alias("i", "val")
    ).select(
        "vec_id",
        F.expr(
            f"power(val - {books}[i div {PQ_DSUB}]"
            f"[codes[i div {PQ_DSUB}]][i % {PQ_DSUB}], 2)"
        ).alias("e2"),
    )
    return terms.agg(
        F.lit(tier).alias("tier"),
        F.count_distinct("vec_id").cast("long").alias("n_vectors"),
        (
            F.round(
                F.sum(F.col("e2").cast("decimal(28,12)")).cast("double")
                / F.count_distinct("vec_id")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("mse"),
    )


def _sql_tier_error(prefix: str, dims_rel: str, tier: str) -> str:
    """SELECT body computing one tier's (tier, n_vectors, mse) from its
    assignment (``{prefix}a1``) and centroid (``{prefix}c1``) relations
    joined back to the dims relation it was fit on."""
    return f"""
      SELECT '{tier}' AS tier,
             CAST(count(DISTINCT d.vec_id) AS BIGINT) AS n_vectors,
             (round(cast(sum(cast(power(d.val - c.val, 2)
                                  AS DECIMAL(28,12))) as double)
                    / count(DISTINCT d.vec_id) + 1e-9, 6) + 0.0) AS mse
      FROM {dims_rel} d
      JOIN {prefix}a1 a ON a.vec_id = d.vec_id AND a.sub = d.sub
      JOIN {prefix}c1 c
        ON c.sub = d.sub AND c.cluster = a.cluster AND c.dim = d.dim
    """


def opq_vs_pq_error_oracle_sql() -> str:
    """Exact oracle for `opq_quantization_error_eval`: ONE WITH block
    replaying BOTH build chains (straight-split PQ over ``udims``,
    allocation + permuted fit over ``oudims``) and computing each
    tier's reconstruction MSE."""
    return f"""
    WITH {unit_dims_ctes_sql()},
    {subspace_ctes_sql("p", "udims", PQ_K)},
    {alloc_ctes_sql()},
    oudims AS (
      SELECT u.vec_id, CAST(a.sub AS INT) AS sub, a.slot AS dim, u.val
      FROM udims u
      JOIN oalloc a ON a.odim = u.sub * {PQ_DSUB} + u.dim
    ),
    {subspace_ctes_sql("o", "oudims", PQ_K)}
    SELECT * FROM ({_sql_tier_error("p", "udims", "pq")})
    UNION ALL
    SELECT * FROM ({_sql_tier_error("o", "oudims", "opq")})
    """
