"""Product quantization (IVF-PQ residual-style ADC tier) — the fourth
ANN tier, completing the standard stack: exact baseline (knn.py),
sign-LSH (hyperplane.py), inverted-file (ivf.py), and now PQ
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011): split each unit vector into ``PQ_SUBS`` subspaces, learn a
``PQ_K``-codeword codebook per subspace with the SAME deterministic
unrolled-Lloyd toolkit as sim/kmeans.py, store each corpus vector as
``PQ_SUBS`` small code ids, and score queries against CODES (asymmetric
distance computation) instead of raw vectors.

Why this matters at 100 TB: the corpus-resident state drops from
64 float32 dims to 16 nibble codes per vector (64x), and ADC scoring
replaces a 64-dim dot per (query, vector) with ``PQ_SUBS`` table
lookups into a per-query lookup table of PQ_SUBS x PQ_K partial dots —
the classic memory-bandwidth-bound ANN scan. The exact re-rank touches
only the top ``ADC_CANDIDATES`` per query.

Determinism recipe (shared with sim/kmeans.py, so the WHOLE pipeline —
codebook fit, encoding, ADC scan, re-rank — has an exact DuckDB oracle):
- Unit vectors via the sequential-fold norm (bitwise-equal to DuckDB's
  list_dot_product, see sim/knn.py).
- Codebook seeds are DATA: subspace codeword c starts as vec_id c's
  subvector (c < PQ_K).
- Assignment argmin on (rounded d², codeword id); codeword means
  decimal-exact then rounded (ROUND_CENTROID); 2 unrolled iterations.
- ADC parts (query-subvector · codeword) rounded at ROUND_PART before
  the PQ_SUBS-term sequential sum, which is rounded at ROUND_ADC for
  the candidate ranking; ties resolve on neighbor_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.sim.kmeans import ROUND_CENTROID, ROUND_DIST
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr

PQ_SUBS = 16
PQ_DSUB = 4  # 64-dim embeddings / 16 subspaces
PQ_K = 16
PQ_ITERS = 2
ROUND_PART = 6
ROUND_ADC = 5
ADC_CANDIDATES = 64


def _unit(embeddings: DataFrame, id_alias: str) -> DataFrame:
    vec = as_double_array(F.col("embedding"))
    return (
        embeddings.select(F.col("vec_id").alias(id_alias), vec.alias("vec"))
        .withColumn("nrm", norm_expr(F.col("vec")))
        .select(
            id_alias,
            F.transform("vec", lambda x: x / F.col("nrm")).alias("u"),
        )
    )


def books_sql(cents: dict, n_subs: int, k: int) -> str:
    """The codebook as ONE literal 3D array constant
    (sub → codeword → dims), indexed at runtime. Keeping the codebook
    as data instead of unrolling n_subs·k codeword expressions is what
    keeps whole-stage codegen SMALL: the unrolled form generated ~256
    copies of the distance fold and Janino compilation became the
    dominant cost — a fixed ~10 s per query REGARDLESS of data size
    (measured: knn_cosine_pq 12.3 s at sf0.1 → 2.16 s after this
    rewrite; BENCH_sf1.md round-6 section, hazard #4)."""
    subs = []
    for s in range(n_subs):
        cws = [
            "array(" + ", ".join(f"{x!r}D" for x in cents[(s, c)]) + ")"
            for c in range(k)
        ]
        subs.append("array(" + ", ".join(cws) + ")")
    return "array(" + ", ".join(subs) + ")"


def _assign_codes(
    units: DataFrame,
    cents: dict,
    n_subs: int = PQ_SUBS,
    dsub: int = PQ_DSUB,
    k: int = PQ_K,
) -> DataFrame:
    """+ `codes` (one codeword id per subspace): runtime argmin over
    the literal codebook array on (rounded d², codeword id) — row-local,
    zero shuffle over the corpus, compact codegen (see `books_sql`)."""
    books = books_sql(cents, n_subs, k)
    expr = (
        f"transform(sequence(0, {n_subs - 1}), s -> "
        f"array_min(transform(sequence(0, {k - 1}), c -> "
        f"named_struct("
        f"'d', round(aggregate(zip_with("
        f"slice(u, CAST(s * {dsub} + 1 AS INT), {dsub}), {books}[s][c],"
        f" (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
        f" + 1e-09, {ROUND_DIST}) + 0.0,"
        f"'c', CAST(c AS INT)))).c)"
    )
    return units.withColumn("codes", F.expr(expr))


def subspace_fit(
    units: DataFrame,
    n_subs: int = PQ_SUBS,
    dsub: int = PQ_DSUB,
    k: int = PQ_K,
) -> tuple[DataFrame, dict]:
    """Deterministic per-subspace Lloyd fit over a (vec_id, u) frame —
    the shared engine for the PQ codebooks (16 subspaces of 4 dims),
    the IVF-PQ coarse quantizer (ONE subspace of 64 dims = plain
    unit-space k-means through the same code path), and the IVF-PQ
    residual codebooks. Returns the encoded frame (vec_id, u, codes)
    and the codebook dict {(sub, codeword): [dsub floats]}.

    Scale shape: same as sim/kmeans.py per iteration — assignment is
    row-local with literal codebooks; recomputation is one
    posexplode + groupBy(sub, codeword, dim) shuffle of
    n_subs·k·dsub decimal partial sums (map-side combined) and an
    O(1k-row) collect.

    The input frame is CACHED (MEMORY_AND_DISK, session-scoped, evicted
    by the bench harness's clearCache between runs): the fit reads it
    4+ times (seeds, per-iteration recompute, assignments, the caller's
    downstream scan), and without the materialization barrier Catalyst
    INLINES the input's expression tree into every one of the n_subs·k
    codeword-distance expressions — for IVF-PQ's residual tier that
    re-evaluates the whole coarse-quantizer argmin per codeword per
    row, measured 178 s vs ~7 s at sf1 (BENCH_sf1.md round-6 section).
    At 100 TB this cache IS the persisted index-build intermediate."""
    units = units.cache()
    seed_rows = units.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents = {
        (s, int(r["vec_id"])): list(r["u"][s * dsub : (s + 1) * dsub])
        for r in seed_rows
        for s in range(n_subs)
    }
    assigned = _assign_codes(units, cents, n_subs, dsub, k)
    for _ in range(PQ_ITERS - 1):
        dims = assigned.select(
            "codes", F.posexplode("u").alias("i", "val")
        ).select(
            (F.col("i") / dsub).cast("int").alias("sub"),
            (F.col("i") % dsub).alias("dim"),
            "val",
            "codes",
        )
        rows = (
            dims.select(
                "sub",
                "dim",
                "val",
                F.element_at("codes", F.col("sub") + 1).alias("cw"),
            )
            .groupBy("sub", "cw", "dim")
            .agg(
                dround(
                    F.sum(F.col("val").cast("decimal(28,12)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    ROUND_CENTROID,
                ).alias("val")
            )
            .collect()
        )
        new_cents = {key: list(v) for key, v in cents.items()}
        for r in rows:
            new_cents[(r["sub"], r["cw"])][r["dim"]] = r["val"]
        cents = new_cents
        assigned = _assign_codes(units, cents, n_subs, dsub, k)
    return assigned, cents


def pq_fit(embeddings: DataFrame) -> tuple[DataFrame, dict]:
    """PQ codebook fit on unit vectors (see `subspace_fit`)."""
    return subspace_fit(_unit(embeddings, "vec_id"))


def _qtab_expr(
    vec_col: str, cents: dict, n_subs: int, dsub: int, k: int
) -> F.Column:
    """Per-row ADC lookup table: n_subs × k rounded partial dots of the
    row's subvectors against the literal codebook — runtime loops over
    the 3D codebook constant (compact codegen, see `books_sql`)."""
    books = books_sql(cents, n_subs, k)
    return F.expr(
        f"transform(sequence(0, {n_subs - 1}), s -> "
        f"transform(sequence(0, {k - 1}), c -> "
        f"round(aggregate(zip_with("
        f"slice({vec_col}, CAST(s * {dsub} + 1 AS INT), {dsub}),"
        f" {books}[s][c], (x, y) -> x * y), 0D, (a, x) -> a + x)"
        f" + 1e-09, {ROUND_PART}) + 0.0))"
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    r: int = ADC_CANDIDATES,
    round_to: int = 6,
) -> DataFrame:
    """PQ/ADC approximate cosine top-k: encode the corpus, build each
    query's PQ_SUBS x PQ_K lookup table of rounded partial dots against
    the codebook literals, rank candidates by the table-sum score, and
    exact-rerank the top ``r`` per query. Output contract matches
    `knn.cosine_topk` (query_id, neighbor_id, cosine_sim).

    Scale shape: the corpus-side scan touches only (neighbor_id, codes)
    — 16 bytes of codes per vector, never the raw embeddings; the
    query side (ids + lookup tables) broadcasts; ADC scoring is a
    row-local 16-term fold; the only shuffles are the two rank-limited
    per-query windows (candidate cut and final top-k), both bounded by
    r x |queries|. The exact re-rank joins raw vectors for candidate
    rows only."""
    assigned, cents = pq_fit(embeddings)
    corpus = assigned.select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )

    qunits = _unit(queries, "query_id")
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


def subspace_ctes_sql(prefix: str, dims_rel: str, k: int) -> str:
    """The per-subspace unrolled-Lloyd chain over an EXISTING dims
    relation ``dims_rel`` (vec_id, sub, dim, val), emitting
    {prefix}c0 → {prefix}a0 → {prefix}m1 → {prefix}c1 → {prefix}a1 →
    {prefix}cvecs. Shared by the PQ codebooks, the IVF-PQ coarse
    quantizer (one 64-dim subspace = plain unit-space k-means through
    the same SQL), and the IVF-PQ residual codebooks — subspace id is a
    grouping key, so chain size is constant in subspace/codeword
    counts."""
    assert PQ_ITERS == 2, "oracle is unrolled for exactly 2 iterations"
    p = prefix

    def dist_stage(cents_rel: str) -> str:
        return f"""
  SELECT vec_id, sub, cluster FROM (
    SELECT vec_id, sub, cluster,
           row_number() OVER (
             PARTITION BY vec_id, sub ORDER BY d2, cluster
           ) AS rn
    FROM (
      SELECT d.vec_id, d.sub, c.cluster,
             round(sum((d.val - c.val) * (d.val - c.val)) + 1e-9,
                   {ROUND_DIST}) + 0.0 AS d2
      FROM {dims_rel} d JOIN {cents_rel} c
        ON c.sub = d.sub AND c.dim = d.dim
      GROUP BY 1, 2, 3
    )
  ) WHERE rn = 1
    """

    return f"""{p}c0 AS (
      SELECT vec_id AS cluster, sub, dim, val FROM {dims_rel}
      WHERE vec_id < {k}
    ),
    {p}a0 AS ({dist_stage(p + "c0")}),
    {p}m1 AS (
      SELECT a.sub, a.cluster, d.dim,
             round(cast(sum(cast(d.val AS DECIMAL(28,12))) as double)
                   / count(*) + 1e-9, {ROUND_CENTROID}) + 0.0 AS val
      FROM {p}a0 a JOIN {dims_rel} d
        ON d.vec_id = a.vec_id AND d.sub = a.sub
      GROUP BY 1, 2, 3
    ),
    {p}c1 AS (
      SELECT {p}c0.cluster, {p}c0.sub, {p}c0.dim,
             COALESCE({p}m1.val, {p}c0.val) AS val
      FROM {p}c0 LEFT JOIN {p}m1
        ON {p}m1.cluster = {p}c0.cluster AND {p}m1.sub = {p}c0.sub
       AND {p}m1.dim = {p}c0.dim
    ),
    {p}a1 AS ({dist_stage(p + "c1")}),
    {p}cvecs AS (
      SELECT sub, cluster, list(val ORDER BY dim) AS cvec
      FROM {p}c1 GROUP BY 1, 2
    )"""


def unit_dims_ctes_sql() -> str:
    """pv (raw arrays) → pu (unit arrays) → udims (subspace dims at
    the PQ_DSUB granularity) — the shared input relations."""
    return f"""pv AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    pu AS (
      SELECT vec_id,
             list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ue
      FROM pv
    ),
    udims AS (
      SELECT vec_id, CAST(i // {PQ_DSUB} AS INT) AS sub,
             i % {PQ_DSUB} AS dim, ue[i + 1] AS val
      FROM pu, UNNEST(range(len(ue))) AS t(i)
    )"""


def pq_ctes_sql() -> str:
    """The PQ build chain as a reusable WITH body (see
    `subspace_ctes_sql`; cvecs lives at ``pcvecs``)."""
    return (
        unit_dims_ctes_sql()
        + ",\n    "
        + subspace_ctes_sql("p", "udims", PQ_K)
    )


def pq_oracle_sql(
    k: int = 5, r: int = ADC_CANDIDATES, max_query_id: int = 8
) -> str:
    """Exact end-to-end PQ oracle: the build chain plus the query side —
    per-query partial-dot lookup rows against cvecs, the rounded
    sequential ADC sum over codes, the candidate cut, and the exact
    rounded-cosine re-rank. Every stage of the PQ index replayed in
    SQL; the sequential list_dot_product/list_sum orders match Spark's
    fold order, and every cross-engine float hazard is absorbed by the
    shared rounding discipline."""
    cos = (
        "list_dot_product(q.e, e.e) / "
        "(sqrt(list_dot_product(q.e, q.e)) * "
        "sqrt(list_dot_product(e.e, e.e)))"
    )
    return f"""
    WITH {pq_ctes_sql()},
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
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM adc
      ) WHERE rn <= {r}
    ),
    psims AS (
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
      ) AS rn FROM psims
    ) WHERE rn <= {k}
    """
