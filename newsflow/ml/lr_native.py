"""Natively-expressed logistic regression with an EXACT DuckDB oracle —
the iterative-ML tier the MLlib pipeline (ml/pipeline.py, rows-only:
MLlib's LBFGS internals are engine-specific) cannot oracle. Trains
one-vs-rest ``label == 0`` on the embeddings table by full-batch
gradient descent, unrolled for ``LR_ITERS`` iterations with the same
determinism toolkit as sim/kmeans.py / sim/pq.py:

- The model state (65 weights: bias + 64 dims) is O(d) DRIVER state
  collected from distributed decimal-exact gradient aggregations and
  compiled back into literal-array expressions — per iteration the
  corpus pays one row-local scoring pass and one O(d)-row shuffle of
  map-side-combined partial sums, exactly the Spark Lloyd shape.
- z = w·x is a sequential fold over the feature array against the
  literal weights — bitwise-equal to DuckDB's list_dot_product (the
  verified property from sim/knn.py), so z needs NO rounding.
- sigmoid is the only transcendental: rounded per row at
  ``ROUND_PROB`` decimals (exp differs from DuckDB in the last ulp;
  the rounding absorbs it — the retrieval.py ln discipline).
- Gradients are decimal(28,12) sums of (p - y)·x_j — aggregation-order
  independent; updated weights round at ``ROUND_WEIGHT``.

At 100 TB this IS the standard distributed GD recipe (weights
broadcast, gradients tree-aggregated); the only check-SF shortcut is
batch (not minibatch) gradients, which changes cost, not shape."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround, sql_dround
from newsflow.tables import local_df
from newsflow.sim.knn import as_double_array, dot_expr

LR_ITERS = 3
LR_RATE = 8.0
ROUND_PROB = 9
ROUND_WEIGHT = 8
N_COEF = 65  # bias + 64 embedding dims


def _xy(embeddings: DataFrame) -> DataFrame:
    """(vec_id, x = [1.0] ++ embedding, y = label==0)."""
    return embeddings.select(
        "vec_id",
        F.concat(
            F.array(F.lit(1.0)), as_double_array(F.col("embedding"))
        ).alias("x"),
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
    )


def _w_literal(w: list[float]) -> F.Column:
    return F.expr("array(" + ", ".join(f"{v!r}D" for v in w) + ")")


def _prob_col(w: list[float]) -> F.Column:
    z = dot_expr(F.col("x"), _w_literal(w))
    return dround(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), ROUND_PROB)


def lr_fit(embeddings: DataFrame) -> list[float]:
    """Unrolled full-batch GD; returns the final weight vector (the
    literal state the scoring pass and the SQL oracle's w{LR_ITERS}
    relation both derive from)."""
    return lr_fit_xy(_xy(embeddings), N_COEF)


def lr_fit_xy(
    xy: DataFrame,
    n_coef: int,
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
    l2: float = 0.0,
) -> list[float]:
    """The GD loop over ANY (x: array<double> incl. bias, y: double)
    frame — the generalized form `ml/quality_clf.py` trains its
    text-feature classifier with. Same determinism recipe as the
    embedding model (module docstring).

    ``l2`` adds ridge regularization to the gradient (the MLlib
    regParam analog the theme model mirrors): update uses
    g_j + l2 * w_j for every coefficient EXCEPT the bias (j=1), the
    MLlib convention. l2 terms are plain IEEE double ops mirrored
    verbatim in `lr_ctes_sql_for`, so the determinism contract is
    unchanged; l2=0.0 keeps the original expression exactly."""
    n = xy.count()
    w = [0.0] * n_coef
    for _ in range(iters):
        scored = xy.withColumn("p", _prob_col(w))
        # The weight update itself is computed ENGINE-side (element_at
        # against the previous literal weights, then dround) so the
        # rounding semantics are Spark's round(+1e-9) — identical to the
        # oracle's sql_dround — not Python's banker's round.
        wj_prev = F.element_at(_w_literal(w), F.col("j0") + 1)
        grad = F.col("s").cast("double") / n
        if l2:
            grad = grad + l2 * F.when(
                F.col("j0") == 0, F.lit(0.0)
            ).otherwise(wj_prev)
        rows = (
            scored.select(
                "p", "y", F.posexplode("x").alias("j0", "xj")
            )
            .groupBy("j0")
            .agg(
                F.sum(
                    ((F.col("p") - F.col("y")) * F.col("xj")).cast(
                        "decimal(28,12)"
                    )
                ).alias("s")
            )
            .select(
                "j0",
                dround(wj_prev - rate * grad, ROUND_WEIGHT).alias("wj"),
            )
            .collect()
        )
        new_w = {r["j0"]: r["wj"] for r in rows}
        w = [new_w[j] for j in range(n_coef)]
    return w


def lr_coefficients_df(embeddings: DataFrame) -> DataFrame:
    """(j, weight): the trained model, j=1 is the bias, j=2..65 the
    embedding dims (1-based to match the oracle's UNNEST indexing).
    O(d) rows materialized from driver state — the model artifact, not
    a corpus-sized result."""
    spark = embeddings.sparkSession
    w = lr_fit(embeddings)
    return local_df(
        spark, [(j + 1, w[j]) for j in range(N_COEF)],
        "j long, weight double",
    )


def lr_train_preds_df(embeddings: DataFrame) -> DataFrame:
    """(vec_id, y_true, prob): the training-set scoring pass with the
    final literal weights — row-local codegen over the corpus, the
    frame AUC/calibration audits consume."""
    w = lr_fit(embeddings)
    return _xy(embeddings).select(
        "vec_id",
        F.col("y").cast("long").alias("y_true"),
        _prob_col(w).alias("prob"),
    )


ROUND_LOSS = 7
ROUND_METRIC = 6


def _auc_rank_frames(preds: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(totals, rank_sum) of the exact tie-corrected Mann-Whitney AUC
    over a (y_true, prob) frame — shared by the train-set and held-out
    metric queries; see `lr_train_metrics_df` for the determinism and
    scale notes on the distinct-prob window."""
    g = preds.groupBy("prob").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y_true").alias("cpos"),
    )
    w = Window.orderBy("prob").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = g.withColumn(
        "cnt_less", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    rank_sum = cum.agg(
        F.sum(
            F.col("cpos")
            * (F.col("cnt_less") + (F.col("cnt") + 1) / 2.0)
        ).alias("rs")
    )
    totals = preds.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y_true").alias("npos")
    )
    return totals, rank_sum


def lr_train_metrics_df(embeddings: DataFrame) -> DataFrame:
    """One-row training metrics for the native LR: (n, auc,
    avg_log_loss) — the evaluation itself as an exactly-oracled query
    (the same move as the ANN recall evals: the METRIC is recomputed
    independently by the oracle, not asserted).

    AUC is the exact Mann-Whitney statistic with average-rank tie
    handling, computed from the DISTINCT-probability table: per rounded
    prob, (count, positives); cnt_less via a running sum ordered by
    prob; rank-sum contributions cpos·(cnt_less + (cnt+1)/2) are exact
    half-integers (< 2^53), so their sum is order-independent without
    decimal casts. The only single-partition window runs over the
    distinct-prob table, BOUNDED by the 9-dp probability key space —
    at 100 TB coarsen ROUND_PROB (or swap in the two-pass
    ops/scale.distributed_rank cumsum) to keep that table broadcast-
    sized; the corpus-side work is one groupBy(prob).

    Log-loss clamps probabilities to [1e-9, 1-1e-9] (9-dp rounding can
    saturate a sigmoid to exactly 0 or 1), rounds the per-row loss at
    {ROUND_LOSS} (the ln-ulp discipline), and takes a decimal-exact
    mean."""
    preds = lr_train_preds_df(embeddings)
    totals, rank_sum = _auc_rank_frames(preds)
    clamp = lambda c: F.greatest(  # noqa: E731
        F.least(c, F.lit(1.0 - 1e-9)), F.lit(1e-9)
    )
    ll = preds.select(
        dround(
            -(
                F.col("y_true") * F.log(clamp(F.col("prob")))
                + (1 - F.col("y_true"))
                * F.log(clamp(F.lit(1.0) - F.col("prob")))
            ),
            ROUND_LOSS,
        ).alias("l")
    ).agg(
        dround(
            F.sum(F.col("l").cast("decimal(25,10)")).cast("double")
            / F.count(F.lit(1)),
            ROUND_METRIC,
        ).alias("avg_log_loss")
    )
    auc = (
        F.col("rs") - F.col("npos") * (F.col("npos") + 1) / 2.0
    ) / (F.col("npos") * (F.col("n") - F.col("npos")))
    return (
        totals.crossJoin(rank_sum)
        .crossJoin(ll)
        .select(
            F.col("n").cast("long").alias("n"),
            dround(auc, ROUND_METRIC).alias("auc"),
            "avg_log_loss",
        )
    )


N_CALIB_BINS = 10


def lr_calibration_df(embeddings: DataFrame) -> DataFrame:
    """Reliability-diagram bins: predictions bucketed into
    {N_CALIB_BINS} equal-width probability bins, each with its count,
    decimal-exact mean predicted probability, and observed positive
    rate — the calibration audit that decides whether the model's
    scores can be used as probabilities (e.g. as DSIR-style sampling
    weights). prob = 1.0 lands in the top bin (least()).

    Scale shape: one groupBy over at most {N_CALIB_BINS} keys,
    map-side combined; corpus never shuffles."""
    preds = lr_train_preds_df(embeddings)
    bin_id = F.least(
        F.floor(F.col("prob") * N_CALIB_BINS).cast("long"),
        F.lit(N_CALIB_BINS - 1).cast("long"),
    )
    return (
        preds.withColumn("bin", bin_id)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(
                F.sum(F.col("prob").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                ROUND_METRIC,
            ).alias("mean_prob"),
            dround(
                F.sum("y_true").cast("double") / F.count(F.lit(1)),
                ROUND_METRIC,
            ).alias("frac_positive"),
        )
    )


def lr_calibration_oracle_sql() -> str:
    return f"""
    WITH {lr_ctes_sql()},
    preds AS (
      SELECT ev.vec_id, ev.y AS y_true, {_sql_sigmoid(f"w{LR_ITERS}")} AS prob
      FROM ev, w{LR_ITERS}
    )
    SELECT CAST(least(floor(prob * {N_CALIB_BINS}), {N_CALIB_BINS - 1})
                AS BIGINT) AS bin,
           count(*) AS n,
           {sql_dround(
               "CAST(sum(CAST(prob AS DECIMAL(25,10))) AS DOUBLE)"
               " / count(*)",
               ROUND_METRIC,
           )} AS mean_prob,
           {sql_dround(
               "CAST(sum(y_true) AS DOUBLE) / count(*)", ROUND_METRIC
           )} AS frac_positive
    FROM preds
    GROUP BY 1
    """


def lr_train_metrics_oracle_sql() -> str:
    clamp = "greatest(least({p}, 1.0 - 1e-9), 1e-9)"
    return f"""
    WITH {lr_ctes_sql()},
    preds AS (
      SELECT ev.vec_id, ev.y AS y_true, {_sql_sigmoid(f"w{LR_ITERS}")} AS prob
      FROM ev, w{LR_ITERS}
    ),
    g AS (
      SELECT prob, count(*) AS cnt, sum(y_true) AS cpos
      FROM preds GROUP BY prob
    ),
    cum AS (
      SELECT prob, cnt, cpos,
             coalesce(sum(cnt) OVER (
               ORDER BY prob
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cnt_less
      FROM g
    ),
    ranks AS (
      SELECT sum(cpos * (cnt_less + (cnt + 1) / 2.0)) AS rs FROM cum
    ),
    tot AS (
      SELECT count(*) AS n, sum(y_true) AS npos FROM preds
    ),
    ll AS (
      SELECT {sql_dround(
          "-(y_true * ln(" + clamp.format(p="prob") + ")"
          " + (1 - y_true) * ln(" + clamp.format(p="1.0 - prob") + "))",
          ROUND_LOSS,
      )} AS l
      FROM preds
    ),
    lls AS (
      SELECT {sql_dround(
          "CAST(sum(CAST(l AS DECIMAL(25,10))) AS DOUBLE) / count(*)",
          ROUND_METRIC,
      )} AS avg_log_loss FROM ll
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           {sql_dround(
               "(ranks.rs - tot.npos * (tot.npos + 1) / 2.0)"
               " / (tot.npos * (tot.n - tot.npos))",
               ROUND_METRIC,
           )} AS auc,
           lls.avg_log_loss
    FROM tot, ranks, lls
    """


def _sql_sigmoid(w_rel: str, x_rel: str = "ev") -> str:
    """Per-row probability vs the ``w_rel`` weight list (one row, one
    `w` DOUBLE[] column); ``x_rel`` names the feature relation (the
    sampled-teacher eval scores a relation other than the training ev)."""
    return sql_dround(
        f"1.0 / (1.0 + exp(-list_dot_product({x_rel}.x, {w_rel}.w)))",
        ROUND_PROB,
    )


_EMBED_EV_SQL = """ev AS (
      SELECT vec_id, list_prepend(1.0, embedding::DOUBLE[]) AS x,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    )"""


def lr_ctes_sql() -> str:
    """The unrolled GD chain as a WITH body: ev → w0 (zero literal) →
    p1/g1/w1 → … → w{LR_ITERS}. Weight relations are single-row
    DOUBLE[] lists (list(val ORDER BY j), the sim/pq.py cvecs trick),
    so z is the same sequential list_dot_product fold Spark computes
    against the literal arrays."""
    return lr_ctes_sql_for(_EMBED_EV_SQL, N_COEF)


def lr_ctes_sql_for(
    ev_sql: str,
    n_coef: int,
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
    l2: float = 0.0,
) -> str:
    """`lr_ctes_sql` over ANY ``ev`` relation (vec_id/x/y — x a DOUBLE[]
    with the bias prepended) — the oracle twin of `lr_fit_xy`.
    ``ev_sql`` must be a complete ``ev AS (...)`` CTE definition."""
    zeros = "[" + ", ".join(["0.0"] * n_coef) + "]"
    # Each w{i} is referenced TWICE (by p{i+1} and by w{i+1}'s update
    # expression): with default CTE inlining the chain re-evaluates
    # 2^iters times — invisible at LR_ITERS=3, a wall at the quality
    # classifier's 25 (the r6 expression-inlining lesson, DuckDB form).
    # MATERIALIZED on every weight relation (one row each) caps the
    # chain at one evaluation per level.
    parts = [
        f"""{ev_sql},
    nrows AS (SELECT count(*) AS n FROM ev),
    w0 AS MATERIALIZED (SELECT {zeros}::DOUBLE[] AS w)"""
    ]
    for i in range(1, iters + 1):
        prev = f"w{i - 1}"
        # Mirror of lr_fit_xy's update: with l2, the gradient gets
        # + l2 * w_j for every coefficient except the bias (j=1) —
        # identical op order to the Spark expression.
        grad = f"g{i}.g"
        if l2:
            grad = (
                f"(g{i}.g + {l2!r} * (CASE WHEN g{i}.j = 1 THEN 0.0 "
                f"ELSE {prev}.w[g{i}.j] END))"
            )
        parts.append(
            f"""p{i} AS (
      SELECT ev.vec_id, ev.x, ev.y, {_sql_sigmoid(prev)} AS p
      FROM ev, {prev}
    ),
    g{i} AS (
      SELECT j,
             CAST(sum(CAST((p - y) * x[j] AS DECIMAL(28,12))) AS DOUBLE)
               / (SELECT n FROM nrows) AS g
      FROM p{i}, UNNEST(range(1, {n_coef + 1})) AS u(j)
      GROUP BY j
    ),
    w{i} AS MATERIALIZED (
      SELECT list({sql_dround(f"{prev}.w[g{i}.j] - {rate!r} * {grad}",
                              ROUND_WEIGHT)}
                  ORDER BY g{i}.j) AS w
      FROM g{i}, {prev}
    )"""
        )
    return ",\n    ".join(parts)


def lr_coefficients_oracle_sql() -> str:
    return f"""
    WITH {lr_ctes_sql()}
    SELECT j, w[j] AS weight
    FROM w{LR_ITERS}, UNNEST(range(1, {N_COEF + 1})) AS u(j)
    """


def lr_train_preds_oracle_sql() -> str:
    return f"""
    WITH {lr_ctes_sql()}
    SELECT ev.vec_id, CAST(ev.y AS BIGINT) AS y_true,
           {_sql_sigmoid(f"w{LR_ITERS}")} AS prob
    FROM ev, w{LR_ITERS}
    """


# --- Held-out evaluation (M11's native twin, VERDICT r11 Next #5) ---------

_HEX = "0123456789abcdef"
# Deterministic engine-shared split: first md5 nibble of the vec_id's
# decimal string < 13 -> train (13/16 = 81.25%, the 80/20 analog of the
# MLlib randomSplit in `lr_model_metrics`, which stays the rows-only
# API-parity twin — randomSplit's partition-dependent sampling is not a
# cross-engine contract; a hash split is).
HOLDOUT_TRAIN_NIB = 13


def _is_train_sql(cast: str) -> str:
    return (
        f"(instr('{_HEX}', substr(md5(CAST(vec_id AS {cast})), 1, 1)) - 1)"
        f" < {HOLDOUT_TRAIN_NIB}"
    )


def lr_holdout_metrics_df(embeddings: DataFrame) -> DataFrame:
    """(n_train, n_test, auc): the native LR fit on the hash-split
    TRAIN slice only, scored on the held-out slice, with the exact
    tie-corrected Mann-Whitney AUC — held-out model evaluation itself
    as an exactly-oracled query (DuckDB re-runs the split, the unrolled
    GD chain over the train rows, the held-out scoring pass, and the
    rank statistic). Same scale shape as `lr_train_metrics_df`: the GD
    passes and the scoring pass are row-local codegen; the only
    single-partition window is over the distinct-prob table of the
    held-out slice."""
    xy = _xy(embeddings)
    is_train = F.expr(_is_train_sql("string"))
    # The GD loop makes LR_ITERS + 1 passes over the train slice;
    # checkpoint so the split filter and md5 run once.
    train = xy.filter(is_train).localCheckpoint(eager=True)
    w = lr_fit_xy(train, N_COEF)
    preds = xy.filter(~is_train).select(
        "vec_id",
        F.col("y").cast("long").alias("y_true"),
        _prob_col(w).alias("prob"),
    )
    totals, rank_sum = _auc_rank_frames(preds)
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    auc = (
        F.col("rs") - F.col("npos") * (F.col("npos") + 1) / 2.0
    ) / (F.col("npos") * (F.col("n") - F.col("npos")))
    return (
        n_train.crossJoin(totals)
        .crossJoin(rank_sum)
        .select(
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n").cast("long").alias("n_test"),
            dround(auc, ROUND_METRIC).alias("auc"),
        )
    )


def lr_holdout_metrics_oracle_sql() -> str:
    split = _is_train_sql("VARCHAR")
    ev_sql = f"""ev AS (
      SELECT vec_id, list_prepend(1.0, embedding::DOUBLE[]) AS x,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
      WHERE {split}
    )"""
    return f"""
    WITH {lr_ctes_sql_for(ev_sql, N_COEF)},
    evt AS (
      SELECT vec_id, list_prepend(1.0, embedding::DOUBLE[]) AS x,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
      WHERE NOT ({split})
    ),
    preds AS (
      SELECT evt.vec_id, evt.y AS y_true,
             {_sql_sigmoid(f"w{LR_ITERS}", "evt")} AS prob
      FROM evt, w{LR_ITERS}
    ),
    g AS (
      SELECT prob, count(*) AS cnt, sum(y_true) AS cpos
      FROM preds GROUP BY prob
    ),
    cum AS (
      SELECT prob, cnt, cpos,
             coalesce(sum(cnt) OVER (
               ORDER BY prob
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cnt_less
      FROM g
    ),
    ranks AS (
      SELECT sum(cpos * (cnt_less + (cnt + 1) / 2.0)) AS rs FROM cum
    ),
    tot AS (
      SELECT count(*) AS n, sum(y_true) AS npos FROM preds
    )
    SELECT CAST((SELECT n FROM nrows) AS BIGINT) AS n_train,
           CAST(tot.n AS BIGINT) AS n_test,
           {sql_dround(
               "(ranks.rs - tot.npos * (tot.npos + 1) / 2.0)"
               " / (tot.npos * (tot.n - tot.npos))",
               ROUND_METRIC,
           )} AS auc
    FROM tot, ranks
    """
