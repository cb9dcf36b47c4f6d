"""Classifier-based quality filtering — the model-distillation stage of
a modern pretraining pipeline (FineWeb-Edu / DCLM shape): train a CHEAP
classifier to imitate an EXPENSIVE curation decision, then use the
classifier as the filter at full-corpus scale.

Here the teacher is the engine's own curation funnel (`curation.curate`:
quality gate → language gate → exact dedup → near-dup removal) and the
student is the natively-expressed logistic regression of
`ml/lr_native.py`, generalized via `lr_fit_xy`/`lr_ctes_sql_for` to a
6-coefficient model over row-local text features:

    x = [bias, min(n_tokens/100, 1), stopword_ratio, distinct_ratio,
         min(avg_token_chars/10, 1), digit_token_ratio, is_en]

Every feature is an IEEE-exact integer ratio (or a capped one / an
indicator), so the feature vector is bit-identical in both engines and
the whole train + score chain inherits the lr_native determinism
recipe (decimal gradients, rounded sigmoid/weights). The label is
funnel SURVIVAL. Feature-selection lesson measured on the way here: the
synthetic corpus's ``lang`` column is textually UNDETECTABLE (all
languages share one vocabulary), so a text-stat-only student trains to
near-chance — the language gate is irreducible noise to it. Production
quality filters run downstream of lang-ID and consume its output, so
the is_en indicator (the upstream lang-ID metadata) is a legitimate
feature; with it the student reaches recall 0.98 / accuracy 0.89
against the teacher at the check SF (asserted with floors in
tests/test_quality_clf.py). The residual gap is the dedup stages —
invisible to any row-local student, exactly the teacher/student gap a
production distillation carries.

Scale shape: the teacher runs ONCE to label a training slice (here the
check corpus; at 100 TB a sample), the labeled (x, y) frame is
checkpointed (slim: 6 doubles + label per row), and each GD iteration
costs one row-local scoring pass + an O(d)-row decimal gradient
aggregation. Scoring the full corpus with the trained literal weights
is a pure projection — the filter deploys as one `withColumn`.

Reference parity: extends the reference's MLlib LR usage
(`general_ml_and_source_sentiment_analysis.py`) to the corpus-quality
domain; no counterpart file — scale-mandated extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.curation import _FUNNEL_CTES, curate
from newsflow.functions.text import (
    sql_stopword_ratio,
    stopword_ratio_expr,
    tokens_expr,
)
from newsflow.ml.lr_native import (
    _prob_col,
    _sql_sigmoid,
    lr_ctes_sql_for,
    lr_fit_xy,
)
from newsflow.registry import register
from newsflow.tables import load_table, local_df, spread

N_COEF_Q = 7  # bias + 5 text features + upstream lang-ID indicator
Q_ITERS = 25  # these features need a longer, gentler schedule than the
Q_RATE = 4.0  # embedding model (LR_ITERS=3, rate 8 oscillates here)

#: (applicationId, sf_dir) -> fitted weights; both registered queries
#: share one deterministic fit per session.
_W_CACHE: dict = {}


def _features_xy(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """(vec_id, x, y): row-local feature vector + funnel-survival label."""
    t = tokens_expr("text")
    feats = docs.select(
        F.col("doc_id").alias("vec_id"),
        t.alias("t"),
        (F.col("lang") == "en").cast("double").alias("is_en"),
    )
    n = F.greatest(F.size("t"), F.lit(1))
    char_len = F.expr(
        "cast(aggregate(t, 0L, (acc, x) -> acc + length(x)) as double)"
    )
    digit_toks = F.size(F.expr("filter(t, x -> x rlike '[0-9]')"))
    x = F.array(
        F.lit(1.0),
        F.least(F.size("t") / F.lit(100.0), F.lit(1.0)),
        stopword_ratio_expr(F.col("t")),
        F.size(F.array_distinct("t")) / n,
        F.least((char_len / n) / F.lit(10.0), F.lit(1.0)),
        digit_toks / n,
        F.col("is_en"),
    )
    kept = curate(docs, spark).select(F.col("doc_id").alias("vec_id"))
    return (
        feats.join(
            kept.withColumn("y", F.lit(1.0)), "vec_id", "left"
        )
        .select(
            "vec_id",
            x.alias("x"),
            F.coalesce(F.col("y"), F.lit(0.0)).alias("y"),
        )
    )


def _ev_sql(
    toks: str = "toks", final: str = "final", name: str = "ev"
) -> str:
    """The (vec_id, x, y) training/eval relation as a CTE over a funnel
    instance's ``toks``/``final`` pair — parameterized so the sampled-
    teacher query can build a TRAINING ev from the sampled funnel and an
    EVAL ev from the full one in the same WITH block."""
    return f"""{name} AS MATERIALIZED (
      SELECT t.doc_id AS vec_id,
             [1.0,
              least(len(t.t) / 100.0, 1.0),
              {sql_stopword_ratio("t.t")},
              len(list_distinct(t.t))::DOUBLE / greatest(len(t.t), 1),
              least((list_sum(list_transform(t.t, x -> len(x)))::DOUBLE
               / greatest(len(t.t), 1)) / 10.0, 1.0),
              len(list_filter(t.t, x -> regexp_matches(x, '[0-9]')))
                ::DOUBLE / greatest(len(t.t), 1),
              CASE WHEN t.lang = 'en' THEN 1.0 ELSE 0.0 END
             ] AS x,
             CASE WHEN f.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS y
      FROM {toks} t LEFT JOIN {final} f ON f.doc_id = t.doc_id
    )"""


_EV_SQL = _ev_sql()

def _fit(spark: SparkSession, sf_dir: str, xy: DataFrame | None = None):
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _W_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _W_CACHE if k[0] != key[0]]:
        _W_CACHE.pop(k)
    if xy is None:
        docs = spread(load_table(spark, sf_dir, "documents"))
        xy = _features_xy(docs, spark).localCheckpoint(eager=True)
    w = lr_fit_xy(xy, N_COEF_Q, iters=Q_ITERS, rate=Q_RATE)
    _W_CACHE[key] = w
    return w


_Q_CTES = (
    _FUNNEL_CTES
    + ",\n    "
    + lr_ctes_sql_for(_EV_SQL, N_COEF_Q, iters=Q_ITERS, rate=Q_RATE)
)


@register(
    "quality_clf_coefficients",
    oracle=f"""
    {_Q_CTES}
    SELECT j, w[j] AS weight
    FROM w{Q_ITERS}, UNNEST(range(1, {N_COEF_Q + 1})) AS u(j)
    """,
    tags=("ml", "quality", "curation", "iterative"),
)
def quality_clf_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distilled quality filter's trained weights (j=1 bias, then
    the 5 text features in module-docstring order) — 3 GD iterations,
    exactly oracled end to end INCLUDING the teacher labels (the
    funnel CTEs feed the oracle's training relation)."""
    w = _fit(spark, sf_dir)
    return local_df(
        spark, [(j + 1, w[j]) for j in range(N_COEF_Q)],
        "j long, weight double",
    )


@register(
    "quality_clf_filter_eval",
    oracle=f"""
    {_Q_CTES},
    clf_scored AS (
      SELECT ev.vec_id, ev.y, {_sql_sigmoid(f"w{Q_ITERS}")} AS prob
      FROM ev, w{Q_ITERS}
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count_if(y = 1.0 AND prob >= 0.5) AS BIGINT) AS tp,
           CAST(count_if(y = 0.0 AND prob >= 0.5) AS BIGINT) AS fp,
           CAST(count_if(y = 1.0 AND prob < 0.5) AS BIGINT) AS fn,
           CAST(count_if(y = 0.0 AND prob < 0.5) AS BIGINT) AS tn
    FROM clf_scored
    """,
    tags=("ml", "quality", "curation", "iterative", "evaluation"),
)
def quality_clf_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of the distilled filter at threshold 0.5
    against the teacher's funnel-survival labels — the number that says
    how much corpus the cheap filter would pass/lose vs running the
    full funnel. One exactly-oracled row."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    xy = _features_xy(docs, spark).localCheckpoint(eager=True)
    w = _fit(spark, sf_dir, xy=xy)
    return _confusion(xy.select("vec_id", "y", _prob_col(w).alias("prob")))


def _confusion(scored: DataFrame) -> DataFrame:
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if((F.col("y") == 1.0) & (F.col("prob") >= 0.5))
        .cast("long")
        .alias("tp"),
        F.count_if((F.col("y") == 0.0) & (F.col("prob") >= 0.5))
        .cast("long")
        .alias("fp"),
        F.count_if((F.col("y") == 1.0) & (F.col("prob") < 0.5))
        .cast("long")
        .alias("fn"),
        F.count_if((F.col("y") == 0.0) & (F.col("prob") < 0.5))
        .cast("long")
        .alias("tn"),
    )


#: Sampled-teacher form: the teacher funnel runs on a deterministic
#: 1-in-SAMPLE_MOD md5(doc_id) slice only. 10% is the production-shaped
#: operating point the r7 verdict asked to certify.
SAMPLE_MOD = 10


def sampled_teacher_ctes(sample_mod: int) -> str:
    """Full WITH block: full-corpus funnel (eval labels), sampled-docs
    funnel (training labels), LR trained on the SAMPLED ev."""
    from newsflow.curation import funnel_ctes_sql

    return (
        "\nWITH "
        + funnel_ctes_sql()
        + f""",
    sdocs AS (
      SELECT * FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % {sample_mod} = 0),
    """
        + funnel_ctes_sql("sdocs", "s")
        + ",\n    "
        + lr_ctes_sql_for(
            _ev_sql("stoks", "sfinal", "ev"),
            N_COEF_Q,
            iters=Q_ITERS,
            rate=Q_RATE,
        )
        + ",\n    "
        + _ev_sql("toks", "final", "fev")
    )


@register(
    "quality_clf_sampled_teacher_eval",
    oracle=f"""
    {sampled_teacher_ctes(SAMPLE_MOD)},
    clf_scored AS (
      SELECT fev.vec_id, fev.y,
             {_sql_sigmoid(f"w{Q_ITERS}", "fev")} AS prob
      FROM fev, w{Q_ITERS}
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count_if(y = 1.0 AND prob >= 0.5) AS BIGINT) AS tp,
           CAST(count_if(y = 0.0 AND prob >= 0.5) AS BIGINT) AS fp,
           CAST(count_if(y = 1.0 AND prob < 0.5) AS BIGINT) AS fn,
           CAST(count_if(y = 0.0 AND prob < 0.5) AS BIGINT) AS tn
    FROM clf_scored
    """,
    tags=("ml", "quality", "curation", "iterative", "evaluation"),
)
def quality_clf_sampled_teacher_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB deployment form of the distilled quality filter: the
    EXPENSIVE teacher (full funnel incl. near-dup removal) labels only
    a deterministic 1-in-{SAMPLE_MOD} md5(doc_id) sample; the student
    trains on that slice and is then evaluated against the FULL-corpus
    teacher labels — the confusion row quantifies exactly what the
    sampling saves vs costs (tests/test_quality_clf.py holds the
    recall/accuracy floors at this operating point; the
    sample-fraction curve is recorded in BENCH_sf1.md).

    The within-sample funnel is the honest sampled teacher: its dedup
    stages see only the sample (near-dup prevalence scales down), which
    is the real bias a sampled teacher carries in production.

    Scale shape: teacher cost drops by the sample factor (the funnel's
    pair stage by its square); training ev is sample-sized; full-corpus
    scoring is the same one-projection deploy path as the unsampled
    filter."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    sample = docs.filter(u % SAMPLE_MOD == 0)
    # Same session-scoped weight cache as `_fit`: the deterministic fit
    # is the stored model artifact of a deployment — refitting it on
    # every scoring call would charge training cost to inference.
    key = (spark.sparkContext.applicationId, sf_dir, "sampled")
    w = _W_CACHE.get(key)
    if w is None:
        xy_s = _features_xy(sample, spark).localCheckpoint(eager=True)
        w = lr_fit_xy(xy_s, N_COEF_Q, iters=Q_ITERS, rate=Q_RATE)
        _W_CACHE[key] = w
    xy_full = _features_xy(docs, spark)
    return _confusion(
        xy_full.select("vec_id", "y", _prob_col(w).alias("prob"))
    )
