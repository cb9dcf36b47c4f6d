"""The composed full-funnel training-data pipeline as ONE query:
curate → DSIR-select → pack, with every stage sharing a single
tokenized projection of the corpus.

The per-query benchmark measures operators in isolation; a production
pretraining pipeline runs them as one lazy composition where the
expensive row-local work (tokenization) and the corpus scan are paid
ONCE and reused by every stage. This module is that composition plus
the oracled stage-count funnel that proves each stage's yield:

    0_total           raw corpus
    1_quality_lang    quality ≥ threshold AND lang gate     (curation)
    2_exact_dedup     min-doc_id keeper per distinct text   (curation)
    3_near_dup        MinHash near-dup losers removed       (curation)
    4_dsir_selected   top-N by DSIR importance weight       (selection)
    5_packed          fixed-SEQ_LEN sequence count spanned  (packing)

Plan-reuse mechanics (the thing this query exists to measure): the
tokenized base (doc_id, lang, source, text, t) is cached once per
(application, sf_dir) — the same keyed-cache discipline as
`dedup.queries._shared_shingle_arrays` — and feeds (a) quality
scoring, (b) exact-dedup hashing, (c) near-dup shingling, and (d) DSIR
featurization, none of which re-tokenize. Stage 4's selection is
orderBy+limit (TakeOrderedAndProject, no global window); stage 5 packs
only the N selected rows, so its prefix-sum window is bounded by the
selection size, not the corpus.

Scale shape at 100 TB: one corpus scan + one cached row-local
projection; the funnel flags aggregate in a single pass; the DSIR
model tables are bucket-bounded broadcasts; the only corpus-sized
shuffles are the two the dedup stages own (text-hash groupBy and the
shingle self-join — both already audited in their standalone queries).

Reference parity: composes the reference's filter→dedup→report ETL
(`build_datasets.py` stages) with the selection/packing stages a
training pipeline appends; no counterpart file — scale-mandated
extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.curation import (
    _FUNNEL_CTES,
    KEEP_LANGS,
    N_PACK_SHARDS,
    NEAR_DUP_JACCARD,
    QUALITY_THRESHOLD,
    SEQ_LEN,
    _scored_from_tokens,
)
from newsflow.dedup import minhash
from newsflow.functions.text import shingles_expr, sql_tokens, tokens_expr
from newsflow.registry import register
from newsflow.selection import _DSIR_WEIGHTS_ORACLE, _dsir_weights
from newsflow.tables import load_table, spread

PIPELINE_SELECT_N = 100

#: (applicationId, sf_dir) -> cached tokenized base projection. Same
#: lifecycle discipline as dedup.queries._SHINGLE_CACHE: storage-level
#: check catches bench-harness clearCache(), dead-app entries dropped
#: without unpersist, live-app other-sf entries retained.
_BASE_CACHE: dict = {}


def _shared_token_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    hit = _BASE_CACHE.get(key)
    if hit is not None and hit.storageLevel.useMemory:
        return hit
    for k in [k for k in _BASE_CACHE if k[0] != app]:
        _BASE_CACHE.pop(k)
    stale = _BASE_CACHE.pop(key, None)
    if stale is not None:
        try:
            stale.unpersist()
        except Exception:
            pass
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "lang", "source", "text", tokens_expr("text").alias("t")
    ).cache()
    _BASE_CACHE[key] = base
    return base


@register(
    "corpus_pipeline_e2e",
    oracle=_FUNNEL_CTES
    + f""",
    w AS ({_DSIR_WEIGHTS_ORACLE}),
    sel AS (
      SELECT f.doc_id, f.n_tokens
      FROM final f JOIN w USING (doc_id)
      ORDER BY w.log_weight DESC, f.doc_id
      LIMIT {PIPELINE_SELECT_N}
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(ascii(substr(md5(doc_id::VARCHAR), 1, 1))
                  % {N_PACK_SHARDS} AS BIGINT) AS shard,
             md5(doc_id::VARCHAR) AS h
      FROM sel
    ),
    off AS (
      SELECT shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_off
      FROM packed
    )
    SELECT * FROM (
      SELECT '0_total' AS stage, count(*)::BIGINT AS docs,
             CAST(sum(len({sql_tokens()})) AS BIGINT) AS tokens
      FROM documents
      UNION ALL
      SELECT '1_quality_lang', count(*)::BIGINT,
             CAST(sum(n_tokens) AS BIGINT) FROM filtered
      UNION ALL
      SELECT '2_exact_dedup', count(*)::BIGINT,
             CAST(sum(n_tokens) AS BIGINT) FROM kept
      UNION ALL
      SELECT '3_near_dup', count(*)::BIGINT,
             CAST(sum(n_tokens) AS BIGINT) FROM final
      UNION ALL
      SELECT '4_dsir_selected', count(*)::BIGINT,
             CAST(sum(n_tokens) AS BIGINT) FROM sel
      UNION ALL
      SELECT '5_packed',
             count(DISTINCT shard * 1000000 + tok_off // {SEQ_LEN})::BIGINT,
             (SELECT CAST(sum(n_tokens) AS BIGINT) FROM sel) FROM off)
    """,
    tags=("curation", "selection", "packing", "pipeline"),
)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data funnel as one composed lazy plan — see
    module docstring for stages, plan-reuse mechanics, and scale shape.
    Stage-5 ``docs`` counts the distinct (shard, pack) sequences the
    selected slice spans; its ``tokens`` equals stage 4's (packing is
    token-conserving — the conservation check rides in the oracle)."""
    base = _shared_token_base(spark, sf_dir)
    scored = _scored_from_tokens(base)
    passes = (F.col("q") >= F.lit(QUALITY_THRESHOLD)) & F.col("lang").isin(
        *KEEP_LANGS
    )
    hw = Window.partitionBy(F.md5("text"))
    flags = scored.withColumn("pass_filter", passes).withColumn(
        "keeper",
        F.col("pass_filter")
        & (
            F.col("doc_id")
            == F.min(F.when(passes, F.col("doc_id"))).over(hw)
        ),
    )
    arrays_kept = (
        flags.filter("keeper")
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.array_distinct(shingles_expr("t", 3)).alias("shingles"),
        )
    )
    pairs = minhash._verify_pairs(
        arrays_kept,
        minhash.native_minhash_candidates(arrays_kept),
        threshold=NEAR_DUP_JACCARD,
    )
    dropped = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_dropped", F.lit(True))
    )
    flags = flags.join(dropped, "doc_id", "left").withColumn(
        "survivor",
        F.col("keeper")
        & F.coalesce(~F.col("near_dropped"), F.lit(True)),
    )

    weights = _dsir_weights(base, from_tokens=True)
    selected = (
        flags.filter("survivor")
        .select("doc_id", "n_tokens")
        .join(weights.select("doc_id", "log_weight"), "doc_id")
        .orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(PIPELINE_SELECT_N)
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
    )
    h = F.md5(F.col("doc_id").cast("string"))
    packed = selected.select(
        "doc_id",
        "n_tokens",
        (F.ascii(F.substring(h, 1, 1)) % N_PACK_SHARDS)
        .cast("long")
        .alias("shard"),
        h.alias("h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = packed.withColumn(
        "tok_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )

    funnel_agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("n_tokens").cast("long").alias("t0"),
        F.count_if("pass_filter").cast("long").alias("d1"),
        F.sum(F.when(F.col("pass_filter"), F.col("n_tokens")))
        .cast("long")
        .alias("t1"),
        F.count_if("keeper").cast("long").alias("d2"),
        F.sum(F.when(F.col("keeper"), F.col("n_tokens")))
        .cast("long")
        .alias("t2"),
        F.count_if("survivor").cast("long").alias("d3"),
        F.sum(F.when(F.col("survivor"), F.col("n_tokens")))
        .cast("long")
        .alias("t3"),
    )
    sel_agg = selected.agg(
        F.count(F.lit(1)).cast("long").alias("d4"),
        F.sum("n_tokens").cast("long").alias("t4"),
    )
    seq_agg = off.agg(
        F.countDistinct(
            F.col("shard") * 1000000
            + F.expr(f"tok_off div {SEQ_LEN}")
        )
        .cast("long")
        .alias("d5")
    )
    wide = funnel_agg.crossJoin(sel_agg).crossJoin(seq_agg)
    return wide.selectExpr(
        "stack(6, '0_total', d0, t0, '1_quality_lang', d1, t1, "
        "'2_exact_dedup', d2, t2, '3_near_dup', d3, t3, "
        "'4_dsir_selected', d4, t4, '5_packed', d5, t4) "
        "AS (stage, docs, tokens)"
    )
