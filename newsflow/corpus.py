"""Corpus-maintenance operators: the ingestion-time counterparts of the
curation funnel (newsflow/curation.py) — source quotas, incremental-batch
dedup, training/RAG chunk export, boilerplate n-gram signals, the
percentile quality gate, vocabulary/OOV coverage, ANALYZE-style table
profiling, and deterministic mixture down-sampling.

Beyond-reference surface (the reference pipeline ingests one GDELT
extract at a time; a 100 TB training-data pipeline ingests continuously
and must cap, diff, chunk, and de-boilerplate as it goes). Every query
here has an exact DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.dedup.minhash import incremental_neardup_pairs
from newsflow.functions.scalars import davg, dround, sql_davg
from newsflow.functions.text import (
    sql_shingles_rel,
    sql_stopword_ratio,
    sql_tokens,
    tokens_expr,
)
from newsflow.registry import register
from newsflow.tables import load_table, spread

# --------------------------------------------------------------------------
# Source capping (per-domain quotas)
# --------------------------------------------------------------------------

SOURCE_CAP = 10


@register(
    "source_capped_sample",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rank_in_source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= {SOURCE_CAP}
    """,
    tags=("corpus", "curation"),
)
def source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping: keep the first {SOURCE_CAP} documents
    (by doc_id) of every source — the "no single domain dominates the
    mixture" guard every pretraining pipeline applies before export.

    Scale shape: one shuffle on source; row_number is rank-limited so
    AQE's window-group-limit pushdown prunes per partition before the
    sort completes. A skewed mega-source costs one hot partition of at
    most its own rows — no global sort, no collect.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= SOURCE_CAP)
        .select(
            "doc_id",
            "source",
            F.col("rank_in_source").cast("long").alias("rank_in_source"),
        )
    )


# --------------------------------------------------------------------------
# Incremental-batch dedup (new snapshot vs existing corpus)
# --------------------------------------------------------------------------

EXISTING_MAX_DOC_ID = 250


@register(
    "incremental_dedup_new_docs",
    oracle=f"""
    WITH existing AS (
      SELECT DISTINCT md5(text) AS text_hash FROM documents
      WHERE doc_id < {EXISTING_MAX_DOC_ID}
    ),
    batch AS (
      SELECT doc_id, md5(text) AS text_hash FROM documents
      WHERE doc_id >= {EXISTING_MAX_DOC_ID}
    )
    SELECT text_hash, min(doc_id) AS doc_id,
           count(*) AS batch_dup_count
    FROM batch
    -- NOT EXISTS, not NOT IN: a NULL hash (null text) must behave like
    -- Spark's left_anti (null key matches nothing -> row kept); NOT IN
    -- over a set containing NULL would silently drop every row.
    WHERE NOT EXISTS (
      SELECT 1 FROM existing e WHERE e.text_hash = batch.text_hash
    )
    GROUP BY text_hash
    """,
    tags=("corpus", "dedup", "incremental"),
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: from a new batch (doc_id >=
    {EXISTING_MAX_DOC_ID}), keep one doc per distinct text that does NOT
    already exist in the indexed corpus (doc_id < {EXISTING_MAX_DOC_ID})
    — the snapshot-over-snapshot diff a continuously-ingesting pipeline
    runs instead of re-deduplicating 100 TB from scratch.

    Scale shape: both sides reduce to 16-byte md5 keys before any join;
    the anti join and the min_by groupBy share the same hash key, so
    AQE plans one shuffle per side and no row text ever moves. At real
    scale the "existing" side is a pre-hashed index table, not a scan.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    existing = (
        docs.filter(F.col("doc_id") < EXISTING_MAX_DOC_ID)
        .select(F.md5("text").alias("text_hash"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") >= EXISTING_MAX_DOC_ID).select(
        "doc_id", F.md5("text").alias("text_hash")
    )
    return (
        batch.join(existing, "text_hash", "left_anti")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("batch_dup_count"),
        )
    )


@register(
    "incremental_neardup_new_docs",
    # The banded-LSH candidates are exact-verified, and the candidate set
    # is exactly the cross-pair subset of the full-corpus banding whose
    # recall 1 at threshold 0.8 is asserted by tests/test_dedup.py — so
    # the exact cross-pair SQL is a true oracle for the operator output
    # (same argument as minhash_near_dup_pairs). doc_a < doc_b in the
    # exact join maps onto (matched=indexed, new=batch) because every
    # indexed id is below EXISTING_MAX_DOC_ID and every batch id at or
    # above it.
    oracle=f"""
    WITH sh AS ({sql_shingles_rel(n=3)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS matched_doc_id, b.doc_id AS new_doc_id,
             count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s
      WHERE a.doc_id < {EXISTING_MAX_DOC_ID}
        AND b.doc_id >= {EXISTING_MAX_DOC_ID}
      GROUP BY 1, 2
    )
    SELECT new_doc_id, matched_doc_id, n_common,
           n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = matched_doc_id
    JOIN sizes sb ON sb.doc_id = new_doc_id
    WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    """,
    tags=("corpus", "dedup", "incremental", "lsh"),
)
def incremental_neardup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup indexing: match the new ingest batch
    (doc_id >= {EXISTING_MAX_DOC_ID}) against the indexed corpus's
    stored MinHash band signatures — signatures are computed for the
    batch only and the band-key join probes the index, so daily-ingest
    cost tracks batch size, not corpus size (the operator
    `incremental_dedup_new_docs` covers only byte-identical re-ingests;
    this tier catches near-duplicates of already-indexed documents).
    See `dedup/minhash.py::incremental_neardup_pairs` for the pipeline
    and the recall argument."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return incremental_neardup_pairs(
        docs.filter(F.col("doc_id") < EXISTING_MAX_DOC_ID),
        docs.filter(F.col("doc_id") >= EXISTING_MAX_DOC_ID),
        n=3,
        threshold=0.8,
    )


# --------------------------------------------------------------------------
# Token-window chunking (training / RAG export)
# --------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens("text")} AS t FROM documents
    )
    SELECT doc_id,
           CAST(i / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(t[i + 1 : i + {CHUNK_SIZE}]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(t[i + 1 : i + {CHUNK_SIZE}], ' ') AS chunk_text
    FROM toks, UNNEST(range(0, greatest(len(t), 1), {CHUNK_STRIDE})) AS u(i)
    WHERE len(t) > 0
    """,
    tags=("corpus", "export"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({CHUNK_SIZE}-token chunks,
    stride {CHUNK_STRIDE} → 16-token overlap): the document → context-
    window export step for RAG indexing and fixed-length pretraining
    sequences. One row per (doc, chunk) with its index, length, and text.

    Scale shape: pure row-local explode (sequence → transform → slice),
    zero shuffles, stays in whole-stage codegen; output rows ≈ rows ×
    len/stride, the same blow-up the downstream tokenizer would pay
    anyway. Complements `corpus_pack_sequences` (which packs whole docs
    into budgeted sequences; this slices single docs into windows).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens_expr("text").alias("t")).filter(
        F.size("t") > 0
    )
    starts = F.expr(f"sequence(0, size(t) - 1, {CHUNK_STRIDE})")
    return (
        toks.select("doc_id", "t", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            (F.col("i") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.expr(f"slice(t, i + 1, {CHUNK_SIZE})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


# --------------------------------------------------------------------------
# Boilerplate n-gram signal
# --------------------------------------------------------------------------

BOILER_NGRAM = 5
BOILER_MIN_DOCS = 2


@register(
    "doc_boilerplate_ratio",
    oracle=f"""
    WITH sh AS ({sql_shingles_rel(n=BOILER_NGRAM)}),
    freq AS (
      SELECT s, count(DISTINCT doc_id) AS nd FROM sh GROUP BY s
    ),
    per_doc AS (
      SELECT sh.doc_id,
             count(*) AS n_shingles,
             CAST(sum(CASE WHEN f.nd >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_boilerplate
      FROM sh JOIN freq f USING (s)
      GROUP BY sh.doc_id
    )
    SELECT doc_id, n_shingles, n_boilerplate,
           (round(n_boilerplate / n_shingles + 1e-9, 6) + 0.0)
             AS boilerplate_ratio
    FROM per_doc
    """,
    tags=("corpus", "quality"),
)
def doc_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate share per document: the fraction of a doc's distinct
    {BOILER_NGRAM}-gram shingles that occur in >= {BOILER_MIN_DOCS}
    distinct documents — the cross-document repetition signal (CCNet /
    RefinedWeb-style) that catches templated pages exact dedup misses.

    Scale shape: two shuffles, one scan — the per-shingle document count
    is a count() window over the DISTINCT (doc, shingle) stream (the
    stream is distinct per doc by construction, so plain count == count
    of docs), then one re-aggregation per doc. No self-join, so the
    shingle stream is never computed twice. Skew note: a boilerplate
    shingle's partition holds one row per containing doc — bounded by
    doc count, same bound the groupBy-join form would have. Complements
    `doc_repetition_scores` (within-doc repetition) with the across-doc
    signal.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", tokens_expr("text").alias("t"))
        # Guard BEFORE the sequence: Spark's sequence(1, stop) runs
        # DESCENDING when stop < 1, so a short doc would emit bogus
        # sub-n-gram shingles instead of none.
        .filter(F.size("t") >= BOILER_NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(t) - {BOILER_NGRAM - 1}),"
                        f" i -> array_join(slice(t, i, {BOILER_NGRAM}), ' '))"
                    )
                )
            ).alias("s"),
        )
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("s"))
    per_doc = (
        sh.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("nd") >= BOILER_MIN_DOCS, 1).otherwise(0)
            ).alias("n_boilerplate"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boilerplate",
        dround(
            F.col("n_boilerplate") / F.col("n_shingles"), 6
        ).alias("boilerplate_ratio"),
    )


# --------------------------------------------------------------------------
# Global-percentile quality gate
# --------------------------------------------------------------------------

QUALITY_PCT = 0.75


@register(
    "doc_quality_percentile_gate",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             (round(
                0.4 * least(len(t) / 100.0, 1.0)
              + 0.3 * (1.0 - {sql_stopword_ratio('t')})
              + 0.3 * (len(list_distinct(t))::DOUBLE / greatest(len(t), 1))
              + 1e-9, 4) + 0.0) AS quality_score
      FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
    ),
    thr AS (
      SELECT (round(quantile_cont(quality_score, {QUALITY_PCT}) + 1e-9, 6)
              + 0.0) AS p_threshold
      FROM scored
    )
    SELECT s.doc_id, s.quality_score, thr.p_threshold
    FROM scored s, thr
    WHERE s.quality_score >= thr.p_threshold
    """,
    tags=("corpus", "quality", "curation"),
)
def doc_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate: keep the top (1 - {QUALITY_PCT}) quantile
    of documents by heuristic quality score — the "keep the best X%"
    curation form used when an absolute threshold is unknown for a new
    source.

    Scale note: the percentile is EXACT yet scale-safe *because* scores
    are rounded to 4 dp first — Spark's percentile aggregate builds a
    value->count histogram, so its state is bounded by the ≤10k distinct
    rounded scores, not by corpus rows (with unrounded doubles you'd
    swap in approx_percentile). The 1-row threshold then broadcasts:
    scan → 1-row agg → broadcast nested-loop filter, one pass over the
    corpus, no sort.
    """
    from newsflow.curation import _scored

    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = _scored(docs).select(
        "doc_id", dround(F.col("q"), 4).alias("quality_score")
    )
    thr = scored.agg(
        dround(
            F.percentile(F.col("quality_score"), F.lit(QUALITY_PCT)), 6
        ).alias("p_threshold")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_score") >= F.col("p_threshold"))
        .select("doc_id", "quality_score", "p_threshold")
    )


# --------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# --------------------------------------------------------------------------

VOCAB_TOP_K = 20


@register(
    "doc_oov_rate",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest(t) AS tok
      FROM (SELECT doc_id, {sql_tokens()} AS t FROM documents)
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS n FROM occ GROUP BY tok
      ) ORDER BY n DESC, tok LIMIT {VOCAB_TOP_K}
    )
    SELECT o.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           (round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                  / count(*) + 1e-9, 6) + 0.0) AS oov_rate
    FROM occ o LEFT JOIN vocab v USING (tok)
    GROUP BY o.doc_id
    """,
    tags=("corpus", "text"),
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage scan: build the corpus top-{VOCAB_TOP_K}
    token vocabulary (freq desc, token asc — deterministic), then score
    every document's out-of-vocabulary token share — the tokenizer-fit /
    gibberish signal computed before committing to a tokenizer.

    Scale shape: token frequencies partial-aggregate map-side (one
    shuffle bounded by DISTINCT vocabulary, not corpus rows); the top-K
    cut is TakeOrdered (no single-partition sort); the K-row vocab
    broadcasts into the per-occurrence left join, and the final per-doc
    count is the only corpus-sized shuffle.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    occ = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("tok")
    )
    vocab = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(VOCAB_TOP_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    oov = F.sum(
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    )
    return (
        occ.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("n_oov"),
            dround(oov / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
    )


# --------------------------------------------------------------------------
# Table profiling (ANALYZE-style column statistics)
# --------------------------------------------------------------------------

PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_struct(c: str):
    return F.struct(
        F.lit(c).alias("col_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
        F.countDistinct(F.col(c)).alias("n_distinct"),
        F.min(F.col(c)).cast("string").alias("min_value"),
        F.max(F.col(c)).cast("string").alias("max_value"),
    )


@register(
    "documents_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM documents
        """
        for c in PROFILE_COLS
    ),
    tags=("corpus", "profile", "agg"),
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table: one row per
    column with row/null/exact-distinct counts and min/max (stringified
    with the NUMERIC ordering applied before the cast) — the stats pass
    a catalog or data-quality monitor runs per ingest batch.

    Scale shape: ONE scan — all columns profile in a single aggregation
    (the oracle's UNION ALL re-scans per column; Spark plans one pass
    with grouping-expand for the per-column exact distincts). At 100 TB
    swap countDistinct for approx_count_distinct and the expand
    disappears; exact is kept here because the oracle gate hash-checks
    the distinct counts.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    profiled = docs.agg(
        F.array(*[_profile_struct(c) for c in PROFILE_COLS]).alias("p")
    )
    return profiled.select(F.inline("p"))


# --------------------------------------------------------------------------
# Deterministic mixture down-sampling
# --------------------------------------------------------------------------

_U32 = 4294967296.0


@register(
    "corpus_mixture_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    shares AS (
      SELECT source, n, n::DOUBLE / sum(n) OVER () AS share FROM counts
    ),
    weights AS (
      SELECT source, share,
             sqrt(share) / sum(sqrt(share)) OVER () AS wt
      FROM shares
    ),
    rates AS (
      SELECT source,
             (round((wt / share) / max(wt / share) OVER () + 1e-9, 6)
              + 0.0) AS rate
      FROM weights
    )
    SELECT d.doc_id, d.source, r.rate
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
          / {_U32} < r.rate
    """,
    tags=("corpus", "curation", "sampling"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample the corpus TO its target mixture: each source keeps
    documents at rate ∝ (target weight / current share), scaled so the
    most-upweighted source keeps everything — the materialization step
    after `corpus_source_mixture` computes the share^0.5-smoothed
    weights. Inclusion is decided by a per-document md5-derived uniform,
    so the sample is deterministic, partition-independent, and stable
    across reruns (no rand(), no reservoir state).

    Scale shape: rates are a per-source aggregate (rows = |sources|) —
    window functions over that tiny frame, then a broadcast join back;
    the corpus-side pass is scan → hash-probe → row-local md5 filter.
    The rounded rate makes the u < rate comparison bit-identical across
    engines (u is exact integer arithmetic; the rate is a 6-dp double).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    full = Window.partitionBy()
    share = F.col("n").cast("double") / F.sum("n").over(full)
    wt = F.sqrt(share) / F.sum(F.sqrt(share)).over(full)
    ratio = wt / share
    rates = counts.select(
        "source",
        dround(ratio / F.max(ratio).over(full), 6).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(_U32)
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source", "rate")
    )


# --------------------------------------------------------------------------
# Robust statistics: winsorized event values
# --------------------------------------------------------------------------

WINSOR_LO = "0.01"
WINSOR_HI = "0.99"


@register(
    "events_value_winsorized",
    oracle=f"""
    WITH vals AS (
      SELECT (round(value + 1e-9, 2) + 0.0) AS vr FROM events
    ),
    thr AS (
      SELECT (round(quantile_cont(vr, {WINSOR_LO}) + 1e-9, 6) + 0.0) AS p01,
             (round(quantile_cont(vr, {WINSOR_HI}) + 1e-9, 6) + 0.0) AS p99
      FROM vals
    )
    SELECT p01, p99,
           count(*) AS n_events,
           CAST(sum(CASE WHEN vr < p01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(sum(CASE WHEN vr > p99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           {sql_davg("least(greatest(vr, p01), p99)", out=4)}
             AS winsorized_mean
    FROM vals, thr
    GROUP BY p01, p99
    """,
    tags=("corpus", "quality", "agg"),
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized summary of the event value stream: clip at the
    [P{WINSOR_LO}, P{WINSOR_HI}] percentiles and report the robust mean
    plus clip counts — the outlier-handling pass metric pipelines run
    before aggregating money-like measures.

    Scale shape: same exact-percentile-on-rounded-values trick as
    `doc_quality_percentile_gate` (2-dp rounding bounds the percentile
    aggregate's histogram by the value RANGE, not row count), one
    corpus pass for the thresholds, broadcast of the 1-row thresholds,
    one clipped pass with a decimal-exact mean.
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    vals = ev.select(dround(F.col("value"), 2).alias("vr"))
    thr = vals.agg(
        dround(F.percentile(F.col("vr"), F.lit(float(WINSOR_LO))), 6)
        .alias("p01"),
        dround(F.percentile(F.col("vr"), F.lit(float(WINSOR_HI))), 6)
        .alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("vr"), F.col("p01")), F.col("p99"))
    return (
        vals.crossJoin(F.broadcast(thr))
        .groupBy("p01", "p99")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("vr") < F.col("p01"), 1).otherwise(0)
            ).alias("n_clipped_low"),
            F.sum(
                F.when(F.col("vr") > F.col("p99"), 1).otherwise(0)
            ).alias("n_clipped_high"),
            davg(clipped, out=4).alias("winsorized_mean"),
        )
    )


# --------------------------------------------------------------------------
# Water-filling token-budget allocation across sources
# --------------------------------------------------------------------------

WATERFILL_BUDGET = 26_000  # tokens — mixed regime at the check SF: small sources fit whole, large ones cap


@register(
    "source_budget_waterfill",
    oracle=f"""
    WITH sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
      FROM (SELECT source, unnest({sql_tokens()}) AS t FROM documents)
      GROUP BY source
    ),
    ranked AS (
      SELECT source, n_tokens,
             CAST(row_number() OVER w AS BIGINT) AS rk,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY n_tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS prefix,
             CAST(count(*) OVER () AS BIGINT) AS n_src
      FROM sizes
      WINDOW w AS (ORDER BY n_tokens, source)
    ),
    cut AS (
      SELECT CAST(coalesce(
               min(CASE WHEN n_tokens * (n_src - rk + 1) + prefix
                             > {WATERFILL_BUDGET} THEN rk END) - 1,
               max(n_src), 0) AS BIGINT) AS c
      FROM ranked
    ),
    cutsum AS (
      SELECT c, CAST(coalesce(
               max(CASE WHEN rk <= c THEN prefix + n_tokens END),
               0) AS BIGINT) AS full_sum
      FROM ranked CROSS JOIN cut
      GROUP BY c
    )
    SELECT source, n_tokens,
           CASE WHEN rk <= c THEN n_tokens
                ELSE least(n_tokens,
                           ({WATERFILL_BUDGET} - full_sum) // (n_src - c))
           END AS allocated,
           rk > c AS is_capped
    FROM ranked, cutsum
    """,
    tags=("corpus", "training-export"),
)
def source_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a {WATERFILL_BUDGET}-token budget
    across sources: small sources keep everything, large sources are
    capped at the common water level that exactly exhausts the budget —
    the standard max-min-fair mixture allocator (the closed-form twin of
    iteratively raising the level).

    Entirely integer arithmetic (sizes, prefix sums, floor division), so
    the oracle is exact with no rounding machinery. The corpus-sized
    work is one explode+groupBy per-source count; the waterfill itself
    runs window functions over the BOUNDED per-source frame (#sources
    rows — same justification as the tokenizer-vocab ranking), plus one
    1-row cutoff aggregate broadcast back.
    """
    docs = load_table(spark, sf_dir, "documents")
    sizes = (
        docs.select("source", F.explode(tokens_expr("text")).alias("t"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    return waterfill_alloc(sizes, WATERFILL_BUDGET)


def waterfill_alloc(sizes: DataFrame, budget: int) -> DataFrame:
    """Core waterfill over a (source, n_tokens) frame — factored out so
    the budget invariant (sum(allocated) <= budget whenever
    budget >= n_src, i.e. every source can receive its floor share) is
    property-testable on adversarial size distributions independent of
    the documents fixture.

    Cutoff derivation: the fullness condition
    f(rk) = n_tokens_rk * (n_src - rk + 1) + prefix_rk is nondecreasing
    in rk under the ascending (n_tokens, source) sort —
    f(rk+1) - f(rk) = (n_{rk+1} - n_rk)(n_src - rk) >= 0 — so the
    satisfying ranks form a prefix. The cutoff is nevertheless computed
    as (min failing rank) - 1 rather than max(satisfying rank): the two
    agree given monotonicity, but the min-failing form stays correct by
    construction if the ordering invariant is ever perturbed (it can
    only shrink the fully-funded prefix, never over-allocate).
    """
    w = Window.orderBy("n_tokens", "source")
    ranked = sizes.select(
        "source",
        "n_tokens",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("prefix"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n_src"),
    )
    fails = (
        F.col("n_tokens") * (F.col("n_src") - F.col("rk") + 1)
        + F.col("prefix")
        > budget
    )
    cut = ranked.agg(
        F.coalesce(
            F.min(F.when(fails, F.col("rk"))) - 1,
            F.max("n_src"),
            F.lit(0),
        )
        .cast("bigint")
        .alias("c")
    )
    cutsum = (
        ranked.crossJoin(F.broadcast(cut))
        .groupBy("c")
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("rk") <= F.col("c"),
                        F.col("prefix") + F.col("n_tokens"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("full_sum")
        )
    )
    alloc = F.when(F.col("rk") <= F.col("c"), F.col("n_tokens")).otherwise(
        F.least(
            F.col("n_tokens"),
            F.expr(
                f"CAST(({budget} - full_sum)" " DIV (n_src - c) AS BIGINT)"
            ),
        )
    )
    return ranked.crossJoin(F.broadcast(cutsum)).select(
        "source",
        "n_tokens",
        alloc.alias("allocated"),
        (F.col("rk") > F.col("c")).alias("is_capped"),
    )


# --------------------------------------------------------------------------
# Snapshot diff (corpus version reconciliation)
# --------------------------------------------------------------------------

# Two overlapping snapshots of the same corpus: the old release holds
# doc_id < 300, the new one doc_id >= 100 with every 10th document
# edited — so the diff exercises all four statuses (removed: 0..99,
# unchanged / changed: 100..299, added: 300+).
SNAP_OLD_MAX = 300
SNAP_NEW_MIN = 100
SNAP_EDIT_EVERY = 10


@register(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT doc_id AS key, md5(text) AS h FROM documents
      WHERE doc_id < {SNAP_OLD_MAX}
    ),
    new AS (
      SELECT doc_id AS key,
             md5(CASE WHEN doc_id % {SNAP_EDIT_EVERY} = 0
                      THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id >= {SNAP_NEW_MIN}
    )
    SELECT coalesce(o.key, n.key) AS key,
           CASE WHEN o.key IS NULL THEN 'added'
                WHEN n.key IS NULL THEN 'removed'
                WHEN o.h = n.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.key = n.key
    """,
    tags=("corpus", "incremental"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot reconciliation: classify every document key
    as added / removed / changed / unchanged between two corpus versions
    (simulated here as two overlapping doc_id windows of the same table)
    — the diff a continuously-refreshed corpus publishes with each
    release so downstream consumers re-embed only what moved.

    Scale shape: both sides reduce to (key, 16-byte md5) projections
    before the full-outer join — one shuffle per side on the key, no
    text movement; the classification is row-local. Same hash-first
    discipline as `incremental_dedup_new_docs`.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    old = docs.filter(F.col("doc_id") < SNAP_OLD_MAX).select(
        F.col("doc_id").alias("okey"), F.md5("text").alias("oh")
    )
    edited = F.when(
        F.col("doc_id") % SNAP_EDIT_EVERY == 0,
        F.concat(F.col("text"), F.lit(" v2")),
    ).otherwise(F.col("text"))
    new = docs.filter(F.col("doc_id") >= SNAP_NEW_MIN).select(
        F.col("doc_id").alias("nkey"), F.md5(edited).alias("nh")
    )
    joined = old.join(new, old.okey == new.nkey, "full_outer")
    status = (
        F.when(F.col("okey").isNull(), F.lit("added"))
        .when(F.col("nkey").isNull(), F.lit("removed"))
        .when(F.col("oh") == F.col("nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col("okey"), F.col("nkey")).alias("key"),
        status.alias("status"),
    )


# --------------------------------------------------------------------------
# Declarative data-quality expectations (Deequ-style validation report)
# --------------------------------------------------------------------------


_EXPECTATIONS_SQL = """
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             length(text) AS true_len
      FROM documents
    )
    SELECT check_name, n_violations, n_rows,
           n_violations = 0 AS passed
    FROM (
      SELECT 'doc_id_not_null' AS check_name,
             CAST(count_if(doc_id IS NULL) AS BIGINT) AS n_violations,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM base
      UNION ALL
      SELECT 'doc_id_unique',
             CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'text_not_empty',
             CAST(count_if(text IS NULL OR length(text) = 0) AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'n_chars_matches_text',
             CAST(count_if(n_chars <> true_len) AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'lang_in_domain',
             CAST(count_if(lang NOT IN ('en','de','fr','es','it')
                           OR lang IS NULL) AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'source_format',
             CAST(count_if(source IS NULL
                           OR NOT regexp_matches(source, '^src[0-9]+$'))
                  AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM base
    )
"""


@register(
    "documents_expectations",
    oracle=_EXPECTATIONS_SQL,
    tags=("corpus", "quality", "expectations"),
)
def documents_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over the documents table — the
    Deequ/Great-Expectations-style validation report a pipeline gates
    ingestion on: completeness (non-null), uniqueness, emptiness,
    derived-column consistency (n_chars == length(text)), domain
    membership, and format (regex) checks, one row per check with its
    violation count.

    Scale shape: every check is a conditional aggregate, so the whole
    suite is ONE scan + one partial+final aggregation pass (the UNION
    ALL branches share the cached base projection; Spark computes all
    counters in a single Aggregate when expressed as one row —
    implemented here as a 6-counter aggregate exploded to rows, which
    keeps it one scan regardless of how many checks are added). The
    uniqueness check is the only one needing a distinct (one shuffle on
    the 8-byte key).
    """
    return expectations_report(load_table(spark, sf_dir, "documents"))


# Severity per expectation (the Deequ Check-level pattern): an 'error'
# check failing means the batch is structurally broken (unkeyable or
# empty documents) and ingestion must stop; a 'warn' check failing is a
# quality signal routed to monitoring, not a stop-the-line event.
EXPECTATION_SEVERITY = {
    "doc_id_not_null": "error",
    "doc_id_unique": "error",
    "text_not_empty": "error",
    "n_chars_matches_text": "warn",
    "lang_in_domain": "warn",
    "source_format": "warn",
}


def expectations_report(docs: DataFrame) -> DataFrame:
    """The expectation suite over an arbitrary documents frame — shared
    by the registered report query and the `curate()` fail-fast gate
    (newsflow/curation.py), so the funnel enforces exactly the checks
    the published report documents."""
    base = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("true_len"),
    )
    langs = ("en", "de", "fr", "es", "it")
    one = base.agg(
        F.count_if(F.col("doc_id").isNull()).alias("doc_id_not_null"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias(
            "doc_id_unique"
        ),
        F.count_if(
            F.col("text").isNull() | (F.length("text") == 0)
        ).alias("text_not_empty"),
        F.count_if(F.col("n_chars") != F.col("true_len")).alias(
            "n_chars_matches_text"
        ),
        F.count_if(
            ~F.col("lang").isin(*langs) | F.col("lang").isNull()
        ).alias("lang_in_domain"),
        F.count_if(
            F.col("source").isNull()
            | ~F.col("source").rlike("^src[0-9]+$")
        ).alias("source_format"),
        F.count(F.lit(1)).alias("_n"),
    )
    checks = (
        "doc_id_not_null",
        "doc_id_unique",
        "text_not_empty",
        "n_chars_matches_text",
        "lang_in_domain",
        "source_format",
    )
    exploded = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("check_name"),
                        F.col(c).cast("long").alias("n_violations"),
                    )
                    for c in checks
                ]
            )
        ).alias("c"),
        F.col("_n").cast("long").alias("n_rows"),
    )
    return exploded.select(
        "c.check_name",
        "c.n_violations",
        "n_rows",
        (F.col("c.n_violations") == 0).alias("passed"),
    )


@register(
    "expectations_gate_report",
    oracle=f"""
    WITH report AS ({_EXPECTATIONS_SQL})
    SELECT check_name, n_violations, n_rows, passed,
           CASE check_name
             WHEN 'doc_id_not_null' THEN 'error'
             WHEN 'doc_id_unique' THEN 'error'
             WHEN 'text_not_empty' THEN 'error'
             ELSE 'warn'
           END AS severity,
           (NOT passed) AND check_name IN
             ('doc_id_not_null', 'doc_id_unique', 'text_not_empty')
             AS blocks_ingestion
    FROM report
    """,
    tags=("corpus", "quality", "expectations"),
)
def expectations_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectation report with its ENFORCEMENT semantics attached:
    per check, the severity tier and whether its current state would
    fail-fast the curation funnel (`curate(enforce_expectations=True)`
    raises on any `blocks_ingestion` row — the Deequ error-level Check
    pattern wired into the pipeline rather than published beside it).
    Same single-scan aggregate as `documents_expectations`; severity and
    gating are row-local literals over the 6-row report."""
    report = expectations_report(load_table(spark, sf_dir, "documents"))
    sev = F.coalesce(
        *[
            F.when(F.col("check_name") == name, F.lit(level))
            for name, level in EXPECTATION_SEVERITY.items()
        ]
    )
    return report.select(
        "check_name",
        "n_violations",
        "n_rows",
        "passed",
        sev.alias("severity"),
        (~F.col("passed") & (sev == "error")).alias("blocks_ingestion"),
    )
