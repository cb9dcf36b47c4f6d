"""Deterministic sampling / corpus-reshaping operators (beyond-reference).

Training-data pipelines at 100 TB need *reproducible* selection: a sample
that comes out identical on every run, on any cluster, at any
parallelism, so that retries, incremental backfills, and audits agree on
which rows were picked. `rand()`-based sampling fails all three (seeded
`rand()` is partitioning-dependent in Spark). Everything here keys off
`md5(key)` — a pure column function both Spark and DuckDB implement with
identical output, which makes these the rare sampling operators with an
exact cross-engine oracle.

The reference has no sampling surface (its corpus is 3,415 rows —
`/root/reference/gdelt/processing/QA_SUMMARY.txt:3`); these operators are
part of the north-star LLM-pipeline surface, like `newsflow/dedup`.

Shuffle profiles (for the 100 TB review):
- `hash_sample` — pure scan-side filter, zero shuffles, pushes the md5
  predicate into the scan stage.
- `stratified_cap` — salted two-phase top-k: the phase-1 window keys on
  (stratum, salt) so a 100 TB stratum spreads over `salt_buckets`
  reducers and is pruned to ≤ k rows per bucket *before* the phase-2
  per-stratum window, which therefore sees ≤ k·salt_buckets rows per
  stratum regardless of input size. A single per-stratum window would
  funnel whole strata through single reducers.
- `corpus_shuffle` — TeraSort pattern: range-repartition by hash, sort
  within partitions, then assign global positions from per-partition
  offsets. No global single-partition window (the naive formulation —
  kept as the oracle — collapses to one task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from newsflow.functions.text import sql_tokens
from newsflow.registry import register
from newsflow.tables import load_table


def _hash_key(key: str = "doc_id") -> F.Column:
    """Portable deterministic sort/sample key: lowercase md5 hex of the
    decimal string form of the key (Spark `md5` ≡ DuckDB `md5`)."""
    return F.md5(F.col(key).cast("string"))


def hash_sample(df: DataFrame, key: str = "doc_id", hex_digits: int = 1,
                keep_prefixes: tuple[str, ...] = ("0",)) -> DataFrame:
    """Deterministic ~len(keep)/16^digits sample by md5-prefix membership.

    Filter-only: no shuffle, reproducible across runs/engines/cluster
    sizes, and composable (a 1/16 sample of a 1/16 sample is an unbiased
    1/256 sample because md5 prefixes are independent of the data).
    """
    prefix = F.substring(_hash_key(key), 1, hex_digits)
    return df.where(prefix.isin(*keep_prefixes))


def stratified_cap(
    docs: DataFrame,
    stratum: str = "lang",
    k: int = 40,
    key: str = "doc_id",
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-stratum deterministic cap: keep the k rows with the smallest
    md5(key) in each stratum (e.g. "at most k docs per language").

    Because every row not in its (stratum, salt)-bucket top-k cannot be
    in the stratum top-k, phase 1 prunes with full parallelism and
    phase 2 ranks a bounded remainder. The salt uses xxhash64 — it only
    routes rows, so engine-specific hashing cannot affect the result.
    """
    base = docs.select(key, stratum, _hash_key(key).alias("h"))
    salted = base.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(key)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(stratum, "salt").orderBy("h", key)
    pruned = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
    )
    w2 = Window.partitionBy(stratum).orderBy("h", key)
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .select(key, stratum, "sample_rank")
    )


def corpus_shuffle(
    docs: DataFrame,
    key: str = "doc_id",
    shards: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data export.

    Returns (key, shuffle_pos, shard): `shuffle_pos` is the row's 1-based
    position in the global (md5(key), key) order — a reproducible random
    permutation of the corpus — and `shard` round-robins positions into
    `shards` equal output shards.

    Scale path: range-repartition on the hash (TeraSort), sort within
    partitions, then one tiny driver pass turns per-partition counts into
    offsets; `mapInPandas` adds offset + local index. Positions are a
    property of the global order alone, so the result is independent of
    partition boundaries and input layout.

    The arranged frame is materialized ONCE (`localCheckpoint`) before
    the counts pass: Spark's RangePartitioner samples boundaries with an
    RDD-dependent seed, so re-executing the lazy plan for the second job
    could place rows in different partitions than the counts saw, making
    `shuffle_pos` silently wrong (not a permutation). Checkpointing pins
    the partitioning both jobs read. The materialization is inherent to
    any two-pass global-offset scheme — at cluster scale this is an
    executor-storage-resident intermediate, same as TeraSort's.
    """
    spark = docs.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    keyed = docs.select(F.col(key).alias("k"), _hash_key(key).alias("h"))
    arranged = (
        keyed.repartitionByRange(n_parts, "h", "k")
        .sortWithinPartitions("h", "k")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in arranged.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_off = spark.sparkContext.broadcast(offsets)
    n_shards = shards
    # Output key column mirrors the input key's name and type — the
    # schema is derived, not hardcoded, so non-default / non-integer
    # keys (e.g. a string url key) round-trip correctly.
    key_field = docs.schema[key]
    out_schema = T.StructType(
        [
            T.StructField(key_field.name, key_field.dataType, key_field.nullable),
            T.StructField("shuffle_pos", T.LongType(), False),
            T.StructField("shard", T.LongType(), False),
        ]
    )
    key_name = key_field.name

    def add_pos(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base_off = b_off.value[int(pdf["pid"].iloc[0])]
            pos = np.arange(local + 1, local + 1 + len(pdf)) + base_off
            local += len(pdf)
            yield pd.DataFrame(
                {
                    key_name: pdf["k"],
                    "shuffle_pos": pos,
                    "shard": (pos - 1) % n_shards,
                }
            )

    return arranged.mapInPandas(add_pos, schema=out_schema)


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

@register(
    "doc_hash_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 1) = '0'
    """,
    tags=("sampling",),
)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 corpus sample (md5-prefix filter, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs).select("doc_id", "lang", "n_chars")


@register(
    "doc_stratified_sample",
    oracle="""
    SELECT doc_id, lang, sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 40
    """,
    tags=("sampling",),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic cap (40 docs/lang, salted two-phase)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_cap(docs, stratum="lang", k=40)


@register(
    "doc_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id)
             AS shuffle_pos,
           (row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1)
             % 8 AS shard
    FROM documents
    """,
    tags=("sampling",),
)
def doc_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + 8-way sharding (TeraSort pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_shuffle(docs, shards=8)


WEIGHTED_SAMPLE_K = 100


@register(
    "doc_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_tokens, es_key FROM (
      SELECT doc_id,
             CAST(coalesce(len({sql_tokens()}), 0) AS BIGINT) AS n_tokens,
             (round(
                ln(((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)::DOUBLE)
                   / 4294967297.0)
                / greatest(len({sql_tokens()}), 1)
                + 1e-9, 9) + 0.0) AS es_key
      FROM documents
    ) ORDER BY es_key DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
    """,
    tags=("sampling", "weighted", "deterministic"),
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-Res): each document gets key u^(1/w) — here ordered
    by the monotone-equivalent ln(u)/w — with weight w = token count and
    u a md5-derived uniform; the global top-k by key is a weighted
    sample where inclusion probability grows with w. The token-budget
    designer's workhorse: sample documents proportionally to how many
    tokens they contribute, reproducibly.

    Determinism stack (every piece already load-bearing elsewhere):
    md5-uniforms (bit-identical across engines, corpus_mixture_sample),
    dround at 9 dp on the ln() BEFORE ranking (the transcendental-ulp
    discipline from retrieval.py — ln is not correctly rounded, so raw
    keys could flip a rank at the k-boundary), doc_id tie-break, and
    orderBy().limit(k) compiling to TakeOrderedAndProject (per-partition
    partial top-k — the round-4 WindowGroupLimit lesson: no global
    rank window).

    Scale shape: one scan computing row-local keys, one TakeOrdered
    merge of per-partition top-k — no shuffle at all. u ∈ (0,1) strictly
    ((h+1)/(2³²+1)), so ln() is always finite; w floors at 1 so empty
    docs sort last instead of dividing by zero."""
    from newsflow.functions.scalars import dround
    from newsflow.functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    # coalesce both engines to 0 for a null text: Spark's size() returns
    # -1 or NULL depending on legacy conf, DuckDB len() returns NULL —
    # the explicit coalesce removes the cross-engine divergence and the
    # nonsense -1 count (the weight floor then treats empty docs as w=1).
    n_tokens = F.coalesce(F.size(tokens_expr("text")), F.lit(0)).cast("long")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        + 1
    ).cast("double") / F.lit(4294967297.0)
    es_key = dround(
        F.log(u) / F.greatest(n_tokens, F.lit(1)).cast("double"), 9
    )
    return (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            es_key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )
