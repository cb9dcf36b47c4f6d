"""Determinism properties of the sampling/reshaping operators: results
must be invariant to input partitioning (the property that makes them
safe for retries and incremental backfills at 100 TB)."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.ops.sampling import corpus_shuffle, hash_sample, stratified_cap
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_corpus_shuffle_partition_invariant(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    base = _rows(corpus_shuffle(docs, shards=8), "doc_id", "shuffle_pos", "shard")
    # Repartitioned input, different parallelism: identical positions.
    scrambled = docs.repartition(13, "lang")
    alt = _rows(
        corpus_shuffle(scrambled, shards=8, num_partitions=5),
        "doc_id",
        "shuffle_pos",
        "shard",
    )
    assert base == alt
    # Positions are a permutation 1..N and shards are balanced round-robin.
    n = len(base)
    assert sorted(p for _, p, _ in base) == list(range(1, n + 1))
    shard_counts = {}
    for _, _, s in base:
        shard_counts[s] = shard_counts.get(s, 0) + 1
    assert max(shard_counts.values()) - min(shard_counts.values()) <= 1


def test_stratified_cap_equals_plain_window(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    plain = (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 40)
        .select("doc_id", "lang", "sample_rank")
    )
    fast = stratified_cap(docs, stratum="lang", k=40)
    assert _rows(plain, "doc_id", "lang", "sample_rank") == _rows(
        fast, "doc_id", "lang", "sample_rank"
    )


def test_hash_sample_composable(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    once = hash_sample(docs, hex_digits=1, keep_prefixes=("0",))
    # Sampling the sample with the *second* hex digit composes independently.
    twice = once.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1).isin("0", "1")
    )
    n0, n1, n2 = docs.count(), once.count(), twice.count()
    assert 0 < n1 < n0
    assert 0 <= n2 < n1


def test_weighted_sample_favors_heavy_docs(spark):
    """Efraimidis-Spirakis semantics: selection probability grows with
    weight — the sampled set's mean token count must exceed the corpus
    mean, and the plan must be a TakeOrderedAndProject (no shuffle)."""
    import pyspark.sql.functions as F

    from newsflow.functions.text import tokens_expr
    from newsflow.ops.sampling import doc_weighted_sample
    from newsflow.tables import load_table
    from tests.conftest import SF_ORACLE

    sample = doc_weighted_sample(spark, SF_ORACLE)
    plan = sample._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    mean_sample = sample.agg(F.avg("n_tokens")).first()[0]
    mean_corpus = (
        load_table(spark, SF_ORACLE, "documents")
        .agg(F.avg(F.size(tokens_expr("text"))))
        .first()[0]
    )
    assert mean_sample > mean_corpus * 1.1, (mean_sample, mean_corpus)
    # reproducibility: two independent builds pick the identical set
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(r.doc_id for r in doc_weighted_sample(spark, SF_ORACLE).collect())
    assert a == b and len(a) == 100
