"""Embedding-cosine near-duplicate detection over `array<float>` columns.

The fifth dedup family from the training-data-pipeline set (exact hash,
MinHash+LSH, SimHash, n-gram Jaccard, and — here — embedding cosine):
two items are near-duplicates when their embedding vectors' cosine
similarity is at or above a threshold.

Two tiers, mirroring `sim/` (knn vs lsh):

* **Exact all-pairs** (`embedding_cosine_pairs`): a self-join on
  ``id_a < id_b`` with the threshold predicate inlined in the join. Spark
  plans this as a broadcast nested-loop join with the whole similarity
  expression inside whole-stage codegen — exact and fully oracle-able.
  This is the right plan when ONE side fits in a broadcast (dedup of a
  candidate shard, a day's crawl against itself); it is quadratic, so it
  is NOT the 100 TB all-corpus plan.
* **LSH-blocked** (`embedding_cosine_pairs_lsh`): the scale path —
  BucketedRandomProjectionLSH over L2-normalized vectors buckets the
  corpus so only colliding pairs are compared (cos ≥ t on the unit
  sphere ⇔ euclidean ≤ sqrt(2−2t), so a euclidean LSH join retrieves
  exactly the cosine-≥t candidates up to LSH recall), then every
  candidate is verified with the EXACT similarity. Linear-ish in
  collisions instead of quadratic; recall measured in tests/test_dedup.py.

Dot products are sequential double folds (JVM-side, no UDF) —
bit-identical to DuckDB's ``list_dot_product(DOUBLE[])``, which is what
makes the exact variant hash-comparable (see sim/knn.py).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.sql import DataFrame

from newsflow.functions.scalars import dround
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr
from newsflow.sim.lsh import _normalized_vectors


def _sides(embeddings: DataFrame) -> tuple[DataFrame, DataFrame]:
    prepped = embeddings.select(
        F.col("vec_id"), as_double_array(F.col("embedding")).alias("vec")
    ).withColumn("nrm", norm_expr(F.col("vec")))
    a = prepped.select(
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = prepped.select(
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return a, b


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.4, round_to: int = 6
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: every (id_a < id_b) with
    cosine(embedding_a, embedding_b) >= threshold.

    The threshold predicate lives in the join condition, so the nested-loop
    join emits only qualifying pairs (no quadratic intermediate row set is
    materialized).
    """
    a, b = _sides(embeddings)
    sim = dot_expr(F.col("vec_a"), F.col("vec_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    # Threshold the ROUNDED similarity: a pair whose raw cosine sits at
    # the boundary within float noise must fall on the same side in
    # Spark and the DuckDB oracle (summation association can differ
    # between engines; the rounded value is what both emit).
    pairs = a.join(
        F.broadcast(b),
        (F.col("id_a") < F.col("id_b"))
        & (dround(sim, round_to) >= F.lit(threshold)),
    )
    return pairs.select(
        "id_a",
        "id_b",
        dround(
            dot_expr(F.col("vec_a"), F.col("vec_b"))
            / (F.col("nrm_a") * F.col("nrm_b")),
            round_to,
        ).alias("cosine_sim"),
    )


def embedding_cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    bucket_length: float = 0.1,
    num_hash_tables: int = 10,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """LSH-blocked embedding near-dup pairs (the at-scale variant).

    approxSimilarityJoin on unit vectors prunes to colliding pairs; the
    exact cosine is then recomputed from the euclidean distance
    (cos = 1 − d²/2 on the unit sphere), so PRECISION is exact — only
    RECALL is approximate (a qualifying pair is missed iff it collides in
    none of the hash tables).

    ``bucket_length`` sizes each table's scalar-projection buckets; unit
    vectors project to N(0,1), so 0.5-wide buckets collide constantly
    and the 10-table OR-union degenerates toward the quadratic self-join
    (measured at 20k vectors: >10 min / GC thrash at 0.5, 95 s at 0.1
    with identical sf0.01 output and 97% of the sf0.1 pairs — recall
    floor 0.9 still cleared with margin). MLlib's API is OR-only (no
    AND-composition within a table), so bucket width is the ONLY
    per-table selectivity knob; the native banded sign-LSH tier
    (sim/hyperplane.py, dedup/minhash.py) remains the preferred scale
    path precisely because it AND-composes bits into bands.
    """
    unit = _normalized_vectors(embeddings, "vec_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit)
    dist_threshold = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    joined = model.approxSimilarityJoin(
        unit, unit, dist_threshold, distCol="euclid"
    ).select(
        F.col("datasetA.vec_id").alias("id_a"),
        F.col("datasetB.vec_id").alias("id_b"),
        F.col("euclid"),
    ).filter(F.col("id_a") < F.col("id_b"))
    sim = F.lit(1.0) - (F.col("euclid") * F.col("euclid")) / 2.0
    return joined.filter(dround(sim, round_to) >= F.lit(threshold)).select(
        "id_a", "id_b", dround(sim, round_to).alias("cosine_sim")
    )
