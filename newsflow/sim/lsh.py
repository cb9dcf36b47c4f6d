"""LSH-bucketed approximate nearest neighbors — the scale path when both
the corpus AND the query set are too large to broadcast.

BucketedRandomProjectionLSH (pyspark.ml, fixed seed) over L2-normalized
vectors: on the unit sphere, euclidean distance is a monotone transform of
cosine similarity (d² = 2 − 2·cos), so a euclidean LSH join with threshold
``sqrt(2 - 2·min_cos)`` retrieves exactly the cosine-≥min_cos candidates
(up to LSH recall). Candidates are then re-ranked with exact cosine.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround
from newsflow.sim.knn import as_double_array, dot_expr, norm_expr


def _normalized_vectors(embeddings: DataFrame, id_alias: str) -> DataFrame:
    vec = as_double_array(F.col("embedding"))
    df = embeddings.select(
        F.col("vec_id").alias(id_alias), vec.alias("vec")
    ).withColumn("nrm", norm_expr(F.col("vec")))
    unit = F.transform(F.col("vec"), lambda x: x / F.col("nrm"))
    return df.select(
        id_alias, array_to_vector(unit).alias("features")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    min_cosine: float = 0.5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 6,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k via euclidean LSH on unit vectors.

    Output contract matches `knn.cosine_topk` (query_id, neighbor_id,
    cosine_sim) but retrieval is approximate: a neighbor is found only if
    it collides with the query in ≥1 hash table AND has cosine ≥
    min_cosine. tests/test_sim.py measures recall against brute force.
    """
    corpus = _normalized_vectors(embeddings, "neighbor_id")
    qs = _normalized_vectors(queries, "query_id")

    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(corpus)
    dist_threshold = math.sqrt(max(0.0, 2.0 - 2.0 * min_cosine))
    pairs = model.approxSimilarityJoin(
        qs, corpus, dist_threshold, distCol="euclid"
    ).select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        F.col("euclid"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))

    # Exact re-rank: cos = 1 - d²/2 on unit vectors.
    sims = pairs.withColumn(
        "sim", F.lit(1.0) - (F.col("euclid") * F.col("euclid")) / 2.0
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
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
