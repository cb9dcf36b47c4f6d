"""SimHash near-duplicate signatures — constant-size per-document sketch.

64-bit SimHash: each distinct token votes ±1 on every bit position
according to its 64-bit hash; the signature takes the sign of each vote
sum. Near-dups are pairs within a Hamming radius.

Implementation is pure JVM expressions (xxhash64 + bitwise ops + one
explode over 64 bit positions), so it scales as an ordinary aggregation:
shuffle key (doc_id, bit) with map-side partial sums, then one row per doc.

The banded Hamming join uses the pigeonhole principle: signatures within
Hamming distance ≤ 7 must agree on at least one of 8 8-bit bands, so the
self-join keys on (band_index, band_value) instead of comparing all pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from newsflow.functions.text import tokens_expr

N_BITS = 64
N_BANDS = 8
BAND_WIDTH = N_BITS // N_BANDS


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) — 64-bit SimHash over distinct tokens."""
    tok = (
        docs.select("doc_id", F.explode(tokens_expr("text")).alias("tok"))
        .distinct()
        .withColumn("h", F.xxhash64("tok"))
    )
    bits = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BITS - 1))).alias("bit"),
        "h",
    ).withColumn(
        # shiftright() only takes a literal shift in the DataFrame API; the
        # SQL operator form accepts a column.
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 7
) -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(simhash_a, simhash_b) ≤ radius.

    max_hamming ≤ 7 guarantees the 8-band pigeonhole join loses no pairs.
    """
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"banded join is exact only for max_hamming < {N_BANDS}"
        )
    sig = simhash_signatures(docs)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"(simhash >> (band * {BAND_WIDTH})) & {(1 << BAND_WIDTH) - 1}"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
