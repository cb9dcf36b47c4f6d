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
    """(doc_id, simhash BIGINT) — 64-bit SimHash over distinct tokens.

    One shuffle, no row blowup: per-doc token dedup is row-local
    (`array_distinct` before the explode — no `distinct` shuffle), and
    the 64 per-bit vote sums run as 64 columnar partial aggregates in a
    SINGLE hash aggregation keyed on doc_id (map-side combine, whole-
    stage codegen). The signature then folds row-locally. The previous
    formulation exploded |tokens| x 64 vote rows through TWO hash
    aggregations — 64x the shuffle volume for the same math. (A fully
    row-local nested higher-order-function form was measured 2.3x
    slower than this: nested lambdas drop out of codegen into
    interpreted evaluation.) `+bit votes > 0` is equivalent to
    `2 x popcount(bit) > n_tokens`, the form computed here.
    """
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_expr("text"))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    sums = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(N_BITS)
        ],
    )
    sig = None
    for b in range(N_BITS):
        # bit 63 is the sign bit: its weight in a signed 64-bit signature
        # is -(2^63) (two's complement), matching shiftleft(1L, 63).
        weight = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(
            2 * F.col(f"b{b}") > F.col("n"), F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.alias("simhash"))


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
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
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
        # Hamming check BEFORE the pair dedup: the check is a pure
        # function of the pair, so filter-then-distinct == distinct-then-
        # filter — but the filter runs map-side in the join output, so
        # the distinct shuffles only true near-dups instead of every
        # band collision (15.8M collision rows vs a handful of pairs on
        # the sf0.1 corpus — the distinct was the dominant cost).
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )
