"""SimHash near-duplicate signatures — constant-size per-document sketch.

64-bit SimHash: each distinct token votes ±1 on every bit position
according to its 64-bit hash; the signature takes the sign of each vote
sum. Near-dups are pairs within a Hamming radius.

Implementation is pure JVM expressions (xxhash64 + bitwise ops + one
explode over 64 bit positions), so it scales as an ordinary aggregation:
shuffle key (doc_id, bit) with map-side partial sums, then one row per doc.

The banded Hamming join uses the pigeonhole principle: signatures within
Hamming distance < b must agree on at least one of b equal-width bands,
so candidates group on (band_index, band_value) instead of comparing all
pairs. The band count derives from the radius (radius 3 → 4×16-bit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from newsflow.functions.text import tokens_expr

N_BITS = 64


def simhash_signatures(docs: DataFrame, bits: str = "xxhash64") -> DataFrame:
    """(doc_id, simhash BIGINT) — 64-bit SimHash over distinct tokens.

    ``bits`` selects the per-token 64-bit source: ``"xxhash64"`` (one
    native hash per token — the cheapest-possible derivation) or
    ``"md5"`` (the engine-shared nibble derivation of
    `dedup/simhash_md5.py`, reproducible in DuckDB SQL, so the WHOLE
    scale plan becomes exactly oracle-checkable; VERDICT r12 Next #4).
    SimHash quality depends only on per-token bit uniformity, so the
    two sources are interchangeable semantically — they differ in hash
    cost and in verifiability.

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
    )
    if bits == "xxhash64":
        tok = tok.withColumn("h", F.xxhash64("tok"))

        def bit(b: int):
            return F.shiftright("h", b).bitwiseAND(F.lit(1))

    elif bits == "md5":
        from newsflow.dedup.simhash_md5 import _nib_expr

        # 16 nibble columns of md5(tok) — one md5 per token row (CSE
        # collapses the 16 references), bit b = bit (b mod 4) of nibble
        # (b div 4): byte-identical to simhash_md5.signatures, so its
        # DuckDB oracle replays this plan's output exactly.
        tok = tok.select(
            "doc_id",
            *[F.expr(_nib_expr(p)).alias(f"nib{p}") for p in range(1, 17)],
        )

        def bit(b: int):
            return F.shiftright(F.col(f"nib{b // 4 + 1}"), b % 4).bitwiseAND(
                F.lit(1)
            )

    else:
        raise ValueError(f"unknown bits source: {bits!r}")
    sums = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(bit(b)).alias(f"b{b}") for b in range(N_BITS)],
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


def _n_bands(max_hamming: int) -> int:
    """Smallest divisor of 64 strictly greater than the radius — the
    pigeonhole needs > max_hamming bands for exactness, and FEWER, WIDER
    bands mean exponentially fewer bucket collisions (16-bit bands have
    65536 values vs 256 for 8-bit), so candidate volume drops sharply as
    the radius tightens."""
    for b in (1, 2, 4, 8, 16, 32, 64):
        if b > max_hamming:
            return b
    raise ValueError("max_hamming must be < 64")


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    bits: str = "xxhash64",
) -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(simhash_a, simhash_b) ≤ radius.

    Default radius 3 is the published operating point for 64-bit SimHash
    near-dup detection on web corpora (Manku, Jain & Das Sarma, WWW'07,
    "Detecting near-duplicates for web crawling"). The band count is
    derived from the radius (radius 3 → 4×16-bit bands, radius 7 →
    8×8-bit), keeping the pigeonhole guarantee exact for any setting.

    Shape (3 small shuffles, signatures computed ONCE):
    1. bucket-grouped pair expansion — group the banded signatures by
       (band, band_val) and expand each >1-doc bucket's sorted member
       array into (i < j) pairs with higher-order functions, instead of
       a self-join that would re-evaluate the signature pipeline per
       side and shuffle both.
    2. the expansion is preceded by a tiny repartition of the bucket
       rows: post-agg data is a few MB so AQE would coalesce to one
       task, serializing the quadratic expansion; spreading |buckets|
       rows buys full-core parallelism for the CPU-heavy stage (a no-op
       cost at real scale, where bucket rows are already thousands of
       splits — same rationale as tables.spread).
    3. NO pair-dedup shuffle: a pair agreeing on several bands would
       come out once per band, so the old form needed a distinct() over
       every band collision. Instead each pair is kept only in its FIRST
       matching band — a pure function of (sig_a XOR sig_b, band), so
       the dedup is a row-local filter and the distinct disappears.

    Skew bound — ENFORCED: a degenerate band value (e.g. near-empty docs
    hashing to band 0) concentrates its bucket on one task whose pair
    expansion materializes |bucket|²/2 structs inside a single row —
    quadratic memory, inherent to every LSH bucket scheme (same bound
    documented at minhash.py). Buckets larger than ``max_bucket`` are
    dropped as "too common to be discriminative" (Manku et al. §4's
    practice; a band value shared by thousands of documents carries no
    near-dup signal — real near-dup cliques that large surface through
    their OTHER bands or the exact-dedup tier first). A 20x stress
    corpus OOM'd an 8 GB heap without the cap; with it the stage is
    bounded at max_bucket²/2 structs per row. Pass ``max_bucket=None``
    for the uncapped exact pigeonhole.
    """
    n_bands = _n_bands(max_hamming)
    band_width = N_BITS // n_bands
    band_mask = (1 << band_width) - 1
    sig = simhash_signatures(docs, bits=bits)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        # A full-width band's mask does not fit a signed BIGINT literal;
        # the single band is just the signature itself (radius 0).
        F.col("simhash")
        if band_width == N_BITS
        else F.expr(f"(simhash >> (band * {band_width})) & {band_mask}"),
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    buckets = (
        banded.groupBy("band", "band_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("m"))
        .filter(F.size("m") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("m") <= max_bucket)
    buckets = buckets.repartition(parallelism)
    pairs = buckets.select(
        "band",
        F.explode(
            F.expr(
                "flatten(transform(m, (x, i) -> "
                "transform(slice(m, i + 2, size(m) - i - 1), "
                "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                "x.simhash AS sig_a, y.simhash AS sig_b))))"
            )
        ).alias("p"),
    ).select("band", "p.*")
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    # Keep each pair only in its FIRST matching band: band == k requires
    # bands 0..k-1 to differ — a row-local predicate replacing distinct().
    conds = []
    for k in range(n_bands):
        c = F.col("band") == k
        for j in range(k):
            c = c & (
                F.expr(
                    f"((sig_a >> {j * band_width}) & {band_mask})"
                    f" != ((sig_b >> {j * band_width}) & {band_mask})"
                )
            )
        conds.append(c)
    keep_first = conds[0]
    for c in conds[1:]:
        keep_first = keep_first | c
    return (
        pairs.withColumn("hamming", F.bit_count(xor))
        .filter((F.col("hamming") <= max_hamming) & keep_first)
        .select("doc_a", "doc_b", "hamming")
    )
