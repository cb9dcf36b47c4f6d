"""Oracle-able SimHash twin: identical voting/banding/pigeonhole math to
``dedup/simhash.py`` but with the per-token 64 bits drawn from md5
(available in BOTH engines) instead of xxhash64 (Spark-only).

Layering: the xxhash64 tier stays the SCALE path (one cheap hash per
token, bucket-grouped pair expansion); this tier exists so the SimHash
ALGORITHM — majority voting, band decomposition, first-matching-band
dedup, radius-3 pigeonhole — is verified end-to-end by the exact DuckDB
oracle rather than only by the pure-Python reference test. Every
operation is integer arithmetic (nibble lookup, shifts, masks,
popcount), which both engines compute exactly, so no rounding machinery
is needed anywhere.

Bit derivation: the first 16 hex chars of md5(token) give 16 nibbles;
bit b (0..63) is bit (b mod 4) of nibble (b div 4). Votes are the 64
columnar partial sums of the xxhash64 tier (single hash aggregation,
map-side combine); band k's value packs the 16 majority bits [16k,
16k+16) into an integer < 2^16, so no 64-bit sign games and no overflow
in either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from newsflow.functions.text import sql_tokens, tokens_expr

N_BITS = 64
N_BANDS = 4
BAND_WIDTH = 16
RADIUS = 3

_HEX = "0123456789abcdef"


def _nib_expr(p: int) -> str:
    """Engine-shared SQL text: value (0..15) of hex char ``p`` (1-based)
    of md5(tok)."""
    return f"(instr('{_HEX}', substr(md5(tok), {p}, 1)) - 1)"


def signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, n, b0..b3) — banded md5-SimHash signatures.

    Same shuffle shape as simhash.simhash_signatures: the explode over
    distinct tokens feeds ONE hash aggregation keyed on doc_id with 64
    columnar vote sums; nibble extraction and band packing are row-local.
    """
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_expr("text"))).alias("tok"),
    )
    nibs = tok.select(
        "doc_id",
        *[F.expr(_nib_expr(p)).alias(f"nib{p}") for p in range(1, 17)],
    )
    votes = nibs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.shiftright(F.col(f"nib{b // 4 + 1}"), b % 4).bitwiseAND(
                    F.lit(1)
                )
            ).alias(f"s{b}")
            for b in range(N_BITS)
        ],
    )
    band_cols = []
    for k in range(N_BANDS):
        val = None
        for m in range(BAND_WIDTH):
            b = k * BAND_WIDTH + m
            term = F.when(2 * F.col(f"s{b}") > F.col("n"), F.lit(1 << m)).otherwise(
                F.lit(0)
            )
            val = term if val is None else val + term
        band_cols.append(val.cast("bigint").alias(f"b{k}"))
    return votes.select("doc_id", "n", *band_cols)


def near_dup_pairs(docs: DataFrame, max_hamming: int = RADIUS) -> DataFrame:
    """(doc_a, doc_b, hamming) within the radius — banded pigeonhole
    join (a pair within Hamming {RADIUS} must agree on ≥ 1 of the 4
    16-bit bands), first-matching-band filter instead of a distinct."""
    sig = signatures(docs)
    banded = sig.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
    ).withColumn(
        "bv",
        F.expr("CASE band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).filter(
        # keep the pair only in its FIRST matching band (row-local, no
        # distinct): no earlier band may also match
        ~((F.col("a.band") > 0) & (F.col("a.b0") == F.col("b.b0")))
        & ~((F.col("a.band") > 1) & (F.col("a.b1") == F.col("b.b1")))
        & ~((F.col("a.band") > 2) & (F.col("a.b2") == F.col("b.b2")))
    )
    ham = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(N_BANDS)
    ).cast("bigint")
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def oracle_sql(max_hamming: int = RADIUS) -> str:
    """Exact DuckDB twin — integer arithmetic end-to-end."""
    nib = (
        lambda p: f"(instr('{_HEX}', substr(md5(t), {p}, 1)) - 1)"
    )
    vote_exprs = ",\n         ".join(
        f"sum(({nib(b // 4 + 1)} >> {b % 4}) & 1) AS s{b}"
        for b in range(N_BITS)
    )
    band_exprs = []
    for k in range(N_BANDS):
        terms = " + ".join(
            f"(CASE WHEN 2 * s{k * BAND_WIDTH + m} > n THEN {1 << m} ELSE 0 END)"
            for m in range(BAND_WIDTH)
        )
        band_exprs.append(f"CAST({terms} AS BIGINT) AS b{k}")
    bands = ",\n         ".join(band_exprs)
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(N_BANDS))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t
  FROM (SELECT doc_id, unnest({sql_tokens()}) AS t FROM documents)
),
votes AS (
  SELECT doc_id, count(*) AS n,
         {vote_exprs}
  FROM tok GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         {bands}
  FROM votes
),
banded AS (
  SELECT doc_id, b0, b1, b2, b3, u.band,
         CASE u.band WHEN 0 THEN b0 WHEN 1 THEN b1
                     WHEN 2 THEN b2 ELSE b3 END AS bv
  FROM sigs, unnest(range({N_BANDS})) AS u(band)
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST({ham} AS BIGINT) AS hamming
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
  WHERE NOT (a.band > 0 AND a.b0 = b.b0)
    AND NOT (a.band > 1 AND a.b1 = b.b1)
    AND NOT (a.band > 2 AND a.b2 = b.b2)
) WHERE hamming <= {max_hamming}
"""
