"""Property tests for the round-3 second-wave operators: the
closed-form water-filling allocator against a straight iterative
reference, and the md5-SimHash signature against a pure-Python
transcription. One Spark DataFrame per example keeps job count low."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

SETTINGS = settings(max_examples=10, deadline=None)


# --- Water-filling reference: iteratively raise the level ------------------


def _ref_waterfill(sizes: dict[str, int], budget: int) -> dict[str, int]:
    """Greedy reference: repeatedly give the smallest remaining source
    its full size if the fair share allows, else cap everyone left at
    the integer water level."""
    alloc: dict[str, int] = {}
    remaining = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    left = budget
    while remaining:
        name, n = remaining[0]
        share = left // len(remaining)
        if n <= share:
            alloc[name] = n
            left -= n
            remaining.pop(0)
        else:
            level = left // len(remaining)
            for name, n in remaining:
                alloc[name] = min(n, level)
            break
    return alloc


_sizes = st.dictionaries(
    keys=st.sampled_from([f"s{i}" for i in range(12)]),
    values=st.integers(min_value=0, max_value=500),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(sizes=_sizes, budget=st.integers(min_value=0, max_value=3000))
def test_waterfill_matches_iterative_reference(spark, sizes, budget):
    """The engine's closed-form (rank / prefix-sum / cutoff) waterfill
    must equal the iterative raise-the-level reference on arbitrary
    instances — run through the same Spark column logic on a synthesized
    sizes frame."""
    import newsflow.corpus as corpus

    rows = [(k, v) for k, v in sizes.items()]
    sdf = spark.createDataFrame(rows, "source string, n_tokens long")
    from pyspark.sql.window import Window

    w = Window.orderBy("n_tokens", "source")
    ranked = sdf.select(
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
    cut = ranked.filter(
        F.col("n_tokens") * (F.col("n_src") - F.col("rk") + 1)
        + F.col("prefix")
        <= budget
    ).agg(
        F.coalesce(F.max("rk"), F.lit(0)).cast("bigint").alias("c"),
        F.coalesce(F.max(F.col("prefix") + F.col("n_tokens")), F.lit(0))
        .cast("bigint")
        .alias("full_sum"),
    )
    alloc = F.when(F.col("rk") <= F.col("c"), F.col("n_tokens")).otherwise(
        F.least(
            F.col("n_tokens"),
            F.expr(f"CAST(({budget} - full_sum) DIV (n_src - c) AS BIGINT)"),
        )
    )
    got = {
        r.source: r.allocated
        for r in ranked.crossJoin(F.broadcast(cut))
        .select("source", alloc.alias("allocated"))
        .collect()
    }
    assert got == _ref_waterfill(sizes, budget)


# --- md5-SimHash signature reference ---------------------------------------


def _ref_simhash_bands(texts: dict[int, str]) -> dict[int, tuple[int, ...]]:
    import re

    out = {}
    for doc_id, text in texts.items():
        toks = sorted(
            {w for w in re.split(r"[^a-z0-9]+", text.lower()) if w}
        )
        if not toks:
            continue
        votes = [0] * 64
        for t in toks:
            hx = hashlib.md5(t.encode()).hexdigest()
            for b in range(64):
                nib = int(hx[b // 4], 16)
                votes[b] += (nib >> (b % 4)) & 1
        n = len(toks)
        bits = [1 if 2 * v > n else 0 for v in votes]
        bands = tuple(
            sum(bits[k * 16 + m] << m for m in range(16)) for k in range(4)
        )
        out[doc_id] = bands
    return out


_texts = st.dictionaries(
    keys=st.integers(min_value=0, max_value=9),
    values=st.text(
        alphabet="abc XYZ012.,", min_size=0, max_size=40
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(texts=_texts)
def test_simhash_md5_signatures_match_python(spark, texts):
    from newsflow.dedup import simhash_md5

    sdf = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in simhash_md5.signatures(sdf).collect()
    }
    assert got == _ref_simhash_bands(texts)
