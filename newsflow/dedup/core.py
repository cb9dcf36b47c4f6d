"""Deduplication operators for a 100 TB training-data pipeline.

Four tiers, cheapest first — this is the order a real pipeline applies them:

1. **Exact** (`exact_*`): md5-hash groupBy. One shuffle on the hash; at
   scale the hash is 16 bytes per row vs arbitrarily long text, so the
   shuffle is minimal.
2. **N-gram Jaccard** (`jaccard_pairs`): exact set-similarity via a
   shingle self-join. Correct but O(pairs-sharing-a-shingle) — the
   *oracle* for tier 3, not the scale path itself.
3. **MinHash + LSH** (`minhash.py`): probabilistic candidate generation,
   then exact Jaccard verification of candidates only. The scale path.
4. **SimHash** (`simhash.py`): 64-bit near-dup signatures with
   banded Hamming join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from newsflow.functions.text import shingles_expr, tokens_expr


def with_text_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("text_hash", F.md5(F.col(text_col)))


def exact_duplicate_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical documents (count ≥ 2)."""
    return (
        with_text_hash(docs)
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("dup_count") >= 2)
    )


def exact_dedup_keep_min(docs: DataFrame) -> DataFrame:
    """One row per distinct text, keeping the smallest doc_id.

    min-by-key aggregation (not dropDuplicates, which is
    order-nondeterministic) — deterministic on any cluster.
    """
    return (
        with_text_hash(docs)
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def doc_shingle_arrays(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles ARRAY<STRING>) with per-doc-distinct shingles.

    The set lives as an array column, so building it is a pure projection:
    no explode, no `distinct` shuffle, no collect_list re-group. Consumers
    that need exploded pairs derive them (`doc_shingles`); consumers that
    need set sizes read `size(shingles)` for free.
    """
    toks = docs.select("doc_id", tokens_expr("text").alias("toks"))
    return toks.filter(F.size("toks") >= n).select(
        "doc_id", F.array_distinct(shingles_expr("toks", n)).alias("shingles")
    )


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs, distinct, for docs with ≥ n tokens."""
    return doc_shingle_arrays(docs, n).select(
        "doc_id", F.explode("shingles").alias("s")
    )


def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.9
) -> DataFrame:
    """Directed shingle-containment pairs: C(a→b) = |S_a ∩ S_b| / |S_a|.

    The asymmetric twin of Jaccard — it catches a short document copied
    INTO a longer one (quote inflation, boilerplate wrapping), which
    symmetric Jaccard under-scores because the union is dominated by the
    longer side. Same shuffle profile as ``jaccard_pairs`` (shingle-keyed
    self-join + pair groupBy); directed output, both directions scored.
    Exact and quadratic per shared shingle — at 100 TB this is the
    verification stage behind an LSH candidate generator, same layering
    as minhash.
    """
    arrays = doc_shingle_arrays(docs, n)
    # Directed size |S_a| rides the a-side exploded rows (same
    # carry-the-size restructure as `jaccard_pairs_from_arrays` — one
    # fewer full shingle pass and one fewer join).
    sh_a = arrays.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("s"),
    )
    sh_b = arrays.select("doc_id", F.explode("shingles").alias("s"))
    a = sh_a.alias("a")
    b = sh_b.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.max(F.col("a.n_sh")).alias("n_a"),
        )
    )
    cont = F.col("n_common") / F.col("n_a")
    return (
        common.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_common", "containment")
    )


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (doc_a < doc_b, jac ≥ t).

    Shuffle profile: shingle sets are a projection (no shuffle); the only
    shuffles are the self-join keyed on shingle and the group on the pair
    (set sizes come from `size(shingles)`, not a groupBy). Exact but
    quadratic in per-shingle frequency — at 100 TB run
    `minhash_near_dup_pairs` instead and use this only to verify candidates.
    """
    return jaccard_pairs_from_arrays(doc_shingle_arrays(docs, n), threshold)


def jaccard_pairs_from_arrays(
    arrays: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """`jaccard_pairs` over a pre-built (possibly cached) shingle-array
    frame — lets composite queries (`dedup_lsh_recall_eval`) share ONE
    shingle projection between the exact and LSH pipelines instead of
    computing it per pipeline.

    Set sizes ride the exploded rows (``n_sh`` next to each shingle, an
    int per row) and come out of the pair aggregation as ``max`` —
    functionally dependent on the doc id, so the value is exact. The
    earlier form joined two extra ``(doc_id, n_sh)`` projections back
    on the pair table, which re-derived the arrays (two more full
    tokenize+shingle passes when ``arrays`` is not cached — the r14
    plan audit counted 4 documents scans for this query) and added two
    joins. Guide §2.3/§2.4: fewer passes, fewer shuffles — measured
    4.82 s -> 4.28 s at sf0.1 on the sampled form, identical rows."""
    sh = arrays.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("s"),
    )

    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.max(F.col("a.n_sh")).alias("n_a"),
            F.max(F.col("b.n_sh")).alias("n_b"),
        )
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def shared_span_pairs(
    docs: DataFrame,
    n: int = 20,
    min_shared: int = 5,
    max_gram_df: int = 100,
    hash_grams: bool = False,
) -> DataFrame:
    """SPAN-level near-dup pairs: documents sharing >= ``min_shared``
    distinct ``n``-token grams — the operator behind substring-level
    training-data dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22: long verbatim spans recur across
    otherwise-distinct documents and are what models memorize). Doc-level
    Jaccard misses a 100-token quote inside two long unrelated articles;
    a shared 20-gram cannot occur by chance, so each shared gram is
    evidence of verbatim overlap and ``n_shared_grams`` lower-bounds the
    overlap length (one contiguous span of L tokens yields L - n + 1
    shared grams).

    ``max_gram_df`` drops grams occurring in more than that many
    documents BEFORE pair expansion: such grams are boilerplate
    (navigation, legal footers — `doc_boilerplate_ratio`'s subject), and
    a gram shared by D docs expands D(D-1)/2 pairs — the same
    degenerate-bucket economics as the SimHash/MinHash caps. The cap is
    part of the operator's definition (mirrored in the oracle), not an
    approximation knob: boilerplate spans are noise for this measurement.

    Scale shape: one shingle projection (per-row, no shuffle), one
    explode + gram groupBy (the only corpus-sized shuffle), bucket-local
    pair expansion bounded by ``max_gram_df``, then a pair-keyed count.
    ``hash_grams=True`` is the SCALE knob: group on xxhash64(gram)
    (8 bytes) instead of the ~100-byte 20-token string — an order of
    magnitude less shuffle volume, at a ~2^-64-per-gram-pair collision
    risk. Default False because the registered query's oracle replays
    the string form; tests assert hash-form output == string-form
    output at the check SF (same opt-in pattern as the SimHash
    ``max_bucket`` cap).
    """
    arrays = doc_shingle_arrays(docs, n)
    gram = F.explode("shingles").alias("s")
    if hash_grams:
        grams = arrays.select(
            "doc_id", F.explode(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("s"),
        )
    else:
        grams = arrays.select("doc_id", gram)
    buckets = (
        grams.groupBy("s")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_gram_df))
    )
    pair_expr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
        .select("doc_a", "doc_b", "n_shared_grams")
    )


def span_dedup_rewrite(
    docs: DataFrame,
    n: int = 20,
    max_gram_df: int = 100,
    hash_grams: bool = False,
) -> DataFrame:
    """REMOVAL form of span-level dedup (`shared_span_pairs` finds the
    documents; this rewrites them): every ``n``-token gram occurring in
    2..``max_gram_df`` documents keeps its span only in the KEEPER
    document (min doc_id containing the gram) — all covering token
    positions in every other document are excised. This is the Lee et
    al. ACL'22 substring-dedup rewrite: the duplicated span survives in
    exactly one place, so the training corpus loses the memorizable
    verbatim repeats without dropping whole documents. Grams above
    ``max_gram_df`` are boilerplate and left alone, mirroring
    `shared_span_pairs` (removing navigation chrome is
    `doc_boilerplate_ratio`'s job, with different economics).

    Output, one row per document (rewritten or not): doc_id, n_tokens,
    n_removed_tokens, n_removed_spans (count of maximal merged removed
    intervals — integer-exact, the auditable "how many distinct quotes
    were cut" number), cleaned_text (space-joined surviving tokens, ''
    when everything was removed or the doc was empty).

    Scale shape: a positional gram projection (row-local, CASE-guarded
    like `shingles_expr`), ONE corpus-sized shuffle (distinct + groupBy
    on the gram string for df/keeper stats — the same shuffle
    `shared_span_pairs` pays, and the same xxhash64-the-gram knob
    applies at 100 TB), a gram-keyed join back to occurrences, then a
    doc-keyed collect of removal START positions (bounded by the doc's
    own token count — no corpus-sized state per row) and a single
    doc_id-keyed left join onto the corpus. The rewrite itself is
    row-local: sorted starts fold into disjoint merged intervals
    (adjacent/overlapping [q, q+n-1] windows coalesce), and each token
    checks `exists(intervals)` — O(len x intervals), intervals bounded
    by distinct removed spans, NOT by raw gram hits.

    ``hash_grams=True`` is the SCALE knob (same opt-in pattern and
    verified-equivalence argument as `shared_span_pairs`): the gram
    stats and the occurrence join key on xxhash64(gram) — 8 bytes
    instead of the ~100-byte 20-token string, and the string itself is
    never materialized (only positions flow downstream), at a
    ~2^-64-per-gram-pair collision risk. tests/test_dedup.py asserts
    hash-form output == string-form output at the check SF."""
    empty_starts = F.expr("CAST(array() AS array<int>)")
    toks = docs.select(
        "doc_id",
        F.coalesce(
            tokens_expr("text"), F.expr("CAST(array() AS array<string>)")
        ).alias("t"),
    )
    # Positional grams: (doc_id, pos, s) for every n-token window. The
    # CASE guard is load-bearing for the same InferFiltersFromGenerate +
    # eager-CSE reason as shingles_expr (see functions/text.py).
    gram_expr = f"array_join(slice(t, i, {n}), ' ')"
    if hash_grams:
        gram_expr = f"xxhash64({gram_expr})"
        gram_type = "bigint"
    else:
        gram_type = "string"
    span_structs = F.expr(
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}),"
        f" i -> named_struct('pos', i, 's', {gram_expr})) "
        f"ELSE CAST(array() AS array<struct<pos:int,s:{gram_type}>>) END"
    )
    grams = toks.select("doc_id", F.explode(span_structs).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.s").alias("s")
    )
    stats = (
        grams.select("doc_id", "s")
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("keeper"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_gram_df))
        .select("s", "keeper")
    )
    # collect_set dedups repeat occurrences of the same start inside the
    # doc-keyed aggregation itself — one shuffle on doc_id instead of a
    # (doc_id, pos) distinct exchange followed by the groupBy.
    starts = (
        grams.join(stats, "s")
        .filter(F.col("doc_id") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("starts"))
    )
    # Fold sorted starts into disjoint merged intervals [lo, hi]. Each
    # start covers [q, q+n-1]; because starts ascend, the running last
    # interval's hi is monotone, so "q <= last.hi + 1" is the complete
    # merge condition (adjacent windows coalesce into one span).
    merged = F.aggregate(
        F.col("starts"),
        F.expr("CAST(array() AS array<struct<lo:int,hi:int>>)"),
        lambda acc, q: F.when(
            (F.size(acc) > 0)
            & (q <= F.element_at(acc, -1).getField("hi") + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1).getField("lo").alias("lo"),
                        (q + F.lit(n - 1)).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(q.alias("lo"), (q + F.lit(n - 1)).alias("hi"))
                ),
            )
        ),
    )
    kept = F.filter(
        F.expr("transform(t, (tok, i) -> named_struct('p', i + 1, 'tok', tok))"),
        lambda x: ~F.exists(
            F.col("merged"),
            lambda iv: (iv.getField("lo") <= x.getField("p"))
            & (x.getField("p") <= iv.getField("hi")),
        ),
    )
    return (
        toks.join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce("starts", empty_starts))
        .withColumn("merged", merged)
        .withColumn("kept", kept)
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            (F.size("t") - F.size("kept")).cast("long").alias(
                "n_removed_tokens"
            ),
            F.size("merged").cast("long").alias("n_removed_spans"),
            F.array_join(
                F.expr("transform(kept, x -> x.tok)"), " "
            ).alias("cleaned_text"),
        )
    )
