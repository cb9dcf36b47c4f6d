"""Tokenizer TRAINING as an oracled query: deterministic byte-pair-
encoding merge learning (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016) over the documents table —
the vocabulary-construction step of every LLM data pipeline, here with
every stage integer-exact and replayed by DuckDB.

Algorithm (the standard word-count-weighted trainer): tokenize the
corpus into words with counts; represent each word as a spaced symbol
string (' h a s h '); for each of ``BPE_MERGES`` steps, count adjacent
symbol pairs weighted by word count, take the argmax pair under the
deterministic (count DESC, lhs ASC, rhs ASC) order, and rewrite every
occurrence via non-overlapping left-to-right string replacement
(' h a ' → ' ha ') — `replace()` has IDENTICAL semantics in Spark and
DuckDB, which is what makes the whole trainer oracle-able.

Documented variant: single-pass non-overlapping replacement diverges
from textbook greedy BPE wherever occurrences of the merged pair share
a boundary in the spaced form — runs of >= 3 identical symbols (replace
merges alternately, greedy compactly) AND consecutive occurrences of
the pair itself, L R L R (e.g. 'banana' for merge (a, n): replace
merges only the first, greedy merges both). The two coincide iff the
merged pair never occurs twice in a row in any word's current
segmentation — asserted per merge step for the check corpus in
tests/test_bpe.py (plus char-level static screens) — and trainer and
oracle agree ALWAYS, divergence or no, since both use replace().

Scale shape: the corpus pays ONE tokenize + explode + groupBy(word);
every iteration then runs on the VOCABULARY-sized word table (cached —
vocab x avg-word-length state): one pair explode + groupBy(lhs, rhs)
(map-side combined, vocab-bounded) and a 1-row argmax collect. This is
exactly how production BPE trainers are structured (word counts, not
corpus rescans); 8 merges here, thousands at 100 TB — same shape, the
iteration state never grows with the corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.text import sql_tokens, tokens_expr
from newsflow.registry import register
from newsflow.tables import load_table, local_df, spread

BPE_MERGES = 8


def _word_symbols(docs: DataFrame) -> DataFrame:
    """(word, cnt, s): corpus word counts with the spaced initial
    symbol string (' h a s h ')."""
    words = (
        docs.select(F.explode(tokens_expr("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spaced = F.concat(
        F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")
    )
    return words.select("word", "cnt", spaced.alias("s"))


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = F.split(F.trim(F.col("s")), " ")
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> named_struct('lhs', syms[i - 1], 'rhs', syms[i]))"
    )
    return (
        words.select("cnt", syms.alias("syms"))
        .filter(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def bpe_fit(docs: DataFrame) -> tuple[list[tuple], DataFrame]:
    """Run ``BPE_MERGES`` merge-learning steps. Returns the merge table
    rows [(step, lhs, rhs, pair_count)] and the final (word, cnt, s)
    frame (the trained segmentation)."""
    words = _word_symbols(docs).cache()
    merges: list[tuple] = []
    for step in range(1, BPE_MERGES + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted adjacent pairs after {step - 1} merges"
            )
        lhs, rhs, pc = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
        merges.append((step, lhs, rhs, int(pc)))
        words = words.withColumn(
            "s",
            F.expr(
                f"replace(s, ' {lhs} {rhs} ', ' {lhs}{rhs} ')"
            ),
        )
    return merges, words


def _bpe_ctes_sql() -> str:
    """Unrolled merge-learning chain: w0 → (pairs1, m1, w1) → … —
    each step's argmax is a 1-row relation cross-joined into the next
    rewrite, mirroring the driver-collected literal in `bpe_fit`."""
    parts = [
        f"""toks AS (
      SELECT unnest({sql_tokens("text")}) AS word FROM documents
    ),
    w0 AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt,
             ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s
      FROM toks GROUP BY word
    )"""
    ]
    for i in range(1, BPE_MERGES + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""pairs{i} AS (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(sum(cnt) AS BIGINT) AS pair_count
      FROM (SELECT cnt, string_split(trim(s), ' ') AS syms FROM {prev}),
           UNNEST(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2
    ),
    m{i} AS (
      SELECT lhs, rhs, pair_count FROM pairs{i}
      ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    ),
    w{i} AS (
      SELECT word, cnt,
             replace(s, ' ' || m{i}.lhs || ' ' || m{i}.rhs || ' ',
                     ' ' || m{i}.lhs || m{i}.rhs || ' ') AS s
      FROM {prev}, m{i}
    )"""
        )
    return ",\n    ".join(parts)


def bpe_merge_table_oracle_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, pair_count FROM m{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return f"""
    WITH {_bpe_ctes_sql()}
    {selects}
    """


def bpe_word_segments_oracle_sql() -> str:
    return f"""
    WITH {_bpe_ctes_sql()}
    SELECT word, cnt,
           CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_symbols,
           trim(s) AS segmented
    FROM w{BPE_MERGES}
    """


@register(
    "bpe_merge_table",
    oracle=bpe_merge_table_oracle_sql(),
    tags=("ml", "tokenizer", "iterative"),
)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: (step, lhs, rhs, pair_count) for
    {BPE_MERGES} merges — tokenizer training as a query, O(merges)
    driver state collected from vocabulary-sized distributed
    aggregations (see module docstring)."""
    merges, _ = bpe_fit(spread(load_table(spark, sf_dir, "documents")))
    return local_df(
        spark, merges, "step long, lhs string, rhs string, pair_count long"
    )


@register(
    "bpe_word_segments",
    oracle=bpe_word_segments_oracle_sql(),
    tags=("ml", "tokenizer", "iterative"),
)
def bpe_word_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final subword segmentation of every vocabulary word after the
    {BPE_MERGES} learned merges: (word, cnt, n_symbols, segmented) —
    what the trained tokenizer does to the corpus, distributed over
    the vocabulary table."""
    _, words = bpe_fit(spread(load_table(spark, sf_dir, "documents")))
    return words.select(
        "word",
        "cnt",
        F.size(F.split(F.trim("s"), " ")).cast("long").alias("n_symbols"),
        F.trim("s").alias("segmented"),
    )


@register(
    "bpe_encode_corpus",
    # Apply path oracle: the same unrolled training chain yields the
    # final per-word segmentation (w{BPE_MERGES}); encoding is then a
    # doc-side word explode joined against that vocabulary lookup.
    oracle=f"""
    WITH {{ctes}},
    seg AS (
      SELECT word,
             CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sub
      FROM w{BPE_MERGES}
    ),
    dw AS (
      SELECT doc_id, unnest({sql_tokens("text")}) AS word FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(seg.n_sub) AS BIGINT) AS n_bpe_tokens,
           (round(sum(seg.n_sub)::DOUBLE / count(*) + 1e-9, 4) + 0.0)
             AS subwords_per_word
    FROM dw JOIN seg USING (word)
    GROUP BY doc_id
    """.format(ctes=_bpe_ctes_sql()),
    tags=("ml", "tokenizer", "iterative"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the trained tokenizer — the apply path
    that makes BPE training useful: per document, word count, total
    subword-token count under the {BPE_MERGES} learned merges, and the
    fertility ratio (subwords per word — the number tokenizer teams
    track across corpora/languages).

    Scale shape: this is exactly how production tokenizers deploy —
    the trained segmentation is a VOCABULARY-sized lookup table
    (word → n_subwords), broadcast against the corpus's exploded word
    stream; the corpus pays one explode + one broadcast join + one
    doc-keyed aggregation, and the training cost amortizes across
    every encode run. No per-document merge replay."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    _, words = bpe_fit(docs)
    seg = words.select(
        "word",
        F.size(F.split(F.trim("s"), " ")).cast("long").alias("n_sub"),
    )
    dw = docs.select("doc_id", F.explode(tokens_expr("text")).alias("word"))
    return (
        dw.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
            (
                F.round(
                    F.sum("n_sub").cast("double") / F.count(F.lit(1))
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("subwords_per_word"),
        )
    )
