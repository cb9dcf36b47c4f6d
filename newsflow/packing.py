"""Length-aware sequence packing: first-fit-decreasing (FFD) bin
packing of whole documents into fixed-capacity training sequences —
the padding-minimizing alternative to `corpus_pack_sequences`' fixed
token windows (which never pad but SPLIT documents across sequence
boundaries; cf. Krell et al., "Efficient Sequence Packing without
Cross-contamination", 2021).

Algorithm (classic FFD, per shard): documents sort by (n_tokens DESC,
doc_id ASC); each doc goes into the FIRST open sequence with enough
remaining capacity, else opens a new one. Deterministic given the sort
order, so every form replays it exactly: the shipped Spark path is an
Arrow-batched ``applyInPandas`` per shard (mutate-in-place first-fit,
O(n·bins)); a pure-JVM ``aggregate``-fold twin is kept as the UDF-free
reference; and the DuckDB oracle replays the identical fold as a
recursive CTE carrying the open-bin remainders as a list column.

Why the UDF wins HERE (multi-scale measurement, the r6 lesson applied
in reverse): Catalyst arrays are immutable, so the JVM fold copies
both state arrays every step — O(n²) per shard. At sf0.1
(300 docs/shard) that is 0.5 s and invisible; at sf1 (3000/shard) it
is a 15.9 s wall (30× for 10× data). The Arrow form moves only
(doc_id, n_tokens, shard) ints — never text — over the same
groupBy(shard) exchange the fold needed anyway, and packs each shard
with a mutable list: 10×-data cost tracks ~10×. "UDFs are the slow
path" is a heuristic about per-row interpreter crossings, not a law
about sequential stateful folds.

Scale shape: per-shard cost is the sequential first-fit scan itself
(inherent). At 100 TB you raise the shard count with the cluster (as
`corpus_pack_sequences` already documents), so shards stay bounded and
pack in parallel; packing quality is per-shard FFD either way. Docs
longer than ``SEQ_LEN`` open a sequence of their own (negative
remainder — never reused), and are reported as ``split_docs`` by the
waste report, since a real exporter must truncate or split exactly
those.

Reference parity: no counterpart in the reference (its ETL stops at
report CSVs); scale-mandated extension of the curation→export chain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.curation import (
    N_PACK_SHARDS,
    SEQ_LEN,
    pack_shard_expr,
    sql_pack_shard,
)
from newsflow.functions.scalars import sql_dround
from newsflow.functions.text import sql_tokens
from newsflow.registry import register

_FIT = "array_position(transform(s.bins, b -> b >= d.n_tokens), true)"

#: FFD fold over one shard's sorted doc list: state = (open-bin
#: remainders, assignments so far). `array_position(..., true)` is the
#: first-fit probe (0 = nothing fits -> open a new bin).
_FFD_FOLD = f"""
aggregate(
  docs,
  named_struct(
    'bins', cast(array() as array<bigint>),
    'assigns',
    cast(array() as array<struct<doc_id:bigint,n_tokens:bigint,bin_idx:int>>)),
  (s, d) -> CASE
    WHEN {_FIT} = 0 THEN named_struct(
      'bins', concat(s.bins, array({SEQ_LEN} - d.n_tokens)),
      'assigns', concat(s.assigns, array(named_struct(
        'doc_id', d.doc_id, 'n_tokens', d.n_tokens,
        'bin_idx', cast(size(s.bins) + 1 as int)))))
    ELSE named_struct(
      'bins', concat(
        slice(s.bins, 1, cast({_FIT} as int) - 1),
        array(element_at(s.bins, cast({_FIT} as int)) - d.n_tokens),
        slice(s.bins, cast({_FIT} as int) + 1,
              size(s.bins) - cast({_FIT} as int))),
      'assigns', concat(s.assigns, array(named_struct(
        'doc_id', d.doc_id, 'n_tokens', d.n_tokens,
        'bin_idx', cast({_FIT} as int)))))
  END
).assigns
"""

_SQL_TOKS = f"""
  SELECT doc_id, len({sql_tokens()}) AS n_tokens,
         {sql_pack_shard()} AS shard
  FROM documents
"""

def sql_ffd_ctes(src: str = "toks", p: str = "") -> str:
    """DuckDB replay of the same fold, as a reusable CTE chain: one
    recursive step per shard rank, bins carried as a BIGINT[] column,
    first-fit via list_position over a boolean list_transform — the
    exact twin of `_FIT`. ``src`` is the (doc_id, n_tokens, shard)
    relation to pack; ``p`` prefixes the CTE names so two FFD replays
    (e.g. before/after a takedown) can coexist in one WITH RECURSIVE
    block. Exposes ``{p}assigns`` (shard, doc_id, n_tokens, bin_idx)."""
    return f"""
{p}ranked AS (
  SELECT doc_id, n_tokens, shard,
         row_number() OVER (
           PARTITION BY shard ORDER BY n_tokens DESC, doc_id
         ) AS r
  FROM {src}
),
{p}ffd AS (
  SELECT shard, 0::BIGINT AS r, NULL::BIGINT AS doc_id,
         NULL::BIGINT AS n_tokens, NULL::BIGINT AS bin_idx,
         CAST([] AS BIGINT[]) AS bins
  FROM (SELECT DISTINCT shard FROM {p}ranked)
  UNION ALL
  SELECT d.shard, d.r, d.doc_id, d.n_tokens,
         CASE WHEN l.fit = 0 THEN len(s.bins) + 1 ELSE l.fit END,
         CASE WHEN l.fit = 0
              THEN list_append(s.bins, {SEQ_LEN} - d.n_tokens)
              ELSE list_concat(
                     list_concat(s.bins[1:l.fit-1],
                                 [s.bins[l.fit] - d.n_tokens]),
                     s.bins[l.fit+1:])
         END
  FROM {p}ffd s
  JOIN {p}ranked d ON d.shard = s.shard AND d.r = s.r + 1,
  LATERAL (SELECT coalesce(list_position(
             list_transform(s.bins, b -> b >= d.n_tokens), true), 0)
           AS fit) l
),
{p}assigns AS (
  SELECT shard, doc_id, n_tokens, bin_idx FROM {p}ffd
  WHERE doc_id IS NOT NULL
)
"""


_SQL_FFD_ASSIGNS = sql_ffd_ctes()


def _ffd_assigns_jvm(toks: DataFrame) -> DataFrame:
    """The pure-JVM ``aggregate``-fold form of `_ffd_assigns` — kept as
    the UDF-free reference implementation and for the negative result
    it measures: Catalyst arrays are immutable, so every fold step
    copies both state arrays, making the fold O(n²) in shard size.
    Measured: 0.5 s at sf0.1 (300 docs/shard) but 15.9 s at sf1
    (3000/shard) — a 30× wall for 10× data. The Arrow form below is
    the shipped path; this one pins its semantics in tests."""
    g = toks.groupBy("shard").agg(
        F.expr(
            "array_sort(collect_list("
            "struct(-n_tokens as neg, doc_id, n_tokens)))"
        ).alias("sorted"),
    )
    g = g.select(
        "shard",
        F.expr(
            "transform(sorted, x -> named_struct("
            "'doc_id', x.doc_id, 'n_tokens', x.n_tokens))"
        ).alias("docs"),
    )
    return g.select("shard", F.explode(F.expr(_FFD_FOLD)).alias("a")).select(
        "shard",
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.n_tokens").alias("n_tokens"),
        F.col("a.bin_idx").cast("long").alias("bin_idx"),
    )


def _ffd_assigns(toks: DataFrame) -> DataFrame:
    """(shard, doc_id, n_tokens, bin_idx) FFD assignments from a
    (doc_id, n_tokens, shard) frame.

    Shipped as an Arrow-batched ``applyInPandas`` per shard — one of
    the rare spots where the Python path BEATS the JVM expression:
    first-fit is a sequential mutate-in-place scan (O(n·bins) with a
    mutable list), while the `aggregate`-fold twin above pays an O(n²)
    immutable-array copy per step (measured 30× slower at sf1). Only
    (doc_id, n_tokens, shard) ints cross the Arrow boundary — never
    text — and each shard is one batch, so the exchange is the same
    groupBy(shard) the fold needed anyway. Semantics are pinned to the
    JVM twin and the recursive-CTE oracle by tests/test_packing.py."""
    import pandas as pd

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        bins: list[int] = []
        out = []
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] = rem - n
                    out.append(i + 1)
                    break
            else:
                bins.append(SEQ_LEN - n)
                out.append(len(bins))
        pdf = pdf.assign(bin_idx=out)
        return pdf[["shard", "doc_id", "n_tokens", "bin_idx"]]

    return toks.groupBy("shard").applyInPandas(
        ffd, "shard long, doc_id long, n_tokens long, bin_idx long"
    )


def ffd_pack_docs(docs: DataFrame) -> DataFrame:
    """The persisted FFD pack table for a (doc_id, text, ...) corpus:
    (shard, doc_id, n_tokens, bin_idx), one row per document. This is
    the artifact `persist_ffd_packs` stores and
    `takedown.takedown_repack_ffd` maintains under deletion — the
    packed-layout twin of `corpus_pack_sequences`' offset table. FFD is
    deterministic given the (n_tokens DESC, doc_id) sort, so a dirty
    shard can always be rebuilt from its surviving (doc_id, n_tokens)
    rows alone — no text re-scan."""
    from newsflow.functions.text import tokens_expr

    toks = docs.select(
        "doc_id",
        F.size(tokens_expr("text")).cast("long").alias("n_tokens"),
        pack_shard_expr().alias("shard"),
    )
    return _ffd_assigns(toks)


def persist_ffd_packs(spark: SparkSession, docs: DataFrame, path: str) -> int:
    """Materialize `ffd_pack_docs` hive-partitioned by shard — the
    layout takedown needs: a delete-list dirties only the shards its
    docs hash to, and only those partitions are ever rewritten. Returns
    the row count written."""
    assigns = ffd_pack_docs(docs).localCheckpoint(eager=True)
    assigns.write.mode("overwrite").partitionBy("shard").parquet(path)
    spark.catalog.refreshByPath(path)
    return assigns.count()


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, shard) — tokenize fused into the scan (a
    cached fat token column measured SLOWER than recompute; see
    newsflow/pipeline.py module docstring)."""
    from newsflow.functions.text import tokens_expr
    from newsflow.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size(tokens_expr("text")).cast("long").alias("n_tokens"),
        pack_shard_expr().alias("shard"),
    )


@register(
    "corpus_pack_ffd",
    oracle=f"""
    WITH RECURSIVE toks AS ({_SQL_TOKS}),
    {_SQL_FFD_ASSIGNS}
    SELECT shard, bin_idx AS seq_id,
           count(*)::BIGINT AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           {sql_dround(f"sum(n_tokens)::DOUBLE / {SEQ_LEN}", 4)}
             AS fill_pct,
           string_agg(doc_id::VARCHAR, '-' ORDER BY doc_id) AS doc_ids
    FROM assigns
    GROUP BY 1, 2
    """,
    tags=("curation", "packing"),
)
def corpus_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFD-packed training sequences: one row per (shard, seq_id) with
    its document membership and fill ratio. Whole documents only — no
    doc ever crosses a sequence boundary (the waste report quantifies
    what that guarantee costs in padding vs the fixed-window packer).
    See module docstring for the fold/oracle construction."""
    assigns = _ffd_assigns(_toks(spark, sf_dir))
    return assigns.groupBy("shard", F.col("bin_idx").alias("seq_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
        (
            F.round(
                F.sum("n_tokens").cast("double") / SEQ_LEN + F.lit(1e-9), 4
            )
            + F.lit(0.0)
        ).alias("fill_pct"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(doc_id)),"
                " x -> cast(x as string))"
            ),
            "-",
        ).alias("doc_ids"),
    )


@register(
    "corpus_pack_waste_report",
    oracle=f"""
    WITH RECURSIVE toks AS ({_SQL_TOKS}),
    {_SQL_FFD_ASSIGNS},
    ffd_seqs AS (
      SELECT shard, bin_idx, sum(n_tokens) AS seq_tokens
      FROM assigns GROUP BY 1, 2
    ),
    ffd_row AS (
      SELECT count(*)::BIGINT AS n_sequences,
             CAST(sum(greatest(0, {SEQ_LEN} - seq_tokens)) AS BIGINT)
               AS padded_tokens,
             (SELECT count(*) FROM toks WHERE n_tokens > {SEQ_LEN})
               ::BIGINT AS split_docs,
             CAST(sum(seq_tokens) AS BIGINT) AS total_tokens
      FROM ffd_seqs
    ),
    off AS (
      SELECT shard, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard
               ORDER BY md5(doc_id::VARCHAR), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_off
      FROM toks
    ),
    fw_shards AS (
      SELECT shard, sum(n_tokens) AS st,
             (sum(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN} AS ns
      FROM toks GROUP BY 1
    ),
    fw_row AS (
      SELECT CAST(sum(ns) AS BIGINT) AS n_sequences,
             CAST(sum(ns * {SEQ_LEN} - st) AS BIGINT) AS padded_tokens,
             (SELECT count(*) FROM off
              WHERE n_tokens > 0
                AND tok_off // {SEQ_LEN}
                    != (tok_off + n_tokens - 1) // {SEQ_LEN})
               ::BIGINT AS split_docs,
             CAST(sum(st) AS BIGINT) AS total_tokens
      FROM fw_shards
    )
    SELECT 'ffd' AS packer, n_sequences, padded_tokens, split_docs,
           {sql_dround(
               f"total_tokens::DOUBLE / (n_sequences * {SEQ_LEN})", 4
           )} AS fill_pct
    FROM ffd_row
    UNION ALL
    SELECT 'fixed_window', n_sequences, padded_tokens, split_docs,
           {sql_dround(
               f"total_tokens::DOUBLE / (n_sequences * {SEQ_LEN})", 4
           )} AS fill_pct
    FROM fw_row
    """,
    tags=("curation", "packing"),
)
def corpus_pack_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing trade-off, quantified: FFD pads (sequences below
    capacity) but never splits a document; the fixed-window packer
    pads only each shard's final partial window but splits every doc
    that straddles a {SEQ_LEN}-token boundary. One row per packer with
    (n_sequences, padded_tokens, split_docs, fill_pct) — the numbers a
    pipeline owner weighs when choosing an exporter."""
    toks = _toks(spark, sf_dir)

    ffd_seqs = _ffd_assigns(toks).groupBy("shard", "bin_idx").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    oversize = toks.filter(F.col("n_tokens") > SEQ_LEN).agg(
        F.count(F.lit(1)).cast("long").alias("split_docs")
    )
    ffd_row = (
        ffd_seqs.agg(
            F.count(F.lit(1)).cast("long").alias("n_sequences"),
            F.sum(F.greatest(F.lit(0), SEQ_LEN - F.col("seq_tokens")))
            .cast("long")
            .alias("padded_tokens"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
        )
        .crossJoin(oversize)
        .select(
            F.lit("ffd").alias("packer"),
            "n_sequences",
            "padded_tokens",
            "split_docs",
            (
                F.round(
                    F.col("total_tokens").cast("double")
                    / (F.col("n_sequences") * SEQ_LEN)
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("fill_pct"),
        )
    )

    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = toks.withColumn(
        "tok_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    splits = off.filter(
        (F.col("n_tokens") > 0)
        & (
            F.expr(f"tok_off div {SEQ_LEN}")
            != F.expr(f"(tok_off + n_tokens - 1) div {SEQ_LEN}")
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("split_docs"))
    fw_row = (
        toks.groupBy("shard")
        .agg(F.sum("n_tokens").alias("st"))
        .withColumn(
            "ns", F.expr(f"(st + {SEQ_LEN} - 1) div {SEQ_LEN}")
        )
        .agg(
            F.sum("ns").cast("long").alias("n_sequences"),
            F.sum(F.col("ns") * SEQ_LEN - F.col("st"))
            .cast("long")
            .alias("padded_tokens"),
            F.sum("st").cast("long").alias("total_tokens"),
        )
        .crossJoin(splits)
        .select(
            F.lit("fixed_window").alias("packer"),
            "n_sequences",
            "padded_tokens",
            "split_docs",
            (
                F.round(
                    F.col("total_tokens").cast("double")
                    / (F.col("n_sequences") * SEQ_LEN)
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("fill_pct"),
        )
    )
    return ffd_row.unionByName(fw_row)
