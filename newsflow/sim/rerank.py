"""Retrieve-then-re-rank (TENTH similarity surface, VERDICT r10 stretch
#9): the standard RAG serving shape — a cheap index retrieves a small
candidate pool, then an expensive pairwise scorer re-orders ONLY that
pool. Retrieval here is the hybrid refine ladder (`sim.hybrid`,
PQ/ADC → SQ8 → exact); the re-ranker is a ColBERT-style late-interaction
**MaxSim** over token-level vectors of the documents' TEXT:

    score(q, d) = Σ_{t ∈ tokens(q)} max_{s ∈ tokens(d)} cos(v(t), v(s))

Real cross-encoders run a neural model over each (query, candidate)
pair; what makes them deployable at 100 TB is NOT the model — it is the
economics of scoring a BOUNDED pool (|queries| · pool · q_tokens ·
d_tokens pairs, corpus-independent) after an index did the full-corpus
work. This operator reproduces exactly those economics with a
deterministic, engine-shared scorer: token vectors are derived
row-local from md5 bytes (the `simhash_md5` nibble discipline — no
model state to store, ship, or refit), so the whole pipeline replays
exactly in DuckDB, including the retrieval stage
(`pq_sq8_refine_ctes`). Swapping the hash vectors for real token
embeddings changes one expression, not the plan shape.

Determinism ledger: token caps are alphabetical-first-K per doc (a
row_number window, tie-free since tokens are distinct); pair cosines
round at 6 through the shared epsilon pattern; MAX of identically
rounded doubles is order-safe; the final sum is the decimal-exact
`dsum` (order-independent); rank ties break on neighbor_id.

Family properties are inherited from the composed artifacts: the
retrieval pool appends without refit (`pq_encode_new_vectors`) and is
takedown-covered (`corpus_takedown(codes_path=...)`); the re-ranker
itself is stateless over the pool.

Reference parity: no counterpart (the reference has no vector or
hybrid search); scale-mandated extension completing the retrieval
funnel (ANN ladder → MMR diversification → MaxSim re-rank).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from newsflow.functions.scalars import dround, dsum, sql_dsum
from newsflow.functions.text import sql_tokens, tokens_expr
from newsflow.registry import register
from newsflow.sim.hybrid import pq_sq8_refine_ctes, pq_sq8_refine_topk
from newsflow.sim.knn import dot_expr, norm_expr
from newsflow.tables import load_table, spread

RERANK_POOL = 10   # candidates handed to the re-ranker, per query
RERANK_TOPK = 5    # re-ranked depth returned
QTOK_CAP = 16      # query tokens scored (alphabetical first-K)
DTOK_CAP = 32      # candidate tokens scored against each query token
TOKVEC_DIMS = 8    # md5 bytes per token vector
N_RERANK_QUERIES = 8

_HEX = "0123456789abcdef"


def _byte_sql(tok: str, j: int) -> str:
    """Engine-shared SQL for byte ``j`` (0..15) of md5(``tok``) —
    `instr`/`substr`/`md5` evaluate identically in Spark SQL and DuckDB
    (the `dedup.simhash_md5` nibble discipline)."""
    n1 = f"(instr('{_HEX}', substr(md5({tok}), {2 * j + 1}, 1)) - 1)"
    n2 = f"(instr('{_HEX}', substr(md5({tok}), {2 * j + 2}, 1)) - 1)"
    return f"({n1} * 16 + {n2})"


def _tokvec_components(tok: str, dims: int = TOKVEC_DIMS) -> list[str]:
    """The raw (un-normalized) vector components of a token: centered,
    scaled md5 bytes. cos() normalizes, so unit-scaling here is moot —
    both engines build the identical doubles."""
    return [
        f"((cast({_byte_sql(tok, j)} as double) - 127.5) / 127.5)"
        for j in range(dims)
    ]


def tokvec_expr(tok: str = "tok", dims: int = TOKVEC_DIMS) -> F.Column:
    """Spark Column: the token's md5-derived vector (array<double>)."""
    return F.expr(f"array({', '.join(_tokvec_components(tok, dims))})")


def sql_tokvec(tok: str, dims: int = TOKVEC_DIMS) -> str:
    """DuckDB list literal of the same components."""
    return f"[{', '.join(_tokvec_components(tok, dims))}]"


def _capped_tokens(docs: DataFrame, cap: int) -> DataFrame:
    """(doc_id, tok, tv, rn): each doc's DISTINCT tokens, alphabetical
    first-``cap`` (rn = that rank, so callers can sub-cap), with their
    md5 vectors attached. Deterministic and row-local per doc — no
    corpus state."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_expr("text"))).alias("tok")
    )
    w = Window.partitionBy("doc_id").orderBy("tok")
    return (
        toks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "tok", tokvec_expr("tok").alias("tv"), "rn")
    )


def maxsim_rerank(
    documents: DataFrame,
    pool: DataFrame,
    qtok_cap: int = QTOK_CAP,
    dtok_cap: int = DTOK_CAP,
    topk: int = RERANK_TOPK,
) -> DataFrame:
    """(query_id, neighbor_id, maxsim_score, rank): late-interaction
    re-rank of ``pool`` ((query_id, neighbor_id) rows, ids = doc_ids)
    against ``documents`` (doc_id, text). Cost is pool-bounded:
    |pool| · qtok_cap · dtok_cap scored pairs, corpus-independent —
    the cross-encoder economics. The token frames are semi-joined down
    to the ids the pool actually references before the cross scoring,
    so the corpus-wide tokenization prunes to the pool too.

    The pool is consumed THREE times (two semi-join prunes + the
    scoring join); a LAZY localCheckpoint makes the retrieval plan
    execute once inside the action instead of three times — at 100 TB
    the pool source is a full index ladder, so re-execution is
    re-scanning the corpus. Lazy (not eager) on purpose: the r14 eager
    attempt serialized the driver on the ladder BEFORE the timed action
    and measured slower; lazy defers materialization to the first
    consumer and the persisted partitions serve the other two."""
    pool = pool.select("query_id", "neighbor_id").localCheckpoint(
        eager=False
    )
    capped = _capped_tokens(documents, max(qtok_cap, dtok_cap))
    qtoks = (
        capped.filter(F.col("rn") <= qtok_cap)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("tok").alias("qtok"),
            F.col("tv").alias("qv"),
        )
        .join(pool.select("query_id").distinct(), "query_id", "left_semi")
    )
    dtoks = (
        capped.filter(F.col("rn") <= dtok_cap)
        .select(
            F.col("doc_id").alias("neighbor_id"),
            F.col("tv").alias("dv"),
        )
        .join(pool.select("neighbor_id").distinct(), "neighbor_id",
              "left_semi")
    )
    sim = dround(
        dot_expr(F.col("qv"), F.col("dv"))
        / (norm_expr(F.col("qv")) * norm_expr(F.col("dv"))),
        6,
    )
    # Both token frames are pool-bounded after the semi joins
    # (|pool queries|·qtok_cap and |pool candidates|·dtok_cap rows) —
    # broadcast them so the cross scoring never shuffles the pool.
    per_qtok = (
        pool.join(F.broadcast(qtoks), "query_id")
        .join(F.broadcast(dtoks), "neighbor_id")
        .select("query_id", "neighbor_id", "qtok", sim.alias("sim"))
        .groupBy("query_id", "neighbor_id", "qtok")
        .agg(F.max("sim").alias("mx"))
    )
    scored = per_qtok.groupBy("query_id", "neighbor_id").agg(
        dsum("mx", out=4, scale=6).alias("maxsim_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def rag_rerank_oracle_sql(
    pool_k: int = RERANK_POOL,
    topk: int = RERANK_TOPK,
    qtok_cap: int = QTOK_CAP,
    dtok_cap: int = DTOK_CAP,
) -> str:
    """Exact DuckDB twin: the composed hybrid-retrieval CTE chain
    (`pq_sq8_refine_ctes`) as the pool source, then the identical
    token-cap / md5-vector / rounded-cosine / MAX / decimal-sum
    pipeline over the documents table."""
    ctes, pool_rel = pq_sq8_refine_ctes(
        k=pool_k, max_query_id=N_RERANK_QUERIES
    )
    cos = (
        "list_dot_product(q.qv, d.dv) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * "
        "sqrt(list_dot_product(d.dv, d.dv)))"
    )
    return f"""
    WITH {ctes},
    pool AS (SELECT query_id, neighbor_id FROM {pool_rel}),
    ranked_toks AS (
      SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY tok) AS rn
      FROM (
        SELECT DISTINCT doc_id, unnest({sql_tokens("text")}) AS tok
        FROM documents
      )
    ),
    qtoks AS (
      SELECT t.doc_id AS query_id, t.tok AS qtok,
             {sql_tokvec("t.tok")} AS qv
      FROM ranked_toks t
      WHERE t.rn <= {qtok_cap}
        AND t.doc_id IN (SELECT query_id FROM pool)
    ),
    dtoks AS (
      SELECT t.doc_id AS neighbor_id, {sql_tokvec("t.tok")} AS dv
      FROM ranked_toks t
      WHERE t.rn <= {dtok_cap}
        AND t.doc_id IN (SELECT neighbor_id FROM pool)
    ),
    per_qtok AS (
      SELECT p.query_id, p.neighbor_id, q.qtok,
             max(round({cos} + 1e-9, 6) + 0.0) AS mx
      FROM pool p
      JOIN qtoks q ON q.query_id = p.query_id
      JOIN dtoks d ON d.neighbor_id = p.neighbor_id
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             {sql_dsum("mx", out=4, scale=6)} AS maxsim_score
      FROM per_qtok GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, maxsim_score,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY maxsim_score DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= {topk}
    """


@register(
    "rag_rerank_maxsim",
    oracle=rag_rerank_oracle_sql(),
    tags=("similarity", "rerank", "rag", "hybrid", "text"),
)
def rag_rerank_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-re-rank, exactly oracled end to end: the hybrid
    PQ→SQ8→exact ladder retrieves a {RERANK_POOL}-candidate pool per
    out-of-pool query (vec_id < {N_RERANK_QUERIES}), then the MaxSim
    late-interaction scorer re-orders each pool over the documents'
    text (doc_id = vec_id) and returns the top {RERANK_TOPK} with
    scores — the full RAG serving funnel as one declarative plan."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    pool = pq_sq8_refine_topk(
        emb, emb.filter(F.col("vec_id") < N_RERANK_QUERIES), k=RERANK_POOL
    )
    out = maxsim_rerank(docs, pool)
    return out.select(
        "query_id",
        "neighbor_id",
        "maxsim_score",
        F.col("rank").cast("int").alias("rank"),
    )
