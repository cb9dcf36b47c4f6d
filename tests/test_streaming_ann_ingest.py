"""Streaming ANN-index append (`ann_index_ingest_stream`): end-to-end
state parity with the batch no-refit append paths, exactly-once under
checkpointed rerun, replay-idempotence of the apply itself, and recall
floors on the post-ingest graph. The driver-hashed surface is the
registered `streaming_ann_index_ingest` query (graph edges vs the
unrolled two-wave oracle); these tests cover what that hash cannot:
the OPQ code table, the vector store, and the replay/recall contracts.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from newsflow.sim.nsw import GRAPH_MAX_VEC_ID
from newsflow.sim.opq import opq_fit, permute_expr
from newsflow.sim.pq import _assign_codes, _unit
from newsflow.sources.sinks import write_single_parquet_file
from newsflow.streaming.exec_queries import (
    ANN_WAVE1_LO,
    ANN_WAVE2_HI,
    ANN_WAVE2_LO,
)
from newsflow.streaming.ingest import ann_index_ingest_stream, ann_index_init
from newsflow.tables import load_table, spread
from tests.conftest import SF_ORACLE


def _setup(spark, tmp_path):
    emb = spread(load_table(spark, SF_ORACLE, "embeddings")).select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") < GRAPH_MAX_VEC_ID)
    paths = {
        "vectors": str(tmp_path / "vectors"),
        "graph": str(tmp_path / "graph"),
        "codes": str(tmp_path / "codes"),
        "replay": str(tmp_path / "replay"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    ann_index_init(
        spark, base, vectors_path=paths["vectors"], graph_path=paths["graph"]
    )
    _, books, perm = opq_fit(base)
    os.makedirs(paths["replay"])
    for i, (lo, hi) in enumerate(
        ((ANN_WAVE1_LO, ANN_WAVE2_LO), (ANN_WAVE2_LO, ANN_WAVE2_HI))
    ):
        write_single_parquet_file(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            os.path.join(paths["replay"], f"{i:02d}.parquet"),
            mtime=1_000_000_000 + i * 1000,
        )
    return emb, books, perm, paths


def _run(spark, paths, books, perm):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(paths["replay"])
    )
    q = ann_index_ingest_stream(
        spark,
        stream,
        vectors_path=paths["vectors"],
        graph_path=paths["graph"],
        checkpoint_dir=paths["ckpt"],
        codes_path=paths["codes"],
        pq_codebooks=books,
        pq_perm=perm,
    )
    q.awaitTermination()


def _graph_state(spark, paths):
    return {
        (r.src, r.dst, r.cosine_sim)
        for r in spark.read.parquet(paths["graph"]).collect()
    }


def test_stream_codes_match_batch_opq_encode(spark, tmp_path):
    """The streamed code table == a from-scratch batch encode of the
    ingested ids under the STORED rotation and codebooks (the no-refit
    property on the stream path), and the vector store holds exactly
    base ∪ waves under the right batch partitions."""
    emb, books, perm, paths = _setup(spark, tmp_path)
    _run(spark, paths, books, perm)

    new = _unit(
        emb.filter(
            (F.col("vec_id") >= ANN_WAVE1_LO)
            & (F.col("vec_id") < ANN_WAVE2_HI)
        ),
        "vec_id",
    ).select("vec_id", permute_expr(perm).alias("u"))
    n_subs = 1 + max(s for s, _ in books)
    k = 1 + max(c for _, c in books)
    dsub = len(next(iter(books.values())))
    expected = {
        (r.vec_id, r.code_string)
        for r in _assign_codes(new, books, n_subs, dsub, k)
        .selectExpr(
            "vec_id",
            "array_join(transform(codes, c -> cast(c as string)), '-')"
            " AS code_string",
        )
        .collect()
    }
    got = {
        (r.vec_id, r.code_string)
        for r in spark.read.parquet(paths["codes"]).select(
            "vec_id", "code_string"
        ).collect()
    }
    assert got == expected and len(got) == 32

    vecs = spark.read.parquet(paths["vectors"])
    assert vecs.count() == GRAPH_MAX_VEC_ID + 32
    by_batch = {
        r.batch: r.n
        for r in vecs.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    assert by_batch == {-1: GRAPH_MAX_VEC_ID, 0: 16, 1: 16}


def test_stream_rerun_and_replay_idempotent(spark, tmp_path):
    """Exactly-once: a checkpointed rerun changes nothing (committed
    offsets make foreachBatch a no-op); REDELIVERING the last batch
    against the final state (the at-least-once case Structured
    Streaming actually produces — a batch re-runs with the same id
    after a crash) is a strict no-op when the prior attempt completed
    (applied-batch marker), and the crash-in-gap fallback (marker
    missing) converges to a VALID graph: identical node set, degree ≤ M,
    every inserted vector still finds itself at rank 1, and
    codes/vectors bitwise-stable throughout."""
    import shutil

    from newsflow.sim.nsw import GRAPH_M, nsw_search_df
    from newsflow.streaming.ingest import ann_index_apply_batch

    emb, books, perm, paths = _setup(spark, tmp_path)
    _run(spark, paths, books, perm)
    g1 = _graph_state(spark, paths)
    assert len(g1) > 0

    _run(spark, paths, books, perm)  # checkpointed rerun: no-op
    assert _graph_state(spark, paths) == g1

    # Same-id redelivery of the LAST batch (wave 2, batch_id=1) after
    # completion: the marker short-circuits the graph step — strict
    # no-op; the vector/code partition overwrites are byte-idempotent.
    wave2 = emb.filter(
        (F.col("vec_id") >= ANN_WAVE2_LO) & (F.col("vec_id") < ANN_WAVE2_HI)
    )
    kw = dict(
        vectors_path=paths["vectors"],
        graph_path=paths["graph"],
        codes_path=paths["codes"],
        pq_codebooks=books,
        pq_perm=perm,
    )
    codes_before = {
        (r.vec_id, r.code_string)
        for r in spark.read.parquet(paths["codes"]).select(
            "vec_id", "code_string"
        ).collect()
    }
    ann_index_apply_batch(spark, wave2, 1, **kw)
    assert _graph_state(spark, paths) == g1

    # Crash-in-gap fallback: graph overwrite landed but the marker did
    # not. The rerun strips wave-2 both directions and re-inserts —
    # convergent to a valid graph, not necessarily bitwise-identical.
    shutil.rmtree(paths["graph"] + "_applied/batch=1")
    ann_index_apply_batch(spark, wave2, 1, **kw)
    edges = spark.read.parquet(paths["graph"]).localCheckpoint(eager=True)
    g2 = {(r.src, r.dst, r.cosine_sim) for r in edges.collect()}
    nodes = lambda g: {s for s, _, _ in g} | {d for _, d, _ in g}  # noqa: E731
    assert nodes(g2) == nodes(g1)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    assert deg.agg(F.max("d")).first()[0] <= GRAPH_M
    units = _unit(
        spark.read.parquet(paths["vectors"]), "vec_id"
    ).localCheckpoint(eager=True)
    inserted = _unit(wave2, "query_id").select("query_id", "u")
    self_hits = (
        nsw_search_df(units, edges, inserted)
        .filter(
            (F.col("rank") == 1) & (F.col("node") == F.col("query_id"))
        )
        .count()
    )
    assert self_hits == 16
    # Codes and vector store are bitwise-stable across every replay.
    assert {
        (r.vec_id, r.code_string)
        for r in spark.read.parquet(paths["codes"]).select(
            "vec_id", "code_string"
        ).collect()
    } == codes_before
    assert spark.read.parquet(paths["vectors"]).count() == (
        GRAPH_MAX_VEC_ID + 32
    )


def test_stream_ingest_recall_floors_and_degree(spark, tmp_path):
    """Post-ingest index quality: beam search over the streamed graph
    holds the tier's recall floors for out-of-index queries AND for the
    inserted vectors themselves (each must find itself at rank 1); node
    degree stays bounded at M."""
    from newsflow.sim.nsw import GRAPH_M, _recall_frame, nsw_search_df

    emb, books, perm, paths = _setup(spark, tmp_path)
    _run(spark, paths, books, perm)

    edges = spark.read.parquet(paths["graph"]).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    assert deg.agg(F.max("d")).first()[0] <= GRAPH_M

    units = _unit(
        spark.read.parquet(paths["vectors"]), "vec_id"
    ).localCheckpoint(eager=True)
    queries = _unit(
        emb.filter(
            (F.col("vec_id") >= ANN_WAVE2_HI)
            & (F.col("vec_id") < ANN_WAVE2_HI + 8)
        ),
        "query_id",
    ).select("query_id", "u")
    beam = nsw_search_df(units, edges, queries).filter(F.col("rank") <= 5)
    rows = _recall_frame(units, beam, queries).collect()
    assert len(rows) == 8
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean >= 0.9, rows
    assert all(r.recall_at_k >= 0.6 for r in rows), rows

    inserted = _unit(
        emb.filter(
            (F.col("vec_id") >= ANN_WAVE1_LO)
            & (F.col("vec_id") < ANN_WAVE2_HI)
        ),
        "query_id",
    ).select("query_id", "u")
    self_hits = (
        nsw_search_df(units, edges, inserted)
        .filter(
            (F.col("rank") == 1) & (F.col("node") == F.col("query_id"))
        )
        .count()
    )
    assert self_hits == 32


def test_ann_index_maintenance_bounds_markers(spark, tmp_path):
    """Marker compaction: markers below the committed-offset watermark
    are deleted; at-or-above survive, and redelivery of a SETTLED batch
    after its marker is gone still converges (the strip-then-reinsert
    fallback) rather than corrupting state."""
    from newsflow.streaming.ingest import (
        ann_index_apply_batch,
        ann_index_maintenance,
    )

    emb, books, perm, paths = _setup(spark, tmp_path)
    _run(spark, paths, books, perm)
    applied = paths["graph"] + "_applied"
    assert sorted(os.listdir(applied)) == ["batch=0", "batch=1"]

    res = ann_index_maintenance(
        spark, paths["graph"], settled_before=1
    )
    assert res["markers_deleted"] == 1
    assert sorted(os.listdir(applied)) == ["batch=1"]
    # Nothing below the watermark remains; idempotent re-run is a no-op.
    assert ann_index_maintenance(
        spark, paths["graph"], settled_before=1
    ) == {"markers_deleted": 0}

    # A (hypothetical) redelivery of the compacted batch falls through
    # to the convergent path and leaves a valid graph with every node.
    wave1 = emb.filter(
        (F.col("vec_id") >= ANN_WAVE1_LO) & (F.col("vec_id") < ANN_WAVE2_LO)
    )
    before_nodes = {
        r.vec_id
        for df in [spark.read.parquet(paths["graph"])]
        for r in df.selectExpr("src AS vec_id").union(
            df.selectExpr("dst AS vec_id")
        ).distinct().collect()
    }
    ann_index_apply_batch(
        spark,
        wave1,
        0,
        vectors_path=paths["vectors"],
        graph_path=paths["graph"],
        codes_path=paths["codes"],
        pq_codebooks=books,
        pq_perm=perm,
    )
    g = spark.read.parquet(paths["graph"])
    after_nodes = {
        r.vec_id
        for r in g.selectExpr("src AS vec_id").union(
            g.selectExpr("dst AS vec_id")
        ).distinct().collect()
    }
    assert after_nodes == before_nodes
    assert sorted(os.listdir(applied)) == ["batch=0", "batch=1"]
