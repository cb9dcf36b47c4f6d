"""Lake-safe filesystem guards (newsflow.fs).

VERDICT r10 #3: 11 persisted-lake existence guards used
``os.path.exists``, which returns False for every ``s3a://`` /
``hdfs://`` URI — on an object-store lake a takedown silently reported
``{"deleted": 0}`` and the streaming near-dup probe skipped the stored
index. These tests prove the swept paths no longer depend on
``os.path.exists`` at all: it is monkeypatched to always-False and the
operators must still find their stored tables and do real work.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from newsflow.fs import fs_delete, fs_exists, fs_list_subdirs


@pytest.fixture()
def no_os_path_exists(monkeypatch):
    """os.path.exists → always False, the object-store failure mode.

    Patched on the shared ``os.path`` module object, so every
    ``os.path.exists`` / ``_os.path.exists`` alias in newsflow sees it.
    Spark driver-side code paths used below don't consult it (writes
    and reads go through the JVM)."""
    monkeypatch.setattr(os.path, "exists", lambda p: False)


def test_fs_helpers_roundtrip(spark, tmp_path):
    base = str(tmp_path / "t")
    assert not fs_exists(spark, base)
    spark.range(3).write.parquet(f"{base}/batch=0")
    spark.range(3).write.parquet(f"{base}/batch=1")
    assert fs_exists(spark, base)
    assert sorted(fs_list_subdirs(spark, base, "batch=")) == [
        "batch=0",
        "batch=1",
    ]
    assert fs_delete(spark, f"{base}/batch=1")
    assert fs_list_subdirs(spark, base, "batch=") == ["batch=0"]
    assert not fs_delete(spark, f"{base}/batch=1")  # already gone
    assert fs_list_subdirs(spark, str(tmp_path / "absent")) == []


def test_takedown_partitioned_ignores_os_path(
    spark, tmp_path, no_os_path_exists
):
    """The compliance hazard site (takedown.py:84): with os.path.exists
    lying, the deletion must STILL delete — not report deleted:0."""
    from newsflow.takedown import takedown_partitioned

    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "doc_id long, batch long"
    ).write.partitionBy("batch").parquet(path)
    dels = spark.createDataFrame([(0,), (2,)], "doc_id long")
    out = takedown_partitioned(spark, path, dels)
    assert out["deleted"] == 2
    left = spark.read.parquet(path).select("doc_id")
    assert left.filter(F.col("doc_id").isin([0, 2])).count() == 0
    assert left.count() == 8


def test_nsw_takedown_update_ignores_os_path(
    spark, tmp_path, no_os_path_exists
):
    """sim/nsw.py guard: a persisted graph must still be found and
    edited when os.path.exists lies (the stream-path hazard ADVICE r10
    flagged: deleted vectors silently remaining in the stored graph)."""
    from newsflow.sim.nsw import nsw_graph_edges_df, nsw_takedown_update
    from newsflow.sim.pq import _unit

    emb = spark.createDataFrame(
        [(i, [float(i % 5 + 1), float((i * 3) % 7 + 1), 1.0])
         for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    units = _unit(emb, "vec_id")
    gp = str(tmp_path / "graph")
    nsw_graph_edges_df(units, m=3).write.parquet(gp)
    dels = spark.createDataFrame([(0,), (7,)], "vec_id long")
    out = nsw_takedown_update(spark, gp, dels, embeddings=emb)
    assert out["edges_removed_net"] > 0
    g = spark.read.parquet(gp)
    assert g.filter(
        F.col("src").isin([0, 7]) | F.col("dst").isin([0, 7])
    ).count() == 0


def test_neardup_batch_probes_index_despite_os_path(
    spark, tmp_path, no_os_path_exists
):
    """streaming/ingest.py sigs-path guard: batch 2 must probe the
    stored index (and drop the exact duplicate of an indexed doc) even
    when os.path.exists claims the index is absent — the silent
    near-dup-admission hazard."""
    from newsflow.streaming.ingest import neardup_apply_batch

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    base = str(tmp_path / "nd")
    neardup_apply_batch(
        spark, docs, 0, index_dir=f"{base}/index", out_dir=f"{base}/out"
    )
    dup = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta", "en", "s"),
         (3, "one two three four five six seven", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    neardup_apply_batch(
        spark, dup, 1, index_dir=f"{base}/index", out_dir=f"{base}/out"
    )
    kept = spark.read.parquet(f"{base}/out")
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == {1, 3}  # 2 dropped against the stored index


def test_write_single_parquet_file_rejects_lake_uri(spark, tmp_path):
    from newsflow.sources.sinks import write_single_parquet_file

    with pytest.raises(ValueError, match="local-FS"):
        write_single_parquet_file(
            spark.range(1), "s3a://bucket/key.parquet"
        )


def test_fs_write_text_preserves_old_copy_until_new_is_complete(
    spark, tmp_path
):
    """ADVICE r12: manifest writes must be write-then-rename, so a
    crash mid-write cannot destroy the previous good copy. Simulate the
    crash window by checking the tmp-sibling protocol: after a
    successful write no tmp debris remains and the content is the new
    one; and a pre-planted tmp file (a dead writer's leftovers) is
    simply overwritten by the next write."""
    from newsflow.fs import fs_read_text, fs_write_text

    target = str(tmp_path / "manifest.json")
    fs_write_text(spark, target, "v1")
    assert fs_read_text(spark, target) == "v1"
    # A dead writer left tmp debris: the next write must still land.
    (tmp_path / ".manifest.json.tmp").write_text("torn-half-write")
    fs_write_text(spark, target, "v2")
    assert fs_read_text(spark, target) == "v2"
    assert not (tmp_path / ".manifest.json.tmp").exists()
    # The crash-window claim itself: writing the tmp file does not
    # touch the target (old copy intact until the rename).
    (tmp_path / ".manifest.json.tmp").write_text("in-flight")
    assert fs_read_text(spark, target) == "v2"
