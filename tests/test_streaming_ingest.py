"""Exactly-once streaming ingestion (foreachBatch + idempotent MERGE):
result correctness, replay idempotency, and checkpoint-resume — the
three properties that together make at-least-once delivery exactly-once.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.ops.merge import merge_upsert
from newsflow.streaming.ingest import stream_merge_to_corpus

SCHEMA = "doc_id long, text string, day string"


def _seed(spark, path):
    spark.createDataFrame(
        [(i, f"text {i}", f"day{i % 2}") for i in range(10)], SCHEMA
    ).write.mode("overwrite").partitionBy("day").parquet(path)


def _write_batch(spark, src_dir, name, rows):
    from newsflow.sources.sinks import write_single_parquet_file

    write_single_parquet_file(
        spark.createDataFrame(rows, SCHEMA), f"{src_dir}/{name}.parquet"
    )


def _corpus(spark, path):
    return sorted(
        (r.doc_id, r.text, r.day)
        for r in spark.read.parquet(path).collect()
    )


def test_stream_merge_applies_batches_and_resumes(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "incoming").mkdir()
    _seed(spark, corpus)

    # two incremental files -> two micro-batches (maxFilesPerTrigger=1)
    _write_batch(spark, src, "b0", [(1, "one v2", "day1"), (100, "new", "day0")])
    _write_batch(spark, src, "b1", [(3, "three v2", "day1")])

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_merge_to_corpus(
            spark, stream, corpus, key="doc_id", partition_col="day",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()
        return q

    q = run()
    assert len(q.recentProgress) >= 2  # really went through micro-batches
    got = dict(
        (r.doc_id, r.text) for r in spark.read.parquet(corpus).collect()
    )
    assert got[1] == "one v2" and got[3] == "three v2" and got[100] == "new"
    assert len(got) == 11
    state_after_first = _corpus(spark, corpus)

    # REPLAY idempotency: re-applying the last batch by hand (the
    # at-least-once failure mode: sink ran, offset commit lost) must
    # change nothing.
    replay = spark.createDataFrame([(3, "three v2", "day1")], SCHEMA)
    merge_upsert(spark, corpus, replay, key="doc_id", partition_col="day")
    assert _corpus(spark, corpus) == state_after_first

    # CHECKPOINT RESUME: a third file arrives; restarting from the same
    # checkpoint processes ONLY it (earlier files already committed).
    _write_batch(spark, src, "b2", [(100, "new v2", "day0")])
    run()
    got2 = dict(
        (r.doc_id, r.text) for r in spark.read.parquet(corpus).collect()
    )
    assert got2[100] == "new v2"
    assert got2[1] == "one v2" and len(got2) == 11


def test_stream_merge_aborts_on_key_move(spark, tmp_path):
    """A malformed batch (cross-partition key move) must abort the
    query BEFORE writing — fail-loud ingestion."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    corpus = str(tmp_path / "corpus")
    src = str(tmp_path / "incoming")
    (tmp_path / "incoming").mkdir()
    _seed(spark, corpus)
    before = _corpus(spark, corpus)
    # doc 2 lives in day0 (2 % 2); batch routes it to day1
    _write_batch(spark, src, "bad", [(2, "moved", "day1")])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_merge_to_corpus(
        spark, stream, corpus, key="doc_id", partition_col="day",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(StreamingQueryException, match="moves key"):
        q.awaitTermination()
    assert _corpus(spark, corpus) == before  # nothing written


def test_neardup_ingest_stream_planted_semantics(spark, tmp_path):
    """The streaming near-dup ingest's load-bearing behaviors, planted:
    batch-internal collapse (greedy doc_b-side), index probe against
    PRIOR survivors, index growth across batches, and availableNow
    replay idempotency (same checkpoint -> nothing reprocessed)."""
    import os

    import pyspark.sql.functions as F

    from newsflow.sources.sinks import write_single_parquet_file
    from newsflow.streaming.ingest import neardup_ingest_stream

    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"alt{i}" for i in range(60))
    third = " ".join(f"thr{i}" for i in range(60))
    wave1 = spark.createDataFrame(
        [
            (1, base, "en", "s1"),
            (2, base + " suffix", "en", "s1"),  # near-dup of 1 -> drop
            (3, other, "en", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    wave2 = spark.createDataFrame(
        [
            (11, base + " tail", "en", "s3"),   # near-dup of KEPT 1 -> drop
            (12, third, "en", "s3"),            # new content -> keep
            (13, third + " coda", "en", "s3"),  # near-dup of 12 -> drop
        ],
        "doc_id long, text string, lang string, source string",
    )

    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    for i, wave in enumerate((wave1, wave2)):
        write_single_parquet_file(
            wave,
            os.path.join(replay, f"{i:02d}.parquet"),
            mtime=1_000_000_000 + i * 1000,
        )
    schema = spark.read.parquet(os.path.join(replay, "00.parquet")).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(replay)
        )
        q = neardup_ingest_stream(
            spark,
            stream,
            index_dir=str(tmp_path / "index"),
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

    run()
    out = {
        (r.doc_id, r.ingest_batch)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id", "ingest_batch")
        .collect()
    }
    assert out == {(1, 0), (3, 0), (12, 1)}
    indexed = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "index" / "arrays"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert indexed == {1, 3, 12}  # index holds SURVIVORS only, and grows

    # Replay with the same checkpoint: availableNow finds no new files,
    # output unchanged (exactly-once result).
    run()
    out2 = {
        (r.doc_id, r.ingest_batch)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id", "ingest_batch")
        .collect()
    }
    assert out2 == out

    # Sink-ran/offset-lost replay (the at-least-once case the
    # availableNow rerun above does NOT exercise): the micro-batch's
    # parquet writes all landed, the checkpoint commit was lost, and
    # Structured Streaming re-delivers the SAME data with the SAME
    # batch_id. The apply must exclude the batch's own already-written
    # index partition — otherwise every survivor self-matches at
    # jaccard=1 and the replay overwrites the batch with empty output.
    from newsflow.streaming.ingest import neardup_apply_batch

    neardup_apply_batch(
        spark,
        wave2,
        1,
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "out"),
    )
    out3 = {
        (r.doc_id, r.ingest_batch)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id", "ingest_batch")
        .collect()
    }
    assert out3 == out  # replay is a no-op, batch 1 survivors intact
    indexed3 = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "index" / "arrays"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert indexed3 == {1, 3, 12}


def test_adaptive_micro_batch_sizes_shuffle_to_batch(spark):
    """VERDICT r13 Next #5: foreachBatch bodies must run with shuffle
    partitioning sized to the BATCH (ceil(rows/rows_per_task), floor 1,
    ceiling the session value) and restore the session setting after —
    the r13 sweep measured tiny micro-batches anti-scaling 1.5x when
    they inherit a 32-partition session setting."""
    from newsflow.streaming.ingest import _SHUFFLE_KEY, _adaptive_micro_batch

    session_n = spark.conf.get(_SHUFFLE_KEY)
    seen = {}

    def _apply(batch, batch_id):
        seen[batch_id] = int(spark.conf.get(_SHUFFLE_KEY))

    # Tiny batch -> 1 partition.
    _adaptive_micro_batch(spark, _apply)(spark.range(16), 0)
    assert seen[0] == 1
    # Large batch with a small rows_per_task -> clamped to session value.
    _adaptive_micro_batch(spark, _apply, rows_per_task=10)(
        spark.range(100_000), 1
    )
    assert seen[1] == int(session_n)
    # Mid-size: ceil(1000/64) = 16 (session setting permitting).
    _adaptive_micro_batch(spark, _apply, rows_per_task=64)(
        spark.range(1000), 2
    )
    assert seen[2] == min(int(session_n), 16)
    # Restored after every batch, including when the body raises.
    assert spark.conf.get(_SHUFFLE_KEY) == session_n

    def _boom(batch, batch_id):
        raise RuntimeError("body failure")

    import pytest
    with pytest.raises(RuntimeError):
        _adaptive_micro_batch(spark, _boom)(spark.range(1), 3)
    assert spark.conf.get(_SHUFFLE_KEY) == session_n
