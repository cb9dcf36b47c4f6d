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
