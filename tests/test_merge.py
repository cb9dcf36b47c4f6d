"""MERGE-by-partition tests: content correctness AND the untouched
partitions' files must be byte-identical afterwards (the whole point —
a merge touching day 2 must not rewrite day 1)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F

from newsflow.ops.merge import merge_upsert


def _snapshot(root: Path) -> dict[str, tuple[int, float]]:
    return {
        str(p.relative_to(root)): (p.stat().st_size, p.stat().st_mtime)
        for p in root.rglob("*.parquet")
    }


def _seed(spark, path: str) -> None:
    rows = [
        (i, f"text {i}", f"day{i % 3}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, day string")
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def test_merge_upserts_deletes_and_preserves_untouched(spark, tmp_path):
    path = str(tmp_path / "corpus")
    _seed(spark, path)
    before = _snapshot(tmp_path / "corpus")

    batch = spark.createDataFrame(
        [
            # change doc 1 (day1), insert doc 100 (day1), delete doc 4 (day1)
            (1, "text 1 v2", "day1", False),
            (100, "brand new", "day1", False),
            (4, None, "day1", True),
        ],
        "doc_id long, text string, day string, _deleted boolean",
    )
    stats = merge_upsert(spark, path, batch, key="doc_id", partition_col="day")
    assert stats == {"upserts": 2, "deletes": 1, "partitions": 1}

    got = {r.doc_id: r for r in spark.read.parquet(path).collect()}
    assert got[1].text == "text 1 v2"
    assert got[100].text == "brand new" and got[100].day == "day1"
    assert 4 not in got
    # every other original row intact
    untouched = [i for i in range(30) if i not in (1, 4)]
    assert all(got[i].text == f"text {i}" for i in untouched)

    after = _snapshot(tmp_path / "corpus")
    for rel, sig in before.items():
        if "/day=day1/" not in f"/{rel}":
            assert after.get(rel) == sig, f"untouched file rewritten: {rel}"
    assert any("/day=day1/" in f"/{rel}" for rel in set(after) - set(before))


def test_merge_without_delete_column_is_pure_upsert(spark, tmp_path):
    path = str(tmp_path / "corpus")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(2, "two v2", "day2"), (200, "new", "day2")],
        "doc_id long, text string, day string",
    )
    stats = merge_upsert(spark, path, batch, key="doc_id", partition_col="day")
    assert stats["upserts"] == 2 and stats["deletes"] == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(path).collect()}
    assert got[2] == "two v2" and got[200] == "new"
    assert len(got) == 31


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "corpus")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(5, "five v2", "day2", False), (7, None, "day1", True)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    merge_upsert(spark, path, batch, key="doc_id", partition_col="day")
    first = sorted(
        (r.doc_id, r.text, r.day) for r in spark.read.parquet(path).collect()
    )
    merge_upsert(spark, path, batch, key="doc_id", partition_col="day")
    second = sorted(
        (r.doc_id, r.text, r.day) for r in spark.read.parquet(path).collect()
    )
    assert first == second


def test_merge_deleting_entire_partition(spark, tmp_path):
    path = str(tmp_path / "corpus")
    rows = [(i, f"t{i}", f"day{i % 2}") for i in range(6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, day string"
    ).write.mode("overwrite").partitionBy("day").parquet(path)
    # delete every day1 doc (1, 3, 5)
    batch = spark.createDataFrame(
        [(i, None, "day1", True) for i in (1, 3, 5)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    merge_upsert(spark, path, batch, key="doc_id", partition_col="day")
    got = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    assert got == [0, 2, 4]


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from newsflow.ops.merge import compact_partitions

    path = str(tmp_path / "corpus")
    rows = [(i, f"t{i}", "day0") for i in range(40)]
    # force fragmentation: 8 tasks -> 8 files in one partition
    spark.createDataFrame(
        rows, "doc_id long, text string, day string"
    ).repartition(8).write.mode("overwrite").partitionBy("day").parquet(path)
    n_before = len(list((tmp_path / "corpus" / "day=day0").glob("*.parquet")))
    assert n_before >= 8
    before_rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(path).collect()
    )
    stats = compact_partitions(spark, path, "day")
    assert stats["partitions_compacted"] == 1
    assert stats["files_after"] == 1  # tiny bytes, one target file
    n_after = len(list((tmp_path / "corpus" / "day=day0").glob("*.parquet")))
    assert n_after == 1
    after_rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows


def test_compaction_skips_already_compact_partitions(spark, tmp_path):
    from newsflow.ops.merge import compact_partitions

    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "a", "day0")], "doc_id long, text string, day string"
    ).coalesce(1).write.mode("overwrite").partitionBy("day").parquet(path)
    sig_before = {
        p.name: p.stat().st_mtime
        for p in (tmp_path / "corpus" / "day=day0").glob("*.parquet")
    }
    stats = compact_partitions(spark, path, "day")
    assert stats["partitions_compacted"] == 0
    sig_after = {
        p.name: p.stat().st_mtime
        for p in (tmp_path / "corpus" / "day=day0").glob("*.parquet")
    }
    assert sig_after == sig_before


def test_merge_rejects_missing_columns(spark, tmp_path):
    import pytest

    path = str(tmp_path / "corpus")
    _seed(spark, path)
    bad = spark.createDataFrame(
        [(1, "day1")], "doc_id long, day string"
    )
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(spark, path, bad, key="doc_id", partition_col="day")
