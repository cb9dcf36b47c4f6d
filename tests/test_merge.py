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


def test_merge_rejects_cross_partition_key_move(spark, tmp_path):
    """A batch that upserts a key into a DIFFERENT partition than the one
    holding its live row must fail loudly (the stale row in the untouched
    partition would otherwise survive as a duplicate)."""
    import pytest

    path = str(tmp_path / "corpus")
    _seed(spark, path)
    # doc 2 lives in day2 (2 % 3); batch routes it to day1
    moving = spark.createDataFrame(
        [(2, "moved", "day1", False)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    with pytest.raises(ValueError, match="moves key"):
        merge_upsert(spark, path, moving, key="doc_id", partition_col="day")
    # nothing was written: corpus unchanged
    got = {r.doc_id: r.day for r in spark.read.parquet(path).collect()}
    assert got[2] == "day2" and len(got) == 30


def test_merge_rejects_misrouted_delete(spark, tmp_path):
    """A delete row whose partition value doesn't match the key's live
    partition would silently no-op — the key-move check catches it."""
    import pytest

    path = str(tmp_path / "corpus")
    _seed(spark, path)
    # doc 0 lives in day0; delete row says day1
    bad_delete = spark.createDataFrame(
        [(0, None, "day1", True)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    with pytest.raises(ValueError, match="moves key"):
        merge_upsert(
            spark, path, bad_delete, key="doc_id", partition_col="day"
        )


def test_merge_key_move_check_can_be_disabled(spark, tmp_path):
    """check_key_moves=False restores the trusted-producer fast path (no
    scan of untouched partitions) — and documents the hazard it skips."""
    path = str(tmp_path / "corpus")
    _seed(spark, path)
    moving = spark.createDataFrame(
        [(2, "moved", "day1", False)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    merge_upsert(
        spark,
        path,
        moving,
        key="doc_id",
        partition_col="day",
        check_key_moves=False,
    )
    # the documented corruption: doc 2 now exists in BOTH partitions
    days = sorted(
        r.day for r in spark.read.parquet(path).filter("doc_id = 2").collect()
    )
    assert days == ["day1", "day2"]


def test_compaction_reports_actual_file_count(spark, tmp_path):
    """files_after must count files on disk, not the coalesce target:
    coalesce(n) cannot create more partitions than upstream has, so a
    2-file partition asked to become 5 files stays at 2."""
    from newsflow.ops.merge import compact_partitions

    path = str(tmp_path / "corpus")
    rows = [(i, "x" * 200, "day0") for i in range(400)]
    spark.createDataFrame(
        rows, "doc_id long, text string, day string"
    ).repartition(2).write.mode("overwrite").partitionBy("day").parquet(path)
    pdir = tmp_path / "corpus" / "day=day0"
    nbytes = sum(f.stat().st_size for f in pdir.glob("*.parquet"))
    # target ~5 output files from 2 input files: coalesce caps at 2
    stats = compact_partitions(
        spark, path, "day", target_bytes=max(1, nbytes // 5)
    )
    actual = len(list(pdir.glob("*.parquet")))
    assert stats["files_after"] == actual
    assert actual <= 2 < 5


def test_merge_rejects_double_upsert_of_one_key(spark, tmp_path):
    """The upsert+upsert form of a cross-partition move (and the
    same-partition double upsert) must be rejected: both would leave the
    key duplicated after merge."""
    import pytest

    path = str(tmp_path / "corpus")
    _seed(spark, path)
    # doc 5 (lives in day2) upserted into day1 AND day2: both partitions
    # are touched, so the untouched-partition probe alone cannot see it.
    double = spark.createDataFrame(
        [(5, "v a", "day1", False), (5, "v b", "day2", False)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    with pytest.raises(ValueError, match="more than once"):
        merge_upsert(spark, path, double, key="doc_id", partition_col="day")
    # delete+upsert of one key (the legitimate move encoding) still works
    move = spark.createDataFrame(
        [(5, None, "day2", True), (5, "moved", "day1", False)],
        "doc_id long, text string, day string, _deleted boolean",
    )
    merge_upsert(spark, path, move, key="doc_id", partition_col="day")
    got = [
        (r.text, r.day)
        for r in spark.read.parquet(path).filter("doc_id = 5").collect()
    ]
    assert got == [("moved", "day1")]
