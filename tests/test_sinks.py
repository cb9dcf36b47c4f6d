"""Writer round-trip tests (S5/S6/S7) incl. partition pruning on the
partitioned layout."""

from __future__ import annotations

import json

import pytest

from newsflow.etl.gdelt import build_core, read_gkg, write_core
from newsflow.sources.sinks import (
    collect_report,
    write_csv,
    write_parquet,
    write_sample_csv,
)
from tests.test_etl import ROWS


def test_partitioned_core_write_prunes(spark, tmp_path):
    src = tmp_path / "raw.jsonl"
    src.write_text("\n".join(json.dumps(r) for r in ROWS))
    core = build_core(read_gkg(spark, str(src)))
    out = str(tmp_path / "core_pq")
    write_core(core, out)

    back = spark.read.parquet(out)
    assert back.count() == 3
    feb = back.filter(back.label_week == "week_feb")
    assert feb.count() == 1
    # Hive-partitioned layout → the era filter is partition pruning, not
    # a data filter.
    explained = feb._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(label_week" in explained


def test_csv_roundtrip(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "id * 2 AS dbl")
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    back = spark.read.option("header", True).csv(path, inferSchema=True)
    assert back.count() == 10
    assert {r["dbl"] for r in back.collect()} == {2 * i for i in range(10)}


def test_sample_csv_single_file(spark, tmp_path):
    df = spark.range(1000).selectExpr("id")
    path = tmp_path / "sample_csv"
    write_sample_csv(df, str(path), n=200)
    parts = [p for p in path.iterdir() if p.name.startswith("part-")]
    assert len(parts) == 1
    back = spark.read.option("header", True).csv(str(path))
    assert back.count() == 200


def test_parquet_writer_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["id", "bucket"]
    )
    path = tmp_path / "pq"
    write_parquet(df, str(path), partition_by=("bucket",))
    assert (path / "bucket=a").exists() and (path / "bucket=b").exists()


def test_collect_report_guard(spark):
    small = spark.range(5)
    assert len(collect_report(small, max_rows=10)) == 5
    with pytest.raises(ValueError, match="exceeds max_rows"):
        collect_report(spark.range(100), max_rows=10)


def test_orc_roundtrip_preserves_rows_and_pushdown(spark, tmp_path):
    import pyspark.sql.functions as F

    from newsflow.sources.sinks import read_orc, write_orc
    from newsflow.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=("o_orderstatus",))
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # Partition pruning: a status predicate must reach the ORC scan as a
    # partition filter, not a post-scan filter.
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_jsonl_roundtrip_plain_and_gzip(spark, tmp_path):
    from newsflow.sources.sinks import read_jsonl, write_jsonl
    from newsflow.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    for comp, sub in ((None, "plain"), ("gzip", "gz")):
        path = str(tmp_path / f"docs_{sub}")
        write_jsonl(docs, path, compression=comp)
        back = read_jsonl(spark, path, schema=docs.schema)
        assert back.count() == docs.count()
        a = {r.doc_id: r.text for r in docs.collect()}
        b = {r.doc_id: r.text for r in back.collect()}
        assert a == b


def test_clustered_write_tightens_row_group_stats(spark, tmp_path):
    """cluster_by must yield near-disjoint per-row-group min/max ranges
    on the clustered column (the stats that let scans skip row groups),
    while the unclustered write's row groups all span ~the full range."""
    import pyarrow.parquet as pq

    from newsflow.sources.sinks import write_parquet
    from newsflow.tables import load_table
    from tests.conftest import SF_ORACLE

    orders = (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(2)
    )
    # small row groups so each file holds several
    opts = {"parquet.block.size": str(16 * 1024)}
    plain = str(tmp_path / "plain")
    clustered = str(tmp_path / "clustered")
    write_parquet(orders, plain, options=opts)
    write_parquet(orders, clustered, cluster_by=("o_orderkey",), options=opts)

    def ranges(root):
        out = []
        for f in Path(root).glob("*.parquet"):
            meta = pq.ParquetFile(str(f)).metadata
            idx = meta.schema.names.index("o_orderkey")
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                out.append((st.min, st.max))
        return out

    from pathlib import Path

    cl = ranges(clustered)
    assert len(cl) >= 3, "need several row groups for the test to bite"
    # clustered: within a file, consecutive row groups don't overlap;
    # measure global overlap fraction instead (files may interleave):
    def overlap_fraction(rs):
        n = len(rs)
        overlapping = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if rs[i][0] <= rs[j][1] and rs[j][0] <= rs[i][1]
        )
        return overlapping / max(n * (n - 1) / 2, 1)

    pl = ranges(plain)
    assert overlap_fraction(cl) < overlap_fraction(pl)
    assert overlap_fraction(cl) < 0.5


def test_partitioned_clustered_write_preserves_cluster_order(spark, tmp_path):
    """With partition_by + cluster_by together, rows inside each
    partition's files must still be in cluster order: the file writer
    re-sorts by partition columns (non-stable), so the sink sorts by
    (*partition_by, *cluster_by) to keep the promised order intact."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from newsflow.sources.sinks import write_parquet

    rows = [
        (i * 7919 % 1000, f"day{i % 3}") for i in range(3000)
    ]  # scrambled cluster key across 3 partitions
    df = spark.createDataFrame(rows, "k long, day string").repartition(4)
    out = str(tmp_path / "pc")
    write_parquet(df, out, partition_by=("day",), cluster_by=("k",))
    checked = 0
    for f in Path(out).rglob("*.parquet"):
        ks = pq.read_table(str(f), columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), f"cluster order destroyed in {f}"
        checked += 1
    assert checked >= 3
