"""Layout operators: time-clustered files must have disjoint time ranges
(verified from actual parquet footers) and compaction must hit the file
count while preserving rows."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from newsflow.ops.layout import compact_files, write_time_clustered
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


def _file_ts_ranges(path: str):
    ranges = []
    for f in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_time_clustered_files_have_disjoint_ranges(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    path = str(tmp_path / "clustered")
    write_time_clustered(ev, path, "ts", n_files=6)

    ranges = sorted(_file_ts_ranges(path))
    assert len(ranges) >= 4  # range partitioner may merge tiny bounds
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min, "file time ranges overlap"

    back = spark.read.parquet(path)
    assert back.count() == ev.count()


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "fragmented")
    # Simulate streaming ingestion debris: many tiny files.
    ev.repartition(64).write.parquet(src)
    assert len(list(Path(src).rglob("*.parquet"))) == 64

    out = str(tmp_path / "compacted")
    n = compact_files(spark, src, out, target_mb=128, sort_by="ts")
    files = list(Path(out).rglob("*.parquet"))
    assert len(files) <= max(n, 1) < 64
    assert spark.read.parquet(out).count() == ev.count()
    # sort_by keeps the clustered-skipping property.
    ranges = sorted(_file_ts_ranges(out))
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min


def test_zorder_gives_both_columns_pruning_locality(spark, tmp_path):
    """Z-order vs lexicographic (custkey, totalprice) sort: lexicographic
    gives the SECOND column no locality (each row group spans ~the full
    totalprice range), while the Z-curve shrinks BOTH columns' per-row-
    group ranges — the property that makes min/max stats prune scans on
    either predicate."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from newsflow.ops.layout import write_zordered
    from newsflow.tables import load_table
    from tests.conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_totalprice"
    )
    opts = {"parquet.block.size": str(8 * 1024)}

    lex = str(tmp_path / "lex")
    (
        orders.repartitionByRange(4, "o_custkey", "o_totalprice")
        .sortWithinPartitions("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .option("parquet.block.size", opts["parquet.block.size"])
        .parquet(lex)
    )
    zo = str(tmp_path / "zorder")
    write_zordered(
        orders, zo, zorder_by=("o_custkey", "o_totalprice"), n_files=4,
        options=opts,
    )

    def avg_rel_range(root, col):
        mins, maxs, spans = [], [], []
        for f in Path(root).glob("*.parquet"):
            meta = pq.ParquetFile(str(f)).metadata
            idx = meta.schema.names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
                spans.append(st.max - st.min)
        total = max(maxs) - min(mins)
        return sum(spans) / len(spans) / total, len(spans)

    lex_ck, n1 = avg_rel_range(lex, "o_custkey")
    lex_tp, _ = avg_rel_range(lex, "o_totalprice")
    z_ck, n2 = avg_rel_range(zo, "o_custkey")
    z_tp, _ = avg_rel_range(zo, "o_totalprice")
    assert n1 > 8 and n2 > 8  # enough row groups for the stats to mean something
    # lexicographic: first col tight, second col useless (~full range)
    assert lex_ck < 0.2 and lex_tp > 0.8
    # z-order: BOTH columns substantially narrowed
    assert z_ck < 0.5 and z_tp < 0.5, (lex_ck, lex_tp, z_ck, z_tp)


def test_zorder_value_interleaves_bits(spark):
    import pyspark.sql.functions as F

    from newsflow.ops.layout import zorder_value

    df = spark.range(1).select(
        zorder_value([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
    )
    # x bits at even positions, y bits at odd: x=101, y=011 ->
    # z = (x0<<0)|(y0<<1)|(x1<<2)|(y1<<3)|(x2<<4)|(y2<<5)
    #   = 1 | 2 | 0 | 8 | 16 | 0 = 27
    assert df.first().z == 27


def test_zorder_handles_timestamp_empty_and_rejects_strings(spark, tmp_path):
    import pytest

    from newsflow.ops.layout import write_zordered
    from newsflow.tables import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").select(
        "ts", "user_id", "event_type"
    )
    out = str(tmp_path / "ts_zorder")
    write_zordered(events, out, zorder_by=("ts", "user_id"), n_files=2)
    assert spark.read.parquet(out).count() == events.count()

    empty = events.filter("user_id < 0")
    out2 = str(tmp_path / "empty")
    write_zordered(empty, out2, zorder_by=("ts", "user_id"))
    assert spark.read.parquet(out2).count() == 0

    with pytest.raises(ValueError, match="unsupported type"):
        write_zordered(
            events, str(tmp_path / "bad"), zorder_by=("event_type",)
        )


def test_zorder_all_null_nonfirst_column_clusters_remaining(spark, tmp_path):
    """A populated first column with an entirely-null second column must
    not crash (round-4 review) AND must still cluster on the populated
    column (second-pass review: dropping ALL clustering because one
    column is null silently degrades the layout)."""
    import pyspark.sql.functions as F

    from newsflow.ops.layout import write_zordered

    df = spark.range(100).select(
        F.col("id"), F.lit(None).cast("double").alias("score")
    )
    out = str(tmp_path / "nullcol")
    write_zordered(df, out, zorder_by=("id", "score"))
    assert spark.read.parquet(out).count() == 100


def test_zorder_empty_input_honors_file_contract(spark, tmp_path):
    import pyspark.sql.functions as F

    from newsflow.ops.layout import write_zordered

    empty = spark.range(0).select(
        F.col("id"), F.lit(None).cast("double").alias("v")
    )
    out = str(tmp_path / "empty2")
    write_zordered(empty, out, zorder_by=("id", "v"), n_files=3)
    assert spark.read.parquet(out).count() == 0
