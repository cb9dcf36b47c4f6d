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
