"""Checkpoint/restart semantics: a restarted streaming query must (a)
skip files already committed to the checkpoint and (b) recover its state
store, so running totals continue rather than restart from zero. This is
the state-store half of SURVEY §7's 'streaming state correctness' item —
the equivalence suite covers values, this covers recovery."""

from __future__ import annotations

import shutil
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from newsflow.streaming import windows as W
from newsflow.streaming.stateful import running_user_totals
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Events split into 4 parquet part-files in a staging area."""
    base = tmp_path_factory.mktemp("restart")
    ev = (
        W.load_batch_events(spark, SF_SMOKE)
        .filter(F.col("user_id") < 10)
        .cache()
    )
    stage = base / "stage"
    ev.repartition(4).write.parquet(str(stage))
    parts = sorted(p for p in stage.iterdir() if p.name.startswith("part-"))
    assert len(parts) == 4
    return {"base": base, "parts": parts, "schema": ev.schema, "events": ev}


def _run_once(spark, staged, out: Path, cp: Path) -> None:
    stream = W.read_events_stream(
        spark,
        str(staged["base"] / "live"),
        schema=staged["schema"],
        max_files_per_trigger=1,
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(cp))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_resumes_offsets_and_state(spark, staged):
    base = staged["base"]
    live = base / "live"
    out = base / "out"
    cp = base / "cp"
    live.mkdir()

    # Phase 1: only half the files are visible.
    for p in staged["parts"][:2]:
        shutil.copy(p, live / p.name)
    _run_once(spark, staged, out, cp)
    phase1 = spark.read.parquet(str(out)).toPandas()
    phase1_totals = phase1.loc[
        phase1.groupby("user_id")["n_events"].idxmax()
    ].set_index("user_id")["n_events"]

    # Phase 2: the rest arrives; SAME checkpoint → restart resumes.
    for p in staged["parts"][2:]:
        shutil.copy(p, live / p.name)
    _run_once(spark, staged, out, cp)

    emitted = spark.read.parquet(str(out)).toPandas()
    final = emitted.loc[
        emitted.groupby("user_id")["n_events"].idxmax()
    ].set_index("user_id")

    want = {
        r["user_id"]: r["n"]
        for r in staged["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # (b) totals continued from recovered state — they equal the full
    # batch counts even though the restarted query read only new files.
    assert {u: int(n) for u, n in final["n_events"].items()} == want
    # Phase 1 genuinely processed a strict subset (otherwise the restart
    # proves nothing).
    assert any(
        phase1_totals.get(u, 0) < n for u, n in want.items()
    )
    # (a) no reprocessing: each phase emits ≤ |users| rows per
    # micro-batch and there were 2 batches per phase.
    n_users = len(want)
    assert len(emitted) <= 4 * n_users
