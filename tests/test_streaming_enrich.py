"""Stream-static join equivalence: the streaming enrichment must emit
exactly the batch join's rows, in append mode, with no state."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.streaming import windows as W
from newsflow.streaming.enrich import enrich_events
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_batch(spark):
    return (
        W.load_batch_events(spark, SF_SMOKE)
        .filter(F.col("event_id") < 1000)
        .cache()
    )


def test_stream_static_join_equals_batch(spark, events_batch, tmp_path):
    customers = load_table(spark, SF_SMOKE, "customer")
    src = str(tmp_path / "events")
    events_batch.coalesce(2).write.parquet(src)

    stream = W.read_events_stream(spark, src, schema=events_batch.schema)
    q = (
        enrich_events(stream, customers)
        .writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("append")  # stateless join → append works
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        tuple(r) for r in spark.table("t_enriched").collect()
    )
    want = sorted(
        tuple(r) for r in enrich_events(events_batch, customers).collect()
    )
    assert got == want and len(got) == events_batch.count()
