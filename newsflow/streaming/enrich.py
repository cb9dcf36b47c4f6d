"""Stream-static enrichment join: a streaming fact joined to a batch
dimension — the standard streaming lookup pattern (the static side is
re-read per micro-batch, so dimension updates are picked up without
restarting the query; Spark broadcasts it when small).

Stateless (no watermark needed): each micro-batch row joins
independently, so output mode `append` works and state stores stay
empty — unlike stream-stream joins, which buffer both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Attach customer attributes to events (user_id ↔ c_custkey mod the
    customer count keeps every event matched on the synthetic ids).
    Works identically on a batch OR streaming `events` frame."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
            "c_acctbal",
        )
    )
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .join(dim, "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "c_mktsegment",
            "c_acctbal",
        )
    )
