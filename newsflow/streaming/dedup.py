"""Streaming deduplication — the streaming twin of the exact-dedup family.

Batch exact dedup (newsflow/dedup) sees the whole corpus; a stream
cannot, so dedup state must be bounded. Two tiers:

* ``dedup_events_exact`` — ``dropDuplicates`` on the key: emits each key
  once, but keeps EVERY seen key in the state store forever. Correct,
  unbounded — only for keys with a bounded domain (it is the batch
  semantics replayed).
* ``dedup_events_within_watermark`` — ``dropDuplicatesWithinWatermark``:
  duplicates are only suppressed while they can still arrive under the
  event-time watermark; keys older than the watermark are evicted. This
  is the 100 TB form: state is O(keys per watermark window), not O(all
  keys ever). The trade-off is semantic — a duplicate arriving later
  than the watermark delay re-emits — which is exactly the contract
  ingestion pipelines want (dedup bursts of retries/replays, bounded
  memory).

Batch equivalence (tests/test_streaming_dedup.py): when every duplicate
pair arrives within the watermark delay, the within-watermark form emits
exactly the batch ``dropDuplicates`` row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_exact(events: DataFrame, keys: list[str]) -> DataFrame:
    """Emit the first event per key; state grows with distinct keys."""
    return events.dropDuplicates(keys)


def dedup_events_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Emit the first event per key with watermark-bounded state.

    ``events`` must be a streaming frame with an event-time ``ts``
    column; ``watermark`` bounds both lateness and state retention.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )
