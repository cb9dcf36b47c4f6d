"""Spark 4 Python DataSource connector for parallel HTTP archive
ingest — the idiomatic `spark.read.format(...)` packaging of the same
injectable-fetcher seam `sources/fetch.py` exposes as mapInPandas
operators.

Why both forms exist: the mapInPandas operators compose mid-pipeline
(URLs arrive as a DataFrame column); the DataSource is the CONNECTOR
form — `spark.dataSource.register(HttpArchiveDataSource);
spark.read.format("newsflow_http").option("urls", ...)` — which makes
the fetch a real scan node: one InputPartition per URL, so a 100k-URL
crawl fans out as 100k tasks with locality-free scheduling, and the
reader participates in column pruning like any other source.

Network is injected by IMPORT PATH (`fetcher_path` option) because a
DataSource is pickled to executors — a callable option wouldn't
serialize portably. Default is the stdlib `urllib_fetcher`; tests point
it at the deterministic in-repo fake (no sockets touched).

Reference: the boto3/requests download loops in
gdelt/processing/fetch_data.py — single-process there, a distributed
scan here.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HTTP_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

DEFAULT_FETCHER = "newsflow.sources.fetch.urllib_fetcher"


def _load_fetcher(path: str):
    mod, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


class _UrlPartition(InputPartition):
    def __init__(self, urls: Sequence[str]) -> None:
        self.urls = list(urls)


class HttpArchiveReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        raw = options.get("urls", "")
        self.urls = [u for u in raw.split(";") if u]
        self.fetcher_path = options.get("fetcher_path", DEFAULT_FETCHER)
        self.urls_per_task = int(options.get("urls_per_task", "1"))

    def pushFilters(self, filters):
        """Filter pushdown INTO the work list: `url = '...'`, `url IN
        (...)`, and `url LIKE 'prefix%'` predicates prune partitions
        before any fetch happens — the Python-DataSource equivalent of
        parquet partition pruning (a 100k-URL scan filtered to one URL
        does ONE fetch, not 100k followed by a Spark-side filter). Other
        predicates are returned for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import EqualTo, In, StringStartsWith

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("url",):
                self.urls = [u for u in self.urls if u == f.value]
            elif isinstance(f, In) and f.attribute == ("url",):
                allowed = set(f.value)
                self.urls = [u for u in self.urls if u in allowed]
            elif (
                isinstance(f, StringStartsWith)
                and f.attribute == ("url",)
            ):
                self.urls = [
                    u for u in self.urls if u.startswith(f.value)
                ]
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        n = max(self.urls_per_task, 1)
        return [
            _UrlPartition(self.urls[i : i + n])
            for i in range(0, len(self.urls), n)
        ] or [_UrlPartition([])]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        fetcher = _load_fetcher(self.fetcher_path)
        for url in partition.urls:
            status, body = fetcher(url, {})
            yield (url, int(status), len(body), bytes(body))


class HttpArchiveDataSource(DataSource):
    """`spark.read.format("newsflow_http")` — options:

    - ``urls``: ``;``-separated URL list (the scan's work list)
    - ``fetcher_path``: import path of a ``fetcher(url, headers) ->
      (status, bytes)`` callable (default stdlib urllib)
    - ``urls_per_task``: batch size per InputPartition (default 1 —
      maximum fan-out; raise it when per-URL latency is small relative
      to task overhead)
    """

    @classmethod
    def name(cls) -> str:
        return "newsflow_http"

    def schema(self) -> StructType:
        return HTTP_SCHEMA

    def reader(self, schema: StructType) -> HttpArchiveReader:
        return HttpArchiveReader(self.options)


def deterministic_fake_fetcher(
    url: str, headers: dict[str, str]
) -> tuple[int, bytes]:
    """Import-path-addressable offline fetcher for tests/demos: status
    derives from the URL (404 for paths containing 'missing'), payload
    is the URL text repeated — no sockets, fully reproducible."""
    if "missing" in url:
        return 404, b""
    return 200, (url + "\n").encode() * 3


# ---------------------------------------------------------------------------
# Streaming counterpart: deterministic synthetic-events stream source
# ---------------------------------------------------------------------------

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", LongType()),
    ]
)

_EVENT_TYPES = ("view", "click", "purchase", "refund")


def synthetic_event(i: int) -> tuple:
    """Row ``i`` of the deterministic event sequence — pure function of
    the index, so any offset range is exactly replayable (the property
    that makes the source's checkpoint/recovery contract testable)."""
    return (
        i,
        (i * 2654435761) % 997,
        _EVENT_TYPES[(i * 40503) % len(_EVENT_TYPES)],
        (i * 48271) % 10_000,
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["next"])
        hi = lo + self.rows_per_batch
        return iter([synthetic_event(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Exact replay for recovery: the sequence is a pure function of
        # the index, so any committed range reproduces bit-identically.
        return iter(
            [synthetic_event(i) for i in range(int(start["next"]), int(end["next"]))]
        )


class SyntheticEventsDataSource(DataSource):
    """`spark.readStream.format("newsflow_events")` — a deterministic
    rate-like event stream whose offsets are row indices; every batch
    and every recovery replay is a pure function of the offset range.
    Options: ``rows_per_batch`` (default 100)."""

    @classmethod
    def name(cls) -> str:
        return "newsflow_events"

    def schema(self) -> StructType:
        return EVENTS_STREAM_SCHEMA

    def simpleStreamReader(
        self, schema: StructType
    ) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Write path: webhook/HTTP-POST sink DataSource
# ---------------------------------------------------------------------------


class _WebhookCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, n_requests: int) -> None:
        self.n_rows = n_rows
        self.n_requests = n_requests


class WebhookWriter(DataSourceWriter):
    def __init__(self, options: dict[str, str]) -> None:
        self.endpoint = options.get("endpoint", "")
        self.poster_path = options.get("poster_path", DEFAULT_POSTER)
        self.batch_size = int(options.get("batch_size", "100"))

    def write(self, iterator) -> _WebhookCommit:
        import json

        poster = _load_fetcher(self.poster_path)
        n_rows = n_req = 0
        batch: list[dict] = []

        def flush() -> None:
            nonlocal n_req
            if batch:
                poster(self.endpoint, json.dumps(batch).encode())
                n_req += 1
                batch.clear()

        for row in iterator:
            batch.append(row.asDict())
            n_rows += 1
            if len(batch) >= self.batch_size:
                flush()
        flush()
        return _WebhookCommit(n_rows, n_req)

    def commit(self, messages) -> None:
        # Per-task tallies arrive here on the driver; nothing external to
        # finalize for a webhook (each POST is its own commit unit).
        return None

    def abort(self, messages) -> None:
        return None


class WebhookStreamWriter(DataSourceStreamWriter):
    """Streaming twin of WebhookWriter: every micro-batch's partitions
    POST independently; per-batch commit is a no-op (each POST is its
    own delivery unit — webhook endpoints are expected to dedup on an
    idempotency key carried in the payload when exactly-once matters)."""

    def __init__(self, options: dict[str, str]) -> None:
        self._delegate = WebhookWriter(options)

    def write(self, iterator) -> _WebhookCommit:
        return self._delegate.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        return None

    def abort(self, messages, batchId: int) -> None:
        return None


class WebhookDataSource(DataSource):
    """`df.write.format("newsflow_webhook")` — POST rows as JSON arrays
    to an endpoint, ``batch_size`` rows per request, poster injected by
    import path (same seam as the read side). The write runs one task
    per partition: at scale, request fan-out == partition count, so
    callers size it with repartition() and wrap the poster with
    `sources.fetch.resilient` for retry/rate-limit."""

    @classmethod
    def name(cls) -> str:
        return "newsflow_webhook"

    def schema(self) -> StructType:  # pragma: no cover - required ABC
        return HTTP_SCHEMA

    def writer(self, schema: StructType, overwrite: bool) -> WebhookWriter:
        return WebhookWriter(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "WebhookStreamWriter":
        return WebhookStreamWriter(self.options)


DEFAULT_POSTER = "newsflow.sources.http_datasource.urllib_poster"


def urllib_poster(endpoint: str, payload: bytes) -> tuple[int, bytes]:
    """Default stdlib POST (mirrors fetch.urllib_fetcher)."""
    import urllib.request

    req = urllib.request.Request(
        endpoint,
        data=payload,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:  # nosec B310
        return resp.status, resp.read()


def spooling_fake_poster(endpoint: str, payload: bytes) -> tuple[int, bytes]:
    """Offline poster for tests: spools each request body to the
    directory named by the endpoint's path (one file per request)."""
    import os
    import uuid as _uuid

    d = endpoint.removeprefix("spool://")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"req_{_uuid.uuid4().hex}.json"), "wb") as f:
        f.write(payload)
    return 200, b""


def spooling_fake_fetcher(
    url: str, headers: dict[str, str]
) -> tuple[int, bytes]:
    """Offline fetcher that RECORDS each request (one file per fetch in
    the spool:// directory) — lets tests assert how many fetches a scan
    actually performed (e.g. that filter pushdown pruned the rest)."""
    import os
    import uuid as _uuid

    d = os.path.dirname(url.removeprefix("spool://"))
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"fetch_{_uuid.uuid4().hex}.txt"), "w") as f:
        f.write(url)
    return 200, url.encode()
