"""Distributed ingest sources (SURVEY.md §2.1 S9–S12): GDELT daily-dump
fetch, Common-Crawl CDX index lookup, and WARC range-reads — as Spark
jobs, not driver loops.

The reference runs all of these as *sequential driver-side `requests`
loops* (gdelt/sourcing/gdelt-raw.py:42-56 fetch+gunzip;
common-crawl/sourcing/common-crawl.ipynb cells 5-11 CDX lookup and WARC
range-read per URL, one at a time). At 100 TB the URL table is a
DataFrame and the fetch is a `mapInPandas` stage: each Arrow batch of
URLs is fetched inside the executor, so throughput scales with the
cluster and failures retry per-task instead of restarting the driver
loop.

Network access is injected: every operator takes a `fetcher(url,
headers) -> (status, bytes)` callable. Production uses `urllib_fetcher`;
tests (and this offline container) inject deterministic fakes. The
operators never import requests/boto3 — object-store IO is Spark-native
(`spark.read`/`write` against s3a://, replacing S12's boto3 loops).
"""

from __future__ import annotations

import gzip
import io
import json
from collections.abc import Callable, Iterator
from datetime import datetime, timedelta

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# fetcher(url, headers) -> (http_status, body_bytes)
Fetcher = Callable[[str, dict[str, str]], tuple[int, bytes]]


def urllib_fetcher(url: str, headers: dict[str, str]) -> tuple[int, bytes]:
    """Default stdlib fetcher (no third-party deps). Executors construct
    it lazily — never pickled sockets, just this module-level function."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except Exception:
        return 0, b""


RETRYABLE_STATUSES = (0, 429, 500, 502, 503, 504)


def resilient(
    fetcher: Fetcher,
    max_retries: int = 4,
    backoff_s: float = 0.5,
    retry_on: tuple[int, ...] = RETRYABLE_STATUSES,
    max_rps: float | None = None,
    _sleep: Callable[[float], None] | None = None,
    _now: Callable[[], float] | None = None,
) -> Fetcher:
    """Retry / backoff / rate-limit decorator for any ``Fetcher`` — what
    a real Common-Crawl or GDELT ingest needs around the raw HTTP call
    (the reference's notebook loops die on the first 503;
    common-crawl.ipynb cells 5-10 have no retry at all).

    - Transient statuses (connection failure 0, 429, 5xx) retry up to
      ``max_retries`` times with exponential backoff.
    - Backoff carries a DETERMINISTIC per-URL jitter (crc32, not
      random): when a fleet of executors hits one throttling endpoint,
      their retries decorrelate, yet every run stays reproducible.
    - ``max_rps`` throttles the PER-TASK request rate with a
      monotonic-clock interval gate. Cluster-wide politeness = max_rps ×
      concurrent fetch tasks — size it for the target service (e.g.
      Common Crawl asks for ~1 req/s total: cap partitions × max_rps).

    ``_sleep``/``_now`` are injectable for offline tests; production
    uses the real clock. Compose as
    ``fetch_urls(urls, fetcher=resilient(urllib_fetcher, max_rps=1))``.
    """
    import time
    import zlib

    sleep = _sleep or time.sleep
    now = _now or time.monotonic
    min_interval = (1.0 / max_rps) if max_rps else 0.0
    state = {"next_ok": 0.0}

    def wrapped(url: str, headers: dict[str, str]) -> tuple[int, bytes]:
        status, body = 0, b""
        for attempt in range(max_retries + 1):
            if min_interval:
                wait = state["next_ok"] - now()
                if wait > 0:
                    sleep(wait)
                state["next_ok"] = now() + min_interval
            status, body = fetcher(url, headers)
            if status not in retry_on:
                return status, body
            if attempt < max_retries:
                jitter = 1.0 + (zlib.crc32(url.encode()) % 1000) / 1000.0
                sleep(backoff_s * (2**attempt) * jitter)
        return status, body

    return wrapped


# --- S9: GDELT daily-dump URL generation + parallel fetch ------------------

GDELT_GAL_TEMPLATE = (
    "http://data.gdeltproject.org/gdeltv3/gal/{ts}.gal.json.gz"
)


def gdelt_day_urls(
    spark: SparkSession, start: str, end: str, hour: int = 16, minute: int = 1
) -> DataFrame:
    """One row per day in [start, end): the reference's URL schedule
    (gdelt-raw.py:24-38 — daily 16:01:00 timestamps)."""
    cur = datetime.strptime(start, "%Y-%m-%d").replace(
        hour=hour, minute=minute
    )
    stop = datetime.strptime(end, "%Y-%m-%d").replace(hour=hour, minute=minute)
    rows = []
    while cur < stop:
        ts = cur.strftime("%Y%m%d%H%M%S")
        rows.append((ts, GDELT_GAL_TEMPLATE.format(ts=ts)))
        cur += timedelta(days=1)
    from newsflow.tables import local_df

    return local_df(spark, rows, "ts string, url string")


FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def fetch_urls(
    urls: DataFrame,
    fetcher: Fetcher = urllib_fetcher,
    url_col: str = "url",
    gunzip: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """S9 — parallel fetch of a URL table; optional gzip decompression
    (gdelt-raw.py:52-56). Output: (url, status, payload BINARY).

    Repartitions before the fetch so the cluster fans out even when the
    URL list arrives as one small file/partition.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "status": [], "payload": []}
            for u in pdf[url_col]:
                status, body = fetcher(u, {})
                if gunzip and status == 200 and body[:2] == b"\x1f\x8b":
                    body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
                out["url"].append(u)
                out["status"].append(status)
                out["payload"].append(body)
            yield pd.DataFrame(out)

    n = partitions or urls.sparkSession.sparkContext.defaultParallelism
    return urls.repartition(n).mapInPandas(batches, schema=FETCH_SCHEMA)


# --- S10: Common-Crawl CDX index lookup ------------------------------------

CDX_TEMPLATE = (
    "https://index.commoncrawl.org/{index}-index?url={url}&output=json"
)

CDX_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_filename", StringType()),
        StructField("warc_offset", LongType()),
        StructField("warc_length", LongType()),
    ]
)


def cdx_lookup(
    urls: DataFrame,
    index: str = "CC-MAIN-2024-22",
    fetcher: Fetcher = urllib_fetcher,
    url_col: str = "url",
    partitions: int | None = None,
) -> DataFrame:
    """S10 — resolve each article URL to its WARC record coordinates via
    the Common-Crawl CDX API (common-crawl.ipynb cells 5-7: first JSON
    hit → filename/offset/length; miss → null row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "url": [],
                "warc_filename": [],
                "warc_offset": [],
                "warc_length": [],
            }
            for u in pdf[url_col]:
                status, body = fetcher(
                    CDX_TEMPLATE.format(index=index, url=u), {}
                )
                fn, off, ln = None, None, None
                if status == 200 and body:
                    try:
                        hit = json.loads(body.splitlines()[0])
                        fn = hit.get("filename")
                        off = int(hit["offset"]) if "offset" in hit else None
                        ln = int(hit["length"]) if "length" in hit else None
                    except (json.JSONDecodeError, KeyError, ValueError):
                        pass
                out["url"].append(u)
                out["warc_filename"].append(fn)
                out["warc_offset"].append(off)
                out["warc_length"].append(ln)
            pdf_out = pd.DataFrame(out)
            pdf_out["warc_offset"] = pdf_out["warc_offset"].astype("Int64")
            pdf_out["warc_length"] = pdf_out["warc_length"].astype("Int64")
            yield pdf_out

    n = partitions or urls.sparkSession.sparkContext.defaultParallelism
    return urls.repartition(n).mapInPandas(batches, schema=CDX_SCHEMA)


# --- S11: WARC range-read + HTML extraction --------------------------------

WARC_PREFIX = "https://data.commoncrawl.org/"

WARC_HTML_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("html", StringType()),
    ]
)


def warc_fetch_html(
    coords: DataFrame,
    fetcher: Fetcher = urllib_fetcher,
    partitions: int | None = None,
) -> DataFrame:
    """S11 — HTTP Range-read each WARC record, gunzip, and split off the
    HTML body (common-crawl.ipynb cells 9-10: record = WARC headers
    \\r\\n\\r\\n HTTP headers \\r\\n\\r\\n body)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "status": [], "html": []}
            for _, row in pdf.iterrows():
                u = row["url"]
                html, status = None, 0
                if row["warc_filename"] is not None and pd.notna(
                    row["warc_offset"]
                ):
                    start = int(row["warc_offset"])
                    end = start + int(row["warc_length"]) - 1
                    status, body = fetcher(
                        WARC_PREFIX + row["warc_filename"],
                        {"Range": f"bytes={start}-{end}"},
                    )
                    if status in (200, 206) and body:
                        try:
                            raw = gzip.GzipFile(
                                fileobj=io.BytesIO(body)
                            ).read()
                            parts = raw.split(b"\r\n\r\n", 2)
                            if len(parts) == 3:
                                html = parts[2].decode(
                                    "utf-8", errors="replace"
                                )
                        except OSError:
                            pass
                out["url"].append(u)
                out["status"].append(status)
                out["html"].append(html)
            yield pd.DataFrame(out)

    n = partitions or coords.sparkSession.sparkContext.defaultParallelism
    return coords.repartition(n).mapInPandas(batches, schema=WARC_HTML_SCHEMA)


# --- S1: whole-file recursive text scan ------------------------------------


def read_wholetext(spark: SparkSession, path: str) -> DataFrame:
    """S1 — every file under `path` as one row (nlp_analysis.py:34-37),
    with the source file path attached (the reference loses provenance;
    input_file_name keeps it)."""
    return (
        spark.read.format("text")
        .option("recursiveFileLookup", "true")
        .option("wholetext", "true")
        .load(path)
        .withColumn("path", F.input_file_name())
    )
