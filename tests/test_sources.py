"""Tests for the distributed ingest sources (S1, S9-S11) using
deterministic injected fetchers — the network seam the production
`urllib_fetcher` plugs into.

The fakes are defined INSIDE the tests: cloudpickle ships closures by
value, so Spark's Python workers don't need this test module importable.
"""

from __future__ import annotations

import gzip
import json

import pyspark.sql.functions as F

from newsflow.nlp.html import process_html
from newsflow.sources.fetch import (
    cdx_lookup,
    fetch_urls,
    gdelt_day_urls,
    read_wholetext,
    warc_fetch_html,
)


def test_gdelt_day_urls_schedule(spark):
    urls = gdelt_day_urls(spark, "2024-02-12", "2024-02-19")
    rows = urls.collect()
    assert len(rows) == 7
    assert rows[0]["url"].endswith("/20240212160100.gal.json.gz")


def test_fetch_urls_parallel_gunzip(spark):
    def fake_gdelt_fetcher(url: str, headers: dict) -> tuple[int, bytes]:
        if "20240213" in url:
            return 404, b""
        payload = json.dumps([{"url": url}]).encode()
        return 200, gzip.compress(payload)

    urls = gdelt_day_urls(spark, "2024-02-12", "2024-02-15")
    out = {
        r["url"]: r
        for r in fetch_urls(
            urls, fetcher=fake_gdelt_fetcher, gunzip=True, partitions=2
        ).collect()
    }
    assert len(out) == 3
    ok = [r for r in out.values() if r["status"] == 200]
    miss = [r for r in out.values() if r["status"] == 404]
    assert len(ok) == 2 and len(miss) == 1
    # gunzip applied → payload is the inner JSON bytes.
    assert json.loads(bytes(ok[0]["payload"]))[0]["url"].startswith("http")


def test_cdx_lookup_first_hit_and_miss(spark):
    def fake_cdx_fetcher(url: str, headers: dict) -> tuple[int, bytes]:
        if "missing" in url:
            return 404, b""
        line = json.dumps(
            {
                "filename": "crawl/seg-0.warc.gz",
                "offset": "1000",
                "length": "345",
            }
        )
        # Second JSON line must be ignored (first-hit semantics).
        return 200, (line + "\n" + json.dumps({"offset": "9"})).encode()

    urls = spark.createDataFrame(
        [("https://example.com/a",), ("https://example.com/missing",)],
        ["url"],
    )
    out = {
        r["url"]: r
        for r in cdx_lookup(urls, fetcher=fake_cdx_fetcher).collect()
    }
    hit = out["https://example.com/a"]
    assert hit["warc_filename"] == "crawl/seg-0.warc.gz"
    assert (hit["warc_offset"], hit["warc_length"]) == (1000, 345)
    miss = out["https://example.com/missing"]
    assert miss["warc_filename"] is None and miss["warc_offset"] is None


def test_warc_fetch_html_then_nlp_chain(spark):
    warc_record = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b'<html><p>Veo and sora VIDEO "date": "2024-05-13"</p></html>'
    )

    def fake_warc_fetcher(url: str, headers: dict) -> tuple[int, bytes]:
        assert headers.get("Range") == "bytes=1000-1344"
        return 206, gzip.compress(warc_record)

    coords = spark.createDataFrame(
        [("https://example.com/a", "crawl/seg-0.warc.gz", 1000, 345)],
        "url string, warc_filename string, warc_offset long,"
        " warc_length long",
    )
    html_df = warc_fetch_html(coords, fetcher=fake_warc_fetcher)
    row = html_df.collect()[0]
    assert row["status"] == 206
    assert row["html"].startswith("<html>")
    # The fetched HTML flows straight into the NLP operators (U1).
    proc = html_df.select(process_html(F.col("html")).alias("x")).collect()[0]
    assert proc["x"]["period"] == "May_AI_Wars"
    assert proc["x"]["text"] == "veo and sora video date 20240513"


def test_read_wholetext_recursive(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.html").write_text("<p>one</p>")
    (tmp_path / "sub" / "b.html").write_text("<p>two\nlines</p>")
    df = read_wholetext(spark, str(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r["path"])
    assert len(rows) == 2
    # wholetext: the multi-line file arrives as ONE row.
    assert rows[1]["value"] == "<p>two\nlines</p>"
    assert rows[0]["path"].endswith("a.html")


# --- resilient(): retry / backoff / rate-limit around any fetcher ----------


def test_resilient_retries_then_succeeds():
    from newsflow.sources.fetch import resilient

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky(url, headers):
        calls["n"] += 1
        return (503, b"") if calls["n"] <= 2 else (200, b"ok")

    f = resilient(
        flaky, max_retries=4, backoff_s=0.5, _sleep=sleeps.append
    )
    status, body = f("http://x/a", {})
    assert (status, body) == (200, b"ok")
    assert calls["n"] == 3
    # Exponential backoff with deterministic per-URL jitter: two sleeps,
    # second exactly double the first (same jitter factor).
    assert len(sleeps) == 2
    assert sleeps[1] == 2 * sleeps[0]
    assert 0.5 <= sleeps[0] <= 1.0  # base x jitter in [1, 2)


def test_resilient_gives_up_after_max_retries():
    from newsflow.sources.fetch import resilient

    calls = {"n": 0}

    def down(url, headers):
        calls["n"] += 1
        return 0, b""

    f = resilient(down, max_retries=3, _sleep=lambda s: None)
    status, _ = f("http://x/b", {})
    assert status == 0
    assert calls["n"] == 4  # initial + 3 retries


def test_resilient_rate_limits_per_task():
    from newsflow.sources.fetch import resilient

    clock = {"t": 0.0}
    sleeps: list[float] = []

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    f = resilient(
        lambda u, h: (200, b"x"),
        max_rps=2.0,
        _sleep=fake_sleep,
        _now=lambda: clock["t"],
    )
    for _ in range(3):
        f("http://x/c", {})
    # 2 rps -> calls gated 0.5s apart: two waits of 0.5s.
    assert sleeps == [0.5, 0.5]


def test_resilient_composes_with_fetch_urls(spark):
    from newsflow.sources.fetch import fetch_urls, resilient

    attempts: dict[str, int] = {}

    def flaky(url, headers):
        attempts[url] = attempts.get(url, 0) + 1
        return (503, b"") if attempts[url] == 1 else (200, url.encode())

    urls = spark.createDataFrame(
        [(f"http://x/{i}",) for i in range(6)], "url string"
    )
    out = fetch_urls(
        urls, fetcher=resilient(flaky, backoff_s=0.0, _sleep=lambda s: None)
    ).collect()
    assert len(out) == 6
    assert all(r["status"] == 200 for r in out)


def test_http_datasource_parallel_fetch(spark):
    from newsflow.sources.http_datasource import HttpArchiveDataSource

    spark.dataSource.register(HttpArchiveDataSource)
    urls = [f"http://example.test/day{i}.zip" for i in range(6)] + [
        "http://example.test/missing.zip"
    ]
    df = (
        spark.read.format("newsflow_http")
        .option("urls", ";".join(urls))
        .option(
            "fetcher_path",
            "newsflow.sources.http_datasource.deterministic_fake_fetcher",
        )
        .load()
    )
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == set(urls)
    assert rows["http://example.test/missing.zip"].status == 404
    ok = rows["http://example.test/day0.zip"]
    assert ok.status == 200
    assert ok.n_bytes == len(ok.payload) > 0
    # one InputPartition per URL -> full fan-out
    assert df.rdd.getNumPartitions() == len(urls)


def test_http_datasource_batched_partitions(spark):
    from newsflow.sources.http_datasource import HttpArchiveDataSource

    spark.dataSource.register(HttpArchiveDataSource)
    urls = ";".join(f"http://example.test/u{i}" for i in range(10))
    df = (
        spark.read.format("newsflow_http")
        .option("urls", urls)
        .option("urls_per_task", "4")
        .option(
            "fetcher_path",
            "newsflow.sources.http_datasource.deterministic_fake_fetcher",
        )
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(10/4)
    assert df.count() == 10


def test_synthetic_events_stream_source(spark, tmp_path):
    import time
    import uuid

    from newsflow.sources.http_datasource import (
        SyntheticEventsDataSource,
        synthetic_event,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    sink = f"synth_events_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("newsflow_events")
        .option("rows_per_batch", "50")
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(sink).count() < 100:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = sorted(
        spark.table(sink).collect(), key=lambda r: r.event_id
    )
    assert len(rows) >= 100
    # Prefix property: the drained table is exactly the deterministic
    # sequence's prefix — offsets advanced without gaps or duplicates.
    ids = [r.event_id for r in rows]
    assert ids == list(range(len(rows)))
    for r in rows[:25]:
        assert (r.event_id, r.user_id, r.event_type, r.value) == synthetic_event(
            r.event_id
        )


def test_synthetic_events_stream_recovers_from_checkpoint(spark, tmp_path):
    """Stop the stream, restart from the same checkpoint: offsets resume
    (no gaps, no duplicates) — exercising readBetweenOffsets recovery on
    the pure-function sequence. Parquet sink (memory sink does not
    support checkpoint recovery)."""
    import time

    from newsflow.sources.http_datasource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_until(min_total_rows):
        q = (
            spark.readStream.format("newsflow_events")
            .option("rows_per_batch", "40")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= min_total_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
        return spark.read.parquet(out)

    first = run_until(80).count()
    assert first >= 80
    total = run_until(first + 40)
    ids = sorted(r.event_id for r in total.collect())
    # Recovery contract: exactly-once into the file sink — the combined
    # output is a gap-free, duplicate-free prefix of the sequence.
    assert len(ids) > first
    assert ids == list(range(len(ids)))


def test_webhook_sink_posts_batched_json(spark, tmp_path):
    import json

    from newsflow.sources.http_datasource import WebhookDataSource
    from newsflow.tables import load_table
    from tests.conftest import SF_SMOKE

    spark.dataSource.register(WebhookDataSource)
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "n_chars")
        .limit(25)
        .repartition(3)
    )
    spool = tmp_path / "spool"
    (
        docs.write.format("newsflow_webhook")
        .option("endpoint", f"spool://{spool}")
        .option("batch_size", "4")
        .option(
            "poster_path",
            "newsflow.sources.http_datasource.spooling_fake_poster",
        )
        .mode("append")
        .save()
    )
    payloads = [
        json.loads(p.read_bytes()) for p in spool.glob("req_*.json")
    ]
    rows = [r for batch in payloads for r in batch]
    assert len(rows) == 25
    assert {r["doc_id"] for r in rows} == {
        r.doc_id for r in docs.collect()
    }
    assert all(len(batch) <= 4 for batch in payloads)


def test_http_datasource_filter_pushdown_prunes_fetches(spark, tmp_path):
    """A url-equality predicate must prune the work list BEFORE any
    fetch: with the spooling fetcher, exactly one request is recorded."""
    from newsflow.sources.http_datasource import HttpArchiveDataSource

    spark.dataSource.register(HttpArchiveDataSource)
    # spark.sql.python.filterPushdown.enabled is an engine default
    # (session.py BUILD_CONFS) — required once a reader implements
    # pushFilters.
    urls = [f"spool://{tmp_path}/u{i}" for i in range(8)]
    df = (
        spark.read.format("newsflow_http")
        .option("urls", ";".join(urls))
        .option(
            "fetcher_path",
            "newsflow.sources.http_datasource.spooling_fake_fetcher",
        )
        .load()
        .filter(f"url = 'spool://{tmp_path}/u3'")
    )
    rows = df.collect()
    assert [r.url for r in rows] == [f"spool://{tmp_path}/u3"]
    fetched = list(tmp_path.glob("fetch_*.txt"))
    assert len(fetched) == 1, f"pushdown failed: {len(fetched)} fetches"


def test_webhook_stream_sink_end_to_end(spark, tmp_path):
    """The full connector loop: the synthetic event stream source feeds
    the webhook stream sink — readStream format(newsflow_events) →
    writeStream format(newsflow_webhook) — with every batch spooled as
    JSON and the union a gap-free prefix of the deterministic sequence."""
    import json
    import time

    from newsflow.sources.http_datasource import (
        SyntheticEventsDataSource,
        WebhookDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(WebhookDataSource)
    spool = tmp_path / "spool"
    q = (
        spark.readStream.format("newsflow_events")
        .option("rows_per_batch", "30")
        .load()
        .writeStream.format("newsflow_webhook")
        .option("endpoint", f"spool://{spool}")
        .option("batch_size", "10")
        .option(
            "poster_path",
            "newsflow.sources.http_datasource.spooling_fake_poster",
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(list(spool.glob("req_*.json"))) < 6:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = [
        r
        for p in spool.glob("req_*.json")
        for r in json.loads(p.read_bytes())
    ]
    assert len(rows) >= 60
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(len(ids)))


def test_http_datasource_in_and_prefix_pushdown(spark, tmp_path):
    from newsflow.sources.http_datasource import HttpArchiveDataSource

    spark.dataSource.register(HttpArchiveDataSource)
    urls = [f"spool://{tmp_path}/a{i}" for i in range(4)] + [
        f"spool://{tmp_path}/b{i}" for i in range(4)
    ]

    def scan():
        return (
            spark.read.format("newsflow_http")
            .option("urls", ";".join(urls))
            .option(
                "fetcher_path",
                "newsflow.sources.http_datasource.spooling_fake_fetcher",
            )
            .load()
        )

    # IN-list: exactly 2 fetches recorded
    got = scan().filter(
        f"url IN ('spool://{tmp_path}/a1', 'spool://{tmp_path}/b2')"
    ).collect()
    assert len(got) == 2
    assert len(list(tmp_path.glob("fetch_*.txt"))) == 2
    # (LIKE-prefix is handled by the reader when Spark offers it as
    # StringStartsWith, but this Spark build does not push LIKE to
    # Python sources — correctness is unaffected, Spark filters
    # post-scan.)
