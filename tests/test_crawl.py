"""Crawl/HTTP plumbing tests (QBECrawlStep.swift:17-280 semantics) —
the fetch layer is the deterministic offline stub; what's under test is
the Spark plumbing: schema, per-partition execution, error capture,
rate limiting."""

import time

import pytest
from pyspark.sql import functions as F

from warp_spark.crawl import crawl, http_source, offline_stub_fetcher


def test_crawl_adds_columns_preserves_input(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, "https://example.com/b")],
        "id int, url string",
    )
    out = crawl(df, "url")
    assert out.columns == ["id", "url", "body", "status", "error", "duration_ms"]
    got = {r["id"]: r for r in out.collect()}
    assert set(got) == {1, 2}
    for r in got.values():
        assert (r["status"] == 200 and r["body"]) or (r["status"] == 404)
        assert r["error"] is None


def test_crawl_deterministic(spark):
    df = spark.createDataFrame([("https://example.com/x",)], "url string")
    a = crawl(df, "url").select("body", "status").collect()
    b = crawl(df, "url").select("body", "status").collect()
    assert a == b


def test_crawl_invalid_url_error_column(spark):
    df = spark.createDataFrame([("not-a-url",), (None,)], "url string")
    out = crawl(df, "url").collect()
    for r in out:
        assert r["status"] is None
        assert r["error"] == "invalid URL"


def test_crawl_custom_fetcher_exception_captured(spark):
    def boom(url):
        raise RuntimeError("fetch exploded")

    df = spark.createDataFrame([("https://x/",)], "url string")
    r = crawl(df, "url", fetcher=boom).collect()[0]
    assert r["status"] is None and r["body"] is None
    assert "fetch exploded" in r["error"]


def test_crawl_rate_limit_slows_partition(spark):
    urls = [(f"https://example.com/{i}",) for i in range(6)]
    df = spark.createDataFrame(urls, "url string")
    t0 = time.monotonic()
    crawl(df, "url", max_requests_per_second=10.0, partitions=1).collect()
    elapsed = time.monotonic() - t0
    # 6 requests at ≤10 rps on one partition ≥ ~0.5 s
    assert elapsed >= 0.4


def test_http_source_one_row(spark):
    out = http_source(spark, "https://example.com/")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://example.com/"
