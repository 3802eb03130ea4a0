"""Crawl / HTTP-fetch operators.

Reference: QBECrawlStep.swift:17-280 (per-row URL fetch adding
body/status/error/duration columns, with concurrency + rate limits) and
QBEHTTPStep.swift:16-130 (single-URL one-row source).

Spark-first design: the fetch tier is ``mapInPandas`` — each partition
is an independent worker holding its own HTTP session, so cluster-wide
concurrency = #partitions × per-partition concurrency, and the rate
limit is enforced per partition (global limit ÷ partitions), the only
coordination-free way to rate-limit on a cluster.

The network call itself is pluggable: this container has no network
access and no HTTP client library, so the default fetcher is a
deterministic offline stub (clearly marked). Pass ``fetcher=`` to plug
a real one (e.g. ``requests``-based) in a networked deployment; the
Spark plumbing — schema, batching, rate limiting, error capture — is
identical either way.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (status, body, error) returned by a fetcher
FetchResult = tuple

CRAWL_FIELDS = [
    T.StructField("body", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("error", T.StringType()),
    T.StructField("duration_ms", T.DoubleType()),
]


def offline_stub_fetcher(url: str) -> FetchResult:
    """Deterministic stand-in for a real HTTP GET (no network in this
    environment). Produces a stable pseudo-body/status per URL so the
    plumbing is testable; NOT a real fetch."""
    import hashlib

    if not url or "://" not in url:
        return (None, None, "invalid URL")
    h = hashlib.md5(url.encode()).hexdigest()
    status = 200 if int(h[:2], 16) >= 16 else 404  # ~6% deterministic 404s
    body = f"<stub {h}>" if status == 200 else None
    return (status, body, None)


def requests_fetcher(timeout: float = 10.0) -> Callable[[str], FetchResult]:
    """Real-network fetcher factory (requires the ``requests`` package —
    unavailable here; import is deferred until first call)."""

    def fetch(url: str) -> FetchResult:
        try:
            import requests  # deferred: not installed in this container
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real HTTP fetch needs the 'requests' package"
            ) from e
        try:
            r = requests.get(url, timeout=timeout)
            return (r.status_code, r.text, None)
        except Exception as e:  # noqa: BLE001 — error column, not a crash
            return (None, None, str(e))

    return fetch


def crawl(
    df: DataFrame,
    url_col: str,
    fetcher: Optional[Callable[[str], FetchResult]] = None,
    max_requests_per_second: Optional[float] = None,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Per-row fetch of ``url_col`` adding body/status/error/duration_ms
    (QBECrawlStep semantics). Rate limit is split across partitions."""
    fetch = fetcher or offline_stub_fetcher
    if partitions is not None:
        df = df.repartition(partitions)
    n_parts = partitions or df.rdd.getNumPartitions() or 1
    per_part_rps = (
        max_requests_per_second / max(n_parts, 1) if max_requests_per_second else None
    )
    out_schema = T.StructType(list(df.schema.fields) + CRAWL_FIELDS)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        min_interval = 1.0 / per_part_rps if per_part_rps else 0.0
        last = 0.0
        for pdf in batches:
            bodies, statuses, errors, durations = [], [], [], []
            for url in pdf[url_col]:
                if min_interval:
                    wait = last + min_interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                t0 = time.monotonic()
                try:
                    status, body, error = fetch(None if url is None else str(url))
                except Exception as e:  # noqa: BLE001
                    status, body, error = None, None, str(e)
                durations.append((time.monotonic() - t0) * 1000.0)
                statuses.append(status)
                bodies.append(body)
                errors.append(error)
            pdf = pdf.copy()
            pdf["body"] = bodies
            pdf["status"] = pd.array(statuses, dtype="Int32")
            pdf["error"] = errors
            pdf["duration_ms"] = durations
            yield pdf

    return df.mapInPandas(run, out_schema)


def http_source(
    spark: SparkSession,
    url: str,
    fetcher: Optional[Callable[[str], FetchResult]] = None,
) -> DataFrame:
    """Single-URL, single-row source (QBEHTTPStep.swift:16-130)."""
    one = spark.createDataFrame([(url,)], "url string")
    return crawl(one, "url", fetcher=fetcher)
