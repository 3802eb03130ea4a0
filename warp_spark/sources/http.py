"""HTTP source (reference: Warp/Sources/Model/Steps/QBEHTTPStep.swift:16-130 —
fetch ONE URL into a one-row dataset with body/status/headers columns).

The single-fetch runs on the driver (stdlib urllib, no extra deps) and
becomes a 1-row DataFrame — matching the reference's semantics, where
the HTTP step is a *source*. Per-row fetching over an existing dataset
(the distributed case) is `warp_spark.crawl`, which rate-limits inside
each partition.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "url string, status int, body string, content_type string, "
    "error string, duration_ms long"
)


def fetch_url(
    spark: SparkSession, url: str, timeout: float = 30.0, headers: dict | None = None
) -> DataFrame:
    """Fetch one URL → one-row DataFrame
    (url, status, body, content_type, error, duration_ms)."""
    started = time.time()
    status = None
    body = None
    ctype = None
    error = None
    try:
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            status = getattr(resp, "status", None) or resp.getcode()
            ctype = resp.headers.get("Content-Type")
            body = resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as ex:
        status, error = ex.code, str(ex)
    except Exception as ex:  # URL errors, timeouts, bad schemes
        error = str(ex)
    duration_ms = int((time.time() - started) * 1000)
    return spark.createDataFrame(
        [(url, status, body, ctype, error, duration_ms)], SCHEMA
    )
