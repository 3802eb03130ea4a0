"""As-of join semantics (scale extension — the reference has no temporal
joins, WarpCore/Sources/Data.swift:113-130; see warp_spark/asof.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from warp_spark.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "p1"),
            (1, ts("2024-01-01 12:00:00"), "p2"),
            (2, ts("2024-01-01 09:00:00"), "p3"),  # before any right row
            (3, ts("2024-01-01 10:00:00"), "p4"),  # key with no right rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 10.0),
            (1, ts("2024-01-01 11:00:00"), 20.0),
            (1, ts("2024-01-01 12:00:00"), 30.0),  # equal-ts: inclusive match
            (2, ts("2024-01-01 09:30:00"), 40.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = {r["tag"]: r for r in asof_join(left, right, on="ts", by="user_id").collect()}
    assert len(out) == 4  # every left row kept
    assert out["p1"]["value"] == 10.0  # most recent at-or-before 10:00
    assert out["p2"]["value"] == 30.0  # equal timestamp matches (inclusive)
    assert out["p2"]["ts_right"] == ts("2024-01-01 12:00:00")
    assert out["p3"]["value"] is None  # no right row yet
    assert out["p4"]["value"] is None  # key absent from right


def test_tolerance(frames):
    left, right = frames
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance=F.expr("INTERVAL 30 MINUTES")
        ).collect()
    }
    assert out["p1"]["value"] == 10.0  # 30 min old — inside tolerance
    assert out["p2"]["value"] == 30.0  # exact match
    # p3/p4 unmatched stay null
    assert out["p3"]["value"] is None and out["p4"]["value"] is None


def test_tolerance_expires(spark, frames):
    left, right = frames
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance=F.expr("INTERVAL 10 MINUTES")
        ).collect()
    }
    assert out["p1"]["value"] is None  # 30 min old — too stale


def test_suffix_on_clash(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1.0)], "k long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 2.0)], "k long, ts timestamp, value double"
    )
    out = asof_join(left, right, on="ts", by="k")
    assert set(out.columns) == {"k", "ts", "value", "ts_right", "value_right"}
    row = out.collect()[0]
    assert row["value"] == 1.0 and row["value_right"] == 2.0


def test_single_shuffle_plan(frames):
    """The whole join is one window pass: exactly one Exchange in the
    physical plan (partitionBy the key), nothing broadcast."""
    left, right = frames
    explained = asof_join(left, right, on="ts", by="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in explained
    assert explained.count("Exchange hashpartitioning") == 1


def test_bucketed_equivalence_events(spark):
    """asof_join_bucketed(T) must equal asof_join(tolerance=T) on real
    event data — the hot-key-safe formulation is semantics-preserving."""
    from warp_spark.asof import asof_join, asof_join_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":  # legacy nanos-as-long testdata
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    T = 1800
    win = asof_join(
        purchases, clicks, on="ts", by="user_id",
        tolerance=F.expr(f"INTERVAL {T} SECONDS"),
    )
    buck = asof_join_bucketed(purchases, clicks, on="ts", by="user_id", tolerance_seconds=T)
    key = lambda r: (r["event_id"], r["ts_right"], r["click_value"])  # noqa: E731
    assert sorted(map(key, win.collect())) == sorted(map(key, buck.collect()))


def test_bucketed_hot_key(spark):
    """All rows on ONE key: the bucketed variant still returns the right
    matches (hot key split across time buckets, then recombined)."""
    from datetime import datetime, timedelta

    from warp_spark.asof import asof_join_bucketed

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + timedelta(minutes=m), f"p{m}") for m in range(0, 120, 7)],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, base + timedelta(minutes=m), float(m)) for m in range(0, 120, 10)],
        "k long, ts timestamp, v double",
    )
    out = {r["tag"]: r for r in asof_join_bucketed(
        left, right, on="ts", by="k", tolerance_seconds=900
    ).collect()}
    assert len(out) == len(range(0, 120, 7))
    # spot-check: left at minute 49 → latest right ≤ 49 within 15 min = 40
    assert out["p49"]["v"] == 40.0
    # left at minute 0 → right at minute 0 (inclusive, zero age)
    assert out["p0"]["v"] == 0.0


def test_forward_direction(frames):
    left, right = frames
    out = {r["tag"]: r for r in asof_join(
        left, right, on="ts", by="user_id", direction="forward").collect()}
    assert out["p1"]["value"] == 20.0   # earliest at-or-after 10:00
    assert out["p2"]["value"] == 30.0   # equal timestamp matches (inclusive)
    assert out["p3"]["value"] == 40.0   # 09:00 → forward finds 09:30
    assert out["p4"]["value"] is None


def test_nearest_direction(frames):
    left, right = frames
    out = {r["tag"]: r for r in asof_join(
        left, right, on="ts", by="user_id", direction="nearest").collect()}
    assert out["p1"]["value"] == 10.0   # 30 min back beats 60 min forward
    assert out["p2"]["value"] == 30.0   # exact
    assert out["p3"]["value"] == 40.0   # only a forward candidate exists
    assert out["p4"]["value"] is None


def test_forward_tolerance(frames):
    left, right = frames
    out = {r["tag"]: r for r in asof_join(
        left, right, on="ts", by="user_id", direction="forward",
        tolerance=F.expr("INTERVAL 45 MINUTES")).collect()}
    assert out["p1"]["value"] is None   # 60 min ahead — outside tolerance
    assert out["p3"]["value"] == 40.0   # 30 min ahead — inside


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_directions_match_pandas_merge_asof(spark, direction):
    """Differential vs pandas.merge_asof on seeded random frames (no
    exact-distance ties, where pandas' nearest tie-break differs from
    our documented backward-wins rule)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    lp = pd.DataFrame({
        "k": rng.integers(0, 4, 300),
        "t": rng.integers(0, 100_000, 300) * 2,       # even times
    }).sort_values("t").reset_index(drop=True)
    rp = pd.DataFrame({
        "k": rng.integers(0, 4, 200),
        "t": rng.integers(0, 100_000, 200) * 2 + 1,   # odd times → no ties
        "v": rng.random(200).round(6),
    }).sort_values("t").reset_index(drop=True)
    expected = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)

    l = spark.createDataFrame(lp, "k long, t long")
    r = spark.createDataFrame(rp, "k long, t long, v double")
    got = asof_join(l, r, on="t", by="k", direction=direction).toPandas()

    key = lambda df: sorted(
        (int(k), int(t), None if pd.isna(v) else round(float(v), 6))
        for k, t, v in zip(df["k"], df["t"], df["v"])
    )
    assert key(got) == key(expected)
