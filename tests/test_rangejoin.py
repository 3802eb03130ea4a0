"""Range (interval) join semantics (scale extension; warp_spark/rangejoin.py)."""

from datetime import datetime

import pytest

from warp_spark.rangejoin import range_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    intervals = spark.createDataFrame(
        [
            (1, "a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
            (2, "a", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")),
            (3, "b", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
            # interval spanning many buckets
            (4, "a", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
        ],
        "iid long, k string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, "a", ts("2024-01-01 10:35:00")),  # in 1, 2, 4
            (11, "a", ts("2024-01-01 11:00:00")),  # in 1 (inclusive end), 4
            (12, "a", ts("2024-01-01 12:00:00")),  # in 4 only
            (13, "b", ts("2024-01-01 10:35:00")),  # in 3 only (key b)
            (14, "a", ts("2024-01-03 00:00:00")),  # in none
        ],
        "pid long, k string, ts timestamp",
    )
    return intervals, points


def expected_pairs():
    return {(1, 10), (2, 10), (4, 10), (1, 11), (4, 11), (4, 12), (3, 13)}


@pytest.mark.parametrize("bucket", [300, 3600, 86400])
def test_containment_all_buckets(frames, bucket):
    """Result is bucket-size-invariant (bucketing is an implementation
    detail, not semantics) and each pair appears exactly once."""
    intervals, points = frames
    rows = range_join(
        intervals, points, "start_ts", "end_ts", "ts", by="k", bucket_seconds=bucket
    ).collect()
    got = [(r["iid"], r["pid"]) for r in rows]
    assert len(got) == len(set(got))  # no duplicate pairs from bucketing
    assert set(got) == expected_pairs()


def test_columns(frames):
    intervals, points = frames
    out = range_join(intervals, points, "start_ts", "end_ts", "ts", by="k")
    assert set(out.columns) == {"iid", "k", "start_ts", "end_ts", "pid", "ts"}


def test_no_broadcast_nested_loop(frames):
    """The plan must be an equi-join on (key, bucket), never
    BroadcastNestedLoop (the naive inequality-join physical plan)."""
    intervals, points = frames
    plan = (
        range_join(intervals, points, "start_ts", "end_ts", "ts", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def interval_frames(spark):
    a = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
            (2, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")),
            (3, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),  # long
        ],
        "aid long, a_start timestamp, a_end timestamp",
    )
    b = spark.createDataFrame(
        [
            (10, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")),  # in 1, 3
            (11, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00")),  # touches 1 (inclusive), 3
            (12, ts("2024-01-01 13:30:00"), ts("2024-01-01 14:00:00")),  # in 3 only
            (13, ts("2024-01-02 06:00:00"), ts("2024-01-02 07:00:00")),  # none
        ],
        "bid long, b_start timestamp, b_end timestamp",
    )
    return a, b


def interval_expected():
    return {(1, 10), (3, 10), (1, 11), (3, 11), (3, 12)}


@pytest.mark.parametrize("bucket", [600, 3600, 86400])
def test_interval_overlap_all_buckets(interval_frames, bucket):
    from warp_spark.rangejoin import interval_join

    a, b = interval_frames
    rows = interval_join(
        a, b, "a_start", "a_end", "b_start", "b_end", bucket_seconds=bucket
    ).collect()
    got = [(r["aid"], r["bid"]) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == interval_expected()


def test_interval_join_clash_suffix(spark):
    from warp_spark.rangejoin import interval_join

    a = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))],
        "sid long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(a, a, "start_ts", "end_ts", "start_ts", "end_ts")
    assert set(out.columns) == {
        "sid", "start_ts", "end_ts", "sid_right", "start_ts_right", "end_ts_right"
    }
    assert out.count() == 1  # self-overlap
