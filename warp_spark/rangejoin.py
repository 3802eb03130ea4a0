"""Range (interval) join — scale extension beyond the reference
(pixelspark/warp joins support only equality-factorable or
nested-loop predicates, WarpCore/Sources/Data.swift:113-145; no
interval/temporal joins).

``range_join(left, right)`` pairs every left interval
``[start_col, end_col]`` with every right point ``ts_col`` that falls
inside it (optionally also matching equality keys). The naive
formulation is an inequality theta-join, which Spark can only plan as
BroadcastNestedLoop — quadratic work and a full broadcast.

Spark-first shape: quantize time into buckets. Each left interval
explodes to the buckets it covers; each right point maps to exactly ONE
bucket; an equi-join on (keys, bucket) co-partitions candidates and a
residual filter applies the exact containment. Because the point side
has a single bucket, every qualifying pair is emitted exactly once — no
dedup pass. Cost: one shuffle join on (keys, bucket); the explode
factor is ceil(interval/bucket)+1, so pick ``bucket`` near the typical
interval length.

At 100 TB the same plan holds: both sides shuffle-partition on
(keys, bucket); a hot bucket is still bounded by bucket width, and AQE
skew-join splits oversized partitions.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColsLike = Union[str, Sequence[str]]


def _as_list(v: ColsLike) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def range_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    by: ColsLike = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join: left interval rows × right point rows with
    ``start <= ts <= end`` (and equal ``by`` keys). Interval bounds are
    inclusive. Output carries all left columns plus the right columns
    (clashing right names are suffixed ``_right``).

    ``bucket_seconds`` tunes the explode factor vs. candidate
    selectivity; set it near the typical interval length.
    """
    by = _as_list(by)

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))

    lb = left.withColumn(
        "__rj_bucket",
        F.explode(F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))),
    )
    rename = {c: c + "_right" for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_ts = rename.get(ts_col, ts_col)
    rb = r.withColumn("__rj_bucket", bucket_of(F.col(r_ts)))

    cond = [lb["__rj_bucket"] == rb["__rj_bucket"]] + [
        lb[k] == rb[rename.get(k, k)] for k in by
    ]
    out = (
        lb.join(rb, on=cond)
        .filter(F.col(r_ts).between(F.col(start_col), F.col(end_col)))
        .drop(lb["__rj_bucket"])
        .drop(rb["__rj_bucket"])
    )
    # by-keys exist on both sides post-join; drop the renamed right copies
    for k in by:
        if k in rename:
            out = out.drop(rename[k])
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: ColsLike = (),
    bucket_seconds: int = 3600,
    suffix: str = "_right",
) -> DataFrame:
    """Interval-overlap inner join: pairs where
    ``l_start <= r_end AND r_start <= l_end`` (inclusive overlap), with
    optional equality keys. Generalizes ``range_join`` to
    interval × interval (concurrent sessions, co-occurring incidents).

    Both sides explode to the time buckets they cover and equi-join on
    (keys, bucket). Every overlapping pair shares the bucket containing
    ``greatest(l_start, r_start)`` (both intervals cover max(start)), so
    requiring ``bucket == floor(greatest(l_start, r_start)/B)`` emits
    each pair EXACTLY once — no dedup shuffle. Cost: one shuffle join on
    (keys, bucket); explode factor = ceil(interval/bucket)+1 per side.
    """
    by = _as_list(by)

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))

    lb = left.withColumn(
        "__ij_bucket",
        F.explode(F.sequence(bucket_of(F.col(l_start)), bucket_of(F.col(l_end)))),
    )
    rename = {c: c + suffix for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rs, re_ = rename.get(r_start, r_start), rename.get(r_end, r_end)
    rb = r.withColumn(
        "__ij_bucket",
        F.explode(F.sequence(bucket_of(F.col(rs)), bucket_of(F.col(re_)))),
    )
    cond = [lb["__ij_bucket"] == rb["__ij_bucket"]] + [
        lb[k] == rb[rename.get(k, k)] for k in by
    ]
    out = (
        lb.join(rb, on=cond)
        .filter(
            (F.col(l_start) <= F.col(re_))
            & (F.col(rs) <= F.col(l_end))
            # emit-once: only the bucket holding the later of the two starts
            & (
                lb["__ij_bucket"]
                == F.floor(
                    F.unix_timestamp(F.greatest(F.col(l_start), F.col(rs)))
                    / F.lit(bucket_seconds)
                )
            )
        )
        .drop(lb["__ij_bucket"])
        .drop(rb["__ij_bucket"])
    )
    for k in by:
        if k in rename:
            out = out.drop(rename[k])
    return out
