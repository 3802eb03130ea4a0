"""Skew-handling utilities for hot-key joins and aggregations.

AQE's skew-join split (enabled by default in ``get_spark``) handles
skew discovered at runtime; these utilities are the *planned* variant
for keys known to be pathological (a null-heavy FK, one giant
customer, an 'unknown' category) — the standard salting pattern:

- join: the skewed (large) side gets a uniform random salt in
  [0, salt_buckets); the build side is replicated once per salt value.
  The join key becomes (key, salt), splitting each hot key's rows
  across ``salt_buckets`` reducers. Replication multiplies the build
  side ×salt_buckets, so salt only against a broadcast-size or
  moderately sized right side.
- aggregation: two-phase — partial-aggregate on (key, salt), then
  final-aggregate on key. Only decomposable reducers qualify (the
  Aggregator contract already guarantees this, Aggregation.swift:29-30).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than
    the cluster has cores — the under-parallelism guard for CPU-heavy
    (Python/Arrow UDF) stages.

    A small parquet file reads as ONE partition (it fits in a single
    ``maxPartitionBytes`` split), which serializes any expensive
    per-partition work downstream; at real scale inputs arrive in many
    splits and this is a no-op. Checking ``getNumPartitions`` analyzes
    the plan but runs no job."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ×salt_buckets. Result equals ``skewed.join(other, on,
    how)`` for inner/left joins on equality keys."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    s = skewed.withColumn(SALT, (F.rand() * salt_buckets).cast("int"))
    o = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = s.join(o, on=[*on, SALT], how=how)
    return joined.drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-safe aggregation: partial sums/counts on (keys, salt) then a
    final combine on keys, so one hot key never lands on one reducer.

    (Spark's hash aggregate already does map-side partials; this adds a
    *reduce-side* split for the case where even the partially-aggregated
    hot key overwhelms a single task — e.g. high-cardinality payloads
    per key.)"""
    salted = df.withColumn(SALT, (F.rand() * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(F.col(c)).alias(f"__sum_{c}") for c in sums],
    )
    final = partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("count"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums],
    )
    return final if counts else final.drop("count")
