"""Bucketed-table utilities: pre-shuffle once at write time, join
shuffle-free forever after.

The reference is single-node and has no layout concept (its SQL tier
pushes joins to the source database instead, SQL.swift:1390-1427). At
cluster scale, the dominant cost of a fact-fact join is shuffling both
sides on the key; bucketing both tables on the join key with the same
bucket count persists that partitioning in the table layout, so every
subsequent join/aggregate on the key reads co-located buckets and plans
with NO Exchange. This is the "reuse a partitioning across stages"
primitive: pay the shuffle once at ingest, amortize it over every query.

Usage:
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 64, path=...)
    write_bucketed(orders,   "orders_b",   ["o_orderkey"], 64, path=...)
    spark.table("lineitem_b").join(spark.table("orders_b"), ...)  # 0 shuffles
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``sort_cols`` additionally sorts within each bucket file so
    sort-merge joins skip their per-task sort.

    Bucket count guidance at scale: pick so one bucket of the LARGEST
    co-bucketed table fits an executor's memory (e.g. 100 TB / 4096
    buckets ≈ 25 GB — too big; use 32k buckets ≈ 3 GB)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (the bucket spec rides in the catalog
    entry, so joins/aggregations on the bucket key skip their
    Exchange)."""
    return spark.table(table)
