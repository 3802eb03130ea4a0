"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet data skipping.

A 100 TB table filtered on TWO dimensions can't be helped by a linear
sort: sorting on x makes every row group span the full y range, so a
(x, y) rectangle predicate prunes on x only. Interleaving the bits of
both keys (the Morton / Z-order curve) makes row groups local in BOTH
dimensions, so min/max statistics prune on each — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything here is pure integer Column arithmetic (shift/and/or) in
whole-stage codegen — no UDF — and the layout write is
``repartitionByRange(morton)`` + ``sortWithinPartitions``: one range
shuffle at ingest, the same pay-once discipline as bucketing.py.

``tests/test_layout.py`` proves the skip: on a 2-D rectangle predicate
the z-ordered file has strictly fewer row groups overlapping the
predicate (by parquet min/max metadata) than the linearly-sorted one.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Union[Column, str]


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def morton_index(cols: Sequence[ColumnLike], bits: int = 16) -> Column:
    """Interleaved-bit (Morton / Z-order) index of k non-negative
    integer columns, ``bits`` low bits each (values are masked to
    ``bits`` bits — bucketize wider domains first). Bit i of column j
    lands at output position ``i * k + j``; the result fits a long for
    ``k * bits <= 63``."""
    k = len(cols)
    if k < 2:
        raise ValueError("morton_index needs at least 2 columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = _col(c).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j
                ).cast("long")
            )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``zorder_by``: range-partition on the morton index (one shuffle),
    sort within partitions, drop the helper column. Readers filtering
    on any subset of ``zorder_by`` then prune row groups via parquet
    min/max stats."""
    m = morton_index(list(zorder_by), bits).alias("__z")
    (
        df.withColumn("__z", m)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet (one directory per
    distinct partition-column tuple) — the COARSE layout dimension
    complementing Z-order's row-group clustering: a reader filtering on
    a partition column never lists, opens, or schedules the excluded
    directories (pruning happens at planning time, before a byte is
    read — ``PartitionFilters`` in the scan, proven by
    tests/test_plans.py). The 100 TB discipline: partition on the
    low-cardinality always-filtered dimensions (date, source, type) and
    cluster WITHIN partitions on the high-cardinality ones; keep the
    partition count in the thousands — every directory costs listing
    metadata and at least one file."""
    df.write.mode(mode).partitionBy(*list(partition_by)).parquet(path)
