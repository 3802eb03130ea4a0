"""Z-order layout: the Morton index must interleave bits correctly, and
the z-ordered parquet layout must prune MORE row groups than a linear
sort on a two-dimensional rectangle predicate — checked against the
actual parquet min/max metadata, which is exactly what Spark's scan
uses to skip."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from warp_spark.layout import morton_index, write_zordered


def test_morton_bit_interleaving(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["m"]
        for r in df.select("x", "y", morton_index(["x", "y"]).alias("m")).collect()
    }

    def ref(x, y):
        m = 0
        for i in range(16):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    for (x, y), m in got.items():
        assert m == ref(x, y)
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(1, 1)] == 3


def test_morton_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        morton_index(["x"])
    with pytest.raises(ValueError):
        morton_index(["x", "y", "z"], bits=32)


def _overlapping_row_groups(path, x_col, y_col, x_rng, y_rng):
    """Row groups whose [min,max] stats intersect the rectangle — the
    groups a stats-pruning reader must actually read."""
    import glob
    import os

    n_total = n_hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx = rg.column(idx[x_col]).statistics
            sy = rg.column(idx[y_col]).statistics
            n_total += 1
            if sx.max >= x_rng[0] and sx.min <= x_rng[1] and sy.max >= y_rng[0] and sy.min <= y_rng[1]:
                n_hit += 1
    return n_hit, n_total


def test_zorder_prunes_more_than_linear_sort(spark, tmp_path):
    # uniform 256x256 grid: both dimensions matter for a rectangle query
    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    # force many small row groups so there is something to prune
    # (parquet.block.size is a Hadoop conf — runtime spark.conf.set does
    # not reach the writer)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(16 * 1024))
    try:
        linear = str(tmp_path / "linear")
        zordered = str(tmp_path / "zorder")
        (
            grid.repartitionByRange(8, "x")
            .sortWithinPartitions("x", "y")
            .write.mode("overwrite")
            .parquet(linear)
        )
        write_zordered(grid, zordered, ["x", "y"], bits=8, num_files=8)
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    rect = ((100, 131), (100, 131))  # 32x32 box = 1.5% of the grid
    lin_hit, lin_total = _overlapping_row_groups(linear, "x", "y", *rect)
    z_hit, z_total = _overlapping_row_groups(zordered, "x", "y", *rect)
    # sanity: comparable file structure on both sides
    assert lin_total > 8 and z_total > 8
    # the x-sorted layout prunes x only — every x-overlapping group
    # spans all y; the z-ordered layout is local in both dims
    assert z_hit < lin_hit
    assert z_hit / z_total < 0.5
    # correctness: both layouts return the same rows for the rectangle
    q = lambda p: spark.read.parquet(p).filter(
        F.col("x").between(*rect[0]) & F.col("y").between(*rect[1])
    )
    assert sorted(r["payload"] for r in q(zordered).collect()) == sorted(
        r["payload"] for r in q(linear).collect()
    )
