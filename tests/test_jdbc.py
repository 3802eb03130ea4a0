"""Live JDBC round-trip through warp_spark.sources.jdbc, using the
embedded Derby driver that ships inside Spark's own jar directory — a
real database write + read + predicate/pruning pushdown, no network and
no vendored drivers. (Reference parity: WarpConduit's SQLite bridge,
SQLiteStream.swift:238-738 — dialect handling is Spark's JDBC dialect
registry; this proves the plumbing end-to-end.)"""

import pytest
from pyspark.sql import functions as F

from warp_spark.sources.jdbc import (
    DRIVERS,
    jdbc_url,
    read_derby,
    read_jdbc,
    write_jdbc,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("jdbc") / "derbydb")
    src = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        # unordered limit() is not deterministic across jobs — pin the
        # subset so the write job and the comparison collect agree
        .orderBy("o_orderkey")
        .limit(500)
    )
    write_jdbc(
        src,
        jdbc_url("derby", database=db, create=True),
        "orders_rt",
        mode="overwrite",
        driver=DRIVERS["derby"],
    )
    return db, src


def test_round_trip_values(spark, derby_db):
    db, src = derby_db
    back = read_derby(spark, db, "orders_rt")
    assert back.count() == 500
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_predicate_and_pruning_pushdown(spark, derby_db):
    db, _ = derby_db
    back = read_derby(spark, db, "orders_rt").filter(
        F.col("o_totalprice") > 100000
    ).select("o_orderkey", "o_totalprice")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter and the 2-column projection must reach the JDBC scan
    assert "PushedFilters: [" in plan and "O_TOTALPRICE" in plan.upper()
    # every returned row respects the predicate, and some rows survive it
    assert back.filter(F.col("o_totalprice") <= 100000).count() == 0
    assert back.count() > 0


def test_partitioned_parallel_read(spark, derby_db):
    db, src = derby_db
    lo = src.agg(F.min("o_orderkey")).collect()[0][0]
    hi = src.agg(F.max("o_orderkey")).collect()[0][0]
    back = read_jdbc(
        spark,
        jdbc_url("derby", database=db),
        "orders_rt",
        driver=DRIVERS["derby"],
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 500
