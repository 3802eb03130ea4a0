"""Bucketed-table layout: joins and aggregates on the bucket key must
plan with no Exchange (the pay-the-shuffle-once-at-ingest primitive)."""

import pytest
from pyspark.sql import functions as F

from warp_spark.bucketing import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8, path=str(base / "li"))
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, path=str(base / "ord"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    old = _no_broadcast(spark)
    try:
        j = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: join actually produces rows
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregate_no_exchange(bucketed):
    spark = bucketed
    agg = (
        spark.table("t_lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_unbucketed_join_does_exchange(bucketed):
    """Control: the same join on plain parquet reads shuffles both
    sides — proves the bucketed plan difference is real."""
    spark = bucketed
    old = _no_broadcast(spark)
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
