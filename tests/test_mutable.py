"""MutableDataset surface tests (MutableData.swift:40-63 contract):
insert / update / delete / truncate / alter / rename / drop over
parquet-backed managed tables with atomic version swaps."""

import pytest
from pyspark.sql import functions as F

from warp_spark.mutable import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_create_and_read(spark, wh):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    t = wh.create("t1", df)
    assert rows(t.read()) == [(1, "a"), (2, "b")]
    assert wh.tables() == ["t1"]


def test_insert_appends_and_aligns_by_name(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1, "a")], "id int, v string"))
    # insert with reordered + missing columns: aligns by name, pads NULL
    t.insert(spark.createDataFrame([("c",)], "v string"))
    t.insert(spark.createDataFrame([(3, "d")], "id int, v string"))
    assert rows(t.read()) == [(1, "a"), (3, "d"), (None, "c")]


def test_update_sees_pre_update_row(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1, 10), (2, 20)], "id int, x int"))
    # swap-style update: both assignments read the pre-update row
    t.update(F.col("id") == 1, {"x": F.col("x") + F.col("id"), "id": F.col("x")})
    assert rows(t.read()) == [(10, 11), (2, 20)]


def test_delete_null_predicate_keeps_row(spark, wh):
    t = wh.create(
        "t", spark.createDataFrame([(1, 5), (2, None), (3, 50)], "id int, x int")
    )
    t.delete(F.col("x") > 10)  # NULL predicate → keep (SQL DELETE)
    assert rows(t.read()) == [(1, 5), (2, None)]


def test_truncate_keeps_schema(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1,)], "id int"))
    t.truncate()
    assert t.read().count() == 0
    assert t.read().columns == ["id"]


def test_alter_add_drop_rename(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1,)], "id int"))
    t.add_column("tag", "string", default=F.lit("x"))
    assert rows(t.read()) == [(1, "x")]
    t.rename_column("tag", "label")
    assert t.read().columns == ["id", "label"]
    t.drop_column("label")
    assert t.read().columns == ["id"]


def test_failed_rewrite_preserves_old_version(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(Exception):
        # a plan that fails at write time: division enforced via ANSI expr
        t.overwrite(spark.range(1).select(F.expr("raise_error('boom')").alias("id")))
    assert rows(t.read()) == [(1,)]  # old version intact


def test_drop(spark, wh):
    t = wh.create("t", spark.createDataFrame([(1,)], "id int"))
    wh.drop("t")
    assert not t.exists()
    assert wh.tables() == []
