"""Chain-of-steps tests (QBEChain.swift / QBEStep.swift lifecycle):
fold semantics, formula-string expressions, JSON round trip, the
example (truncated-source) path, and join-of-chains."""

import pytest
from pyspark.sql import functions as F

from warp_spark.plans import Chain, step

SF = "/root/testdata/sf0.001"


def test_chain_filter_calculate_sort_limit(spark):
    ch = (
        Chain()
        .add("source", path=f"{SF}/orders.parquet")
        .add("filter", condition="=[o_totalprice] > 100k")  # formula w/ postfix
        .add("calculate", calculations={"price_k": "=[o_totalprice] / 1k"})
        .add("select_columns", columns=["o_orderkey", "price_k"])
        .add("sort", orders=[{"expression": "price_k", "ascending": False}])
        .add("limit", n=5)
    )
    rows = ch.dataframe(spark).collect()
    assert len(rows) == 5
    vals = [r["price_k"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v > 100 for v in vals)


def test_chain_aggregate_with_formula_groups(spark):
    ch = (
        Chain()
        .add("source", path=f"{SF}/lineitem.parquet")
        .add(
            "aggregate",
            groups={"flag": "l_returnflag"},
            values={"n": {"map": "l_quantity", "reduce": "countAll"}},
        )
    )
    got = {r["flag"]: r["n"] for r in ch.dataframe(spark).collect()}
    expected = {
        r["l_returnflag"]: r["n"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_chain_json_roundtrip_same_result(spark):
    ch = (
        Chain()
        .add("source", path=f"{SF}/region.parquet")
        .add("filter", condition="r_regionkey >= 1")
        .add("select_columns", columns=["r_name"])
        .add("sort", orders=["r_name"])
    )
    ch2 = Chain.from_json(ch.to_json())
    assert [tuple(r) for r in ch.dataframe(spark).collect()] == [
        tuple(r) for r in ch2.dataframe(spark).collect()
    ]


def test_chain_example_dataset_truncates_source(spark):
    ch = (
        Chain()
        .add("source", path=f"{SF}/lineitem.parquet")
        .add("calculate", calculations={"x": "l_quantity * 2"})
    )
    assert ch.example_dataset(spark, max_input_rows=50).to_df().count() == 50


def test_chain_join_of_chains(spark):
    nation_chain = [step("source", path=f"{SF}/nation.parquet")]
    ch = (
        Chain()
        .add("source", path=f"{SF}/region.parquet")
        .add("join", chain=nation_chain, on="n_regionkey = r_regionkey", how="inner")
        .add(
            "aggregate",
            groups={"r_name": "r_name"},
            values={"n_nations": {"map": "n_nationkey", "reduce": "countAll"}},
        )
        .add("sort", orders=["r_name"])
    )
    rows = ch.dataframe(spark).collect()
    assert sum(r["n_nations"] for r in rows) == 25  # 25 nations total


def test_chain_sequencer_source(spark):
    ch = Chain().add("sequencer", pattern="[ab]{2}")
    got = sorted(r["value"] for r in ch.dataframe(spark).collect())
    assert got == ["aa", "ab", "ba", "bb"]


def test_chain_union_missing_columns(spark):
    other = [
        step("source", path=f"{SF}/nation.parquet"),
        step("select_columns", columns=["n_name"]),
    ]
    ch = (
        Chain()
        .add("source", path=f"{SF}/region.parquet")
        .add("select_columns", columns=["r_name"])
        .add("union", chain=other)
    )
    df = ch.dataframe(spark)
    assert sorted(df.columns) == ["n_name", "r_name"]
    assert df.count() == 30  # 5 regions + 25 nations


def test_chain_errors(spark):
    with pytest.raises(ValueError):
        Chain().full_dataset(spark)
    with pytest.raises(ValueError):
        Chain().add("filter", condition="1=1").full_dataset(spark)
    with pytest.raises(ValueError):
        Chain().add("nonsense").full_dataset(spark)
