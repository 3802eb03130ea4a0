"""small_rows_df must be a drop-in for spark.createDataFrame on small
driver-side row sets: identical rows, schema and nullability, with one
Python slice instead of one per core (r14 optimization — the 1-row
stats swaps and query-term frames were paying ~5 s per action on
32-slice Python scans)."""

import datetime

import pytest

from warp_spark.localdf import small_rows_df


CASES = [
    (
        [(1, 2, 3, 4, 5)],
        "n_docs long, num_hashes int, band_size int, n_buckets int, "
        "max_corpus_bucket long",
    ),
    ([(True, False, -1)], "found boolean, example_ok boolean, mism long"),
    ([(1, "a b", 0.5), (2, None, -0.25)], "id long, s string, x double"),
    ([(0, [0.5, 1.5]), (3, [])], "subspace long, vector array<double>"),
    ([], "query_id long, rank int, doc_id long, score_ppm long"),
    (
        [(1, datetime.datetime(2024, 3, 1, 12, 30, 15, 123456), "x")],
        "event_id long, ts timestamp, props string",
    ),
    ([(qid, t) for qid in (1, 2) for t in ("alpha", "beta")], "query_id long, term string"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_small_rows_df_matches_createDataFrame(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = small_rows_df(spark, rows, schema)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_small_rows_df_single_python_slice(spark):
    df = small_rows_df(spark, [(i, f"t{i}") for i in range(100)], "id long, t string")
    assert df.rdd.getNumPartitions() == 1


def test_small_rows_df_empty_has_no_python_stage(spark):
    df = small_rows_df(spark, [], "id long, t string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    assert df.collect() == []


def test_small_rows_df_empty_non_nullable_schema(spark):
    # ADVICE r14: the pure-JVM empty path builds nullable lit(None)
    # casts, which DataFrame.to() rejects for non-nullable fields —
    # such schemas must fall back to createDataFrame([], schema).
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType(
        [
            StructField("a", LongType(), nullable=False),
            StructField("b", LongType(), nullable=True),
        ]
    )
    df = small_rows_df(spark, [], st)
    assert df.schema == st
    assert df.collect() == []
