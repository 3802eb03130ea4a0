"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented SURVEY.md §2 operator to a (spark, sf_dir) → DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
driver's differential check. Implementation lives in ``warp_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from warp_spark.catalog import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from warp_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from warp_spark.catalog import ORACLES

    return dict(ORACLES)
