"""JDBC database sources/sinks (reference: WarpConduit's SQLite/MySQL/
PostgreSQL bridges — SQLiteStream.swift:238-738, MySQLStream.swift:19-771,
PostgresStream.swift:20-916 — each with its own SQL dialect and pushdown).

In a Spark-native engine the dialect layer is Spark's own JDBC dialect
registry; what remains of the reference's design is (a) URL/driver
construction per backend, (b) *pushdown*: Spark ≥3.4 pushes predicates,
column pruning, LIMIT, and aggregates into the database when
``pushDownAggregate``/``pushDownLimit`` are set — the same
keep-predicates-near-the-table goal as the reference's SQLFragment
(SQL.swift:1153-1320), and (c) partitioned parallel reads
(partitionColumn/lowerBound/upperBound/numPartitions), which the
single-connection reference lacks.

JDBC driver jars are not bundled here; pass them via
``spark.jars``/``spark.jars.packages`` at session build. Everything in
this module only *constructs* reads/writes, so it imports cleanly
without drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DRIVERS = {
    "sqlite": "org.sqlite.JDBC",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "postgresql": "org.postgresql.Driver",
    # embedded file database whose driver ships with Spark itself
    # (pyspark/jars/derby-*.jar) — the live-round-trip test backend
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


def jdbc_url(
    backend: str,
    host: str = "",
    port: int | None = None,
    database: str = "",
    create: bool = False,
) -> str:
    if backend == "sqlite":
        return f"jdbc:sqlite:{database}"
    if backend == "derby":
        return f"jdbc:derby:{database}" + (";create=true" if create else "")
    default_port = {"mysql": 3306, "postgresql": 5432}[backend]
    return f"jdbc:{backend}://{host}:{port or default_port}/{database}"


def _reader(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None,
    partition_column: str | None,
    lower_bound,
    upper_bound,
    num_partitions: int | None,
    **options,
) -> DataFrameReader:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        # mirror the reference's SQLFragment goal: ship filters/aggregates
        # to the database instead of pulling raw rows
        .option("pushDownPredicate", "true")
        .option("pushDownAggregate", "true")
        .option("pushDownLimit", "true")
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """Read a table (or ``(subquery) alias``) over JDBC. Pass
    ``partition_column`` + bounds for a parallel partitioned read —
    without it the read is a single connection, which at scale is the
    bottleneck, not Spark."""
    return _reader(
        spark, url, table, driver, partition_column, lower_bound, upper_bound,
        num_partitions, **options,
    ).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = 10_000,
    **options,
) -> None:
    """Write via batched INSERTs (the reference's SQLWarehouse INSERT
    path, SQL.swift:223-302, parallelized per partition)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def read_sqlite(spark: SparkSession, database: str, table: str, **options) -> DataFrame:
    return read_jdbc(spark, jdbc_url("sqlite", database=database), table,
                     driver=DRIVERS["sqlite"], **options)


def read_mysql(spark: SparkSession, host: str, database: str, table: str,
               port: int = 3306, **options) -> DataFrame:
    return read_jdbc(spark, jdbc_url("mysql", host, port, database), table,
                     driver=DRIVERS["mysql"], **options)


def read_postgres(spark: SparkSession, host: str, database: str, table: str,
                  port: int = 5432, **options) -> DataFrame:
    return read_jdbc(spark, jdbc_url("postgresql", host, port, database), table,
                     driver=DRIVERS["postgresql"], **options)


def read_derby(spark: SparkSession, database: str, table: str, **options) -> DataFrame:
    """Read from an embedded Derby database (file path). Derby's JDBC
    driver is bundled with Spark, so this path needs no extra jars —
    it is the live integration proof for the whole JDBC layer
    (tests/test_jdbc.py)."""
    return read_jdbc(spark, jdbc_url("derby", database=database), table,
                     driver=DRIVERS["derby"], **options)
