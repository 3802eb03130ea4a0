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


# ---------------------------------------------------------------------------
# Postgres/MySQL dialect plumbing (no live server in this sandbox —
# these pin the parts that DON'T need a wire: URL construction, driver
# class selection, Spark's built-in vendor dialects resolving for our
# URLs, dialect-correct identifier quoting and type mapping, and the
# pushdown option plumbing reaching the reader. Live-wire behavior is
# proven by the Derby round-trip above through the identical code path.
# ---------------------------------------------------------------------------

def test_vendor_urls_and_drivers():
    assert (
        jdbc_url("postgresql", "db.example.com", None, "warp")
        == "jdbc:postgresql://db.example.com:5432/warp"
    )
    assert (
        jdbc_url("mysql", "db.example.com", 3307, "warp")
        == "jdbc:mysql://db.example.com:3307/warp"
    )
    assert DRIVERS["postgresql"] == "org.postgresql.Driver"
    assert DRIVERS["mysql"] == "com.mysql.cj.jdbc.Driver"


def test_spark_resolves_vendor_dialects(spark):
    """Spark's JdbcDialects registry must pick the vendor dialect from
    our URLs — this is the layer that replaces the reference's
    hand-written MySQLDialect/PostgresDialect (MySQLStream.swift:19-90,
    PostgresStream.swift:20-95)."""
    jvm = spark._jvm
    get = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get
    pg = get(jdbc_url("postgresql", "h", None, "d"))
    my = get(jdbc_url("mysql", "h", None, "d"))
    assert "Postgres" in pg.toString()
    assert "MySQL" in my.toString()
    # identifier quoting is per-dialect: Postgres double-quotes,
    # MySQL backticks (the reference hand-rolls exactly this)
    assert pg.quoteIdentifier('user"s') == '"user""s"'
    assert my.quoteIdentifier("order") == "`order`"


def test_postgres_dialect_type_mapping(spark):
    """String/boolean/double columns must map to the Postgres types the
    reference's CREATE TABLE path emits (PostgresStream.swift:96-180)."""
    jvm = spark._jvm
    pg = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://h/d")
    dt = jvm.org.apache.spark.sql.types.DataTypes

    def jdbc_type(t):
        opt = pg.getJDBCType(t)
        assert opt.isDefined()
        return opt.get().databaseTypeDefinition()

    assert jdbc_type(dt.StringType) == "TEXT"
    assert jdbc_type(dt.BooleanType) == "BOOLEAN"
    assert jdbc_type(dt.DoubleType) == "FLOAT8"
    assert jdbc_type(dt.ByteType) == "SMALLINT"


def test_pushdown_options_reach_reader(spark):
    """The pushdown flags and partitioned-read options must land in the
    reader's option map (the part of read_postgres that can be proven
    without a server; .load() is never called)."""
    from warp_spark.sources.jdbc import _reader

    r = _reader(
        spark,
        jdbc_url("postgresql", "db.example.com", None, "warp"),
        "events",
        DRIVERS["postgresql"],
        "event_id",
        0,
        1000,
        8,
        fetchsize="5000",
    )
    # options live JVM-side (CaseInsensitiveMap) — pull them back
    jmap = r._jreader.extraOptions()
    it = jmap.iterator()
    opts = {}
    while it.hasNext():
        kv = it.next()
        opts[kv._1().lower()] = kv._2()
    assert opts["pushdownpredicate"] == "true"
    assert opts["pushdownaggregate"] == "true"
    assert opts["pushdownlimit"] == "true"
    assert opts["partitioncolumn"] == "event_id"
    assert opts["numpartitions"] == "8"
    assert opts["fetchsize"] == "5000"
    assert opts["driver"] == "org.postgresql.Driver"
