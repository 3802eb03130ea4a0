"""Query catalog: one entry per implemented operator/capability from
SURVEY.md §2, each paired with an ANSI-SQL oracle that DuckDB runs on the
same parquet tables (the driver's t2 correctness gate).

Conventions:
- every computed column is aliased identically in the Spark query and
  the oracle SQL (the driver sorts columns by name before hashing);
- double-typed outputs are rounded identically on both sides so the two
  engines' floating-point summation orders cannot flip the hash;
- every query is expressed through the warp_spark Dataset/function
  layer (this is the engine under test), not raw SQL.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_spark.aggregators import Aggregator
from warp_spark.dataset import Dataset, Order
from warp_spark.functions import call


def _t(spark: SparkSession, sf_dir: str, name: str) -> Dataset:
    return Dataset.from_parquet(spark, f"{sf_dir}/{name}.parquet")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (filter → aggregate → sort)
# exercises filter, computed group keys, 7 reducers, multi-key sort.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .aggregate(
            {"l_returnflag": F.col("l_returnflag"), "l_linestatus": F.col("l_linestatus")},
            {
                "sum_qty": Aggregator(F.col("l_quantity"), "sum"),
                "sum_base_price": Aggregator(F.col("l_extendedprice"), "sum"),
                "sum_disc_price": Aggregator(disc_price, "sum"),
                "sum_charge": Aggregator(charge, "sum"),
                "avg_qty": Aggregator(F.col("l_quantity"), "average"),
                "avg_price": Aggregator(F.col("l_extendedprice"), "average"),
                "count_order": Aggregator(F.col("l_quantity"), "countAll"),
            },
        )
        .calculate(
            {
                "sum_qty": F.round("sum_qty", 2),
                "sum_base_price": F.round("sum_base_price", 2),
                "sum_disc_price": F.round("sum_disc_price", 2),
                "sum_charge": F.round("sum_charge", 2),
                "avg_qty": F.round("avg_qty", 4),
                "avg_price": F.round("avg_price", 4),
            }
        )
        .sort([Order("l_returnflag", numeric=False), Order("l_linestatus", numeric=False)])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# TPC-H Q3-style: 3-way join, filter, agg, top-k (sort+limit — the
# reference expresses top-k exactly this way, SURVEY.md §2.1)
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer is the small dim: broadcast to avoid shuffling orders
    joined = orders.join(
        Dataset(F.broadcast(cust.df)), on=F.col("o_custkey") == F.col("c_custkey")
    )
    joined = li.join(joined, on=F.col("l_orderkey") == F.col("o_orderkey"))
    out = (
        joined.aggregate(
            {"l_orderkey": F.col("l_orderkey"), "o_orderdate": F.col("o_orderdate")},
            {"revenue": Aggregator(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum")},
        )
        .calculate({"revenue": F.round("revenue", 2)})
        .sort([Order("revenue", ascending=False), Order("l_orderkey")])
        .limit(10)
        .select_columns(["l_orderkey", "revenue", "o_orderdate"])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# TPC-H Q5-style: 6-way star join → agg (exercises multi-join planning;
# dims are broadcast, the fact shuffles once on the agg key)
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_ = spark
    region = _t(spark_, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark_, sf_dir, "nation")
    customer = _t(spark_, sf_dir, "customer")
    supplier = _t(spark_, sf_dir, "supplier")
    orders = _t(spark_, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark_, sf_dir, "lineitem")

    nat_region = nation.join(Dataset(F.broadcast(region.df)), on=F.col("n_regionkey") == F.col("r_regionkey"))
    supp = supplier.join(Dataset(F.broadcast(nat_region.df)), on=F.col("s_nationkey") == F.col("n_nationkey"))
    ord_cust = orders.join(Dataset(F.broadcast(customer.df)), on=F.col("o_custkey") == F.col("c_custkey"))
    j = li.join(Dataset(F.broadcast(supp.df)), on=F.col("l_suppkey") == F.col("s_suppkey"))
    j = j.join(ord_cust, on=(F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
    out = (
        j.aggregate(
            {"n_name": F.col("n_name")},
            {"revenue": Aggregator(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum")},
        )
        .calculate({"revenue": F.round("revenue", 2)})
        .sort([Order("revenue", ascending=False), Order("n_name", numeric=False)])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# filter + calculate (Dataset.filter / Dataset.calculate with the
# function library; expressions see the pre-update row)
# ---------------------------------------------------------------------------
@register(
    "filter_calculate",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)         AS net_price,
           l_extendedprice * (1 - l_discount) * l_tax AS tax_amount,
           CASE WHEN l_quantity >= 25 THEN 'BULK' ELSE 'SMALL' END AS order_class,
           upper(l_returnflag) AS flag_upper
    FROM lineitem
    WHERE l_discount > 0.05 AND l_quantity > 10
    """,
)
def filter_calculate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (
        li.filter((F.col("l_discount") > 0.05) & (F.col("l_quantity") > 10))
        .calculate(
            {
                # per-row IEEE arithmetic is bit-identical across engines —
                # no rounding needed (unlike aggregate sums)
                "net_price": net,
                "tax_amount": net * F.col("l_tax"),
                "order_class": call("if", F.col("l_quantity") >= 25, "BULK", "SMALL"),
                "flag_upper": call("uppercase", F.col("l_returnflag")),
            }
        )
        .select_columns(
            ["l_orderkey", "l_linenumber", "net_price", "tax_amount", "order_class", "flag_upper"]
        )
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# distinct over a projection (Dataset.distinct, Data.swift:245-246)
# ---------------------------------------------------------------------------
@register(
    "select_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select_columns(["l_returnflag", "l_linestatus"])
        .distinct()
        .to_df()
    )


# ---------------------------------------------------------------------------
# unique(expression) (Data.swift:252-254)
# ---------------------------------------------------------------------------
@register(
    "unique_expression",
    "SELECT DISTINCT year(o_orderdate) AS order_year FROM orders",
)
def unique_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .unique(call("utcYear", F.col("o_orderdate")), alias="order_year")
        .to_df()
    )


# ---------------------------------------------------------------------------
# sort + offset + limit (Data.swift:232-238, 292-295) — deterministic via
# unique key tiebreak
# ---------------------------------------------------------------------------
@register(
    "sort_offset_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select_columns(["o_orderkey", "o_totalprice"])
        .sort([Order("o_totalprice", ascending=False), Order("o_orderkey")])
        .offset(10)
        .limit(20)
        .to_df()
    )


# ---------------------------------------------------------------------------
# left join + aggregate (join semantics Data.swift:113-145: right columns
# clashing with left are dropped)
# ---------------------------------------------------------------------------
@register(
    "join_left_aggregate",
    """
    SELECT n_name,
           count(c_custkey)            AS n_customers,
           round(sum(CASE WHEN c_acctbal IS NOT NULL THEN c_acctbal ELSE 0 END), 2) AS total_acctbal
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_left_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    out = (
        nation.join(customer, on=F.col("c_nationkey") == F.col("n_nationkey"), how="left")
        .aggregate(
            {"n_name": F.col("n_name")},
            {
                "n_customers": Aggregator(F.col("c_custkey"), "count"),
                "total_acctbal": Aggregator(F.col("c_acctbal"), "sum"),
            },
        )
        .calculate({"total_acctbal": F.round("total_acctbal", 2)})
        .sort([Order("n_name", numeric=False)])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# inner join on an arbitrary (non-equi + equi) predicate — the
# reference's Join carries any boolean expression (Data.swift:113-145)
# ---------------------------------------------------------------------------
@register(
    "join_theta",
    """
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation
      ON s_nationkey = n_nationkey AND s_acctbal > n_nationkey * 100
    ORDER BY s_suppkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    out = (
        supplier.join(
            Dataset(F.broadcast(nation.df)),
            on=(F.col("s_nationkey") == F.col("n_nationkey"))
            & (F.col("s_acctbal") > F.col("n_nationkey") * 100),
        )
        .select_columns(["s_suppkey", "s_name", "n_name"])
        .sort([Order("s_suppkey")])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# union by name with missing columns → NULL (Data.swift:300-304,
# explicitly "not SQL UNION")
# ---------------------------------------------------------------------------
@register(
    "union_by_name",
    """
    SELECT c_name AS name, round(c_acctbal, 2) AS acctbal,
           c_mktsegment AS segment, 'customer' AS side
    FROM customer
    UNION ALL
    SELECT s_name AS name, round(s_acctbal, 2) AS acctbal,
           NULL AS segment, 'supplier' AS side
    FROM supplier
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .calculate(
            {
                "name": F.col("c_name"),
                "acctbal": F.round(F.col("c_acctbal"), 2),
                "segment": F.col("c_mktsegment"),
                "side": F.lit("customer"),
            }
        )
        .select_columns(["name", "acctbal", "segment", "side"])
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .calculate(
            {
                "name": F.col("s_name"),
                "acctbal": F.round(F.col("s_acctbal"), 2),
                "side": F.lit("supplier"),
            }
        )
        .select_columns(["name", "acctbal", "side"])  # no `segment` → NULL-filled
    )
    return cust.union(supp).to_df()


# ---------------------------------------------------------------------------
# aggregate with the full reducer surface (SURVEY.md §2.2)
# ---------------------------------------------------------------------------
@register(
    "aggregate_reducers",
    """
    SELECT o_orderpriority,
           count(*)                                   AS n_orders,
           count(DISTINCT o_custkey)                  AS n_customers,
           round(sum(o_totalprice), 2)                AS sum_price,
           round(avg(o_totalprice), 4)                AS avg_price,
           round(min(o_totalprice), 2)                AS min_price,
           round(max(o_totalprice), 2)                AS max_price,
           round(median(o_totalprice), 4)             AS median_price,
           round(stddev_samp(o_totalprice), 4)        AS sd_price,
           round(var_pop(o_totalprice), 4)            AS var_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def aggregate_reducers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.col("o_totalprice")
    out = (
        _t(spark, sf_dir, "orders")
        .aggregate(
            {"o_orderpriority": F.col("o_orderpriority")},
            {
                "n_orders": Aggregator(p, "countAll"),
                "n_customers": Aggregator(F.col("o_custkey"), "countDistinct"),
                "sum_price": Aggregator(p, "sum"),
                "avg_price": Aggregator(p, "average"),
                "min_price": Aggregator(p, "min"),
                "max_price": Aggregator(p, "max"),
                "median_price": Aggregator(p, "median"),
                "sd_price": Aggregator(p, "standardDeviationSample"),
                "var_price": Aggregator(p, "variancePopulation"),
            },
        )
        .calculate(
            {
                "sum_price": F.round("sum_price", 2),
                "avg_price": F.round("avg_price", 4),
                "min_price": F.round("min_price", 2),
                "max_price": F.round("max_price", 2),
                "median_price": F.round("median_price", 4),
                "sd_price": F.round("sd_price", 4),
                "var_price": F.round("var_price", 4),
            }
        )
        .sort([Order("o_orderpriority", numeric=False)])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# pivot (Data.swift:265; column naming `<hval>_<valuecol>` like the
# reference's raster impl Raster.swift:984-1050)
# ---------------------------------------------------------------------------
@register(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F_qty,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "lineitem")
        .pivot(
            horizontal="l_linestatus",
            vertical=["l_returnflag"],
            values={"qty": Aggregator(F.col("l_quantity"), "sum")},
            horizontal_values=["F", "O"],
        )
        .calculate({"F_qty": F.round("F_qty", 2), "O_qty": F.round("O_qty", 2)})
        .sort([Order("l_returnflag", numeric=False)])
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# rank / running aggregate (Data.swift:306-311 → window functions)
# ---------------------------------------------------------------------------
@register(
    "rank_running_total",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey)                        AS rank,
           round(sum(o_totalprice) OVER (ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)    AS running_total
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def rank_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .rank(
            {
                "rank": Aggregator(F.col("o_orderkey"), "countAll"),
                "running_total": Aggregator(F.col("o_totalprice"), "sum"),
            },
            by=[Order("o_orderkey")],
        )
        .calculate({"running_total": F.round("running_total", 2)})
        .select_columns(["o_orderkey", "rank", "running_total"])
    )
    return out.to_df()


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return q1_pricing_summary(spark, sf_dir)
