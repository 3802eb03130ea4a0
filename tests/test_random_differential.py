"""Seed-pinned random differential: generate small relational pipelines
from one AST and run them BOTH as a DataFrame chain (Spark) and as SQL
(DuckDB) over the same parquet — the property-based complement to the
hand-written catalog oracles (SURVEY §5's differential strategy,
generalized).

Design constraints that keep it deterministic and flake-free:
- fixed seeds (hypothesis-style shrinking isn't needed; a failing seed
  IS the repro),
- aggregates restricted to exact surfaces: count / min / max on any
  type, sum only on integer columns — a double sum is fold-order-
  dependent across engines and would need the catalog's decimal-cents
  machinery, which the hand-written entries already cover,
- filters compare per-row values (exact in IEEE on both engines),
- every pipeline ends order-insensitive (the comparator sorts rows).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import from_pandas, normalize_rows  # noqa: E402

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def _gen_pipeline(rng: random.Random):
    """One random pipeline as (spark_fn, sql_text)."""
    filters = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["num", "int", "str"])
        if kind == "num":
            c = rng.choice(NUM_COLS)
            op = rng.choice(["<", "<=", ">", ">=" ])
            v = round(rng.uniform(0, 50), 2)
            filters.append((c, op, repr(v)))
        elif kind == "int":
            c = rng.choice(INT_COLS)
            op = rng.choice(["<", ">", "%s %% %d = 0"])
            if op.startswith("%s"):
                filters.append((c, "mod", str(rng.randint(2, 7))))
            else:
                filters.append((c, op, str(rng.randint(1, 4000))))
        else:
            c = rng.choice(STR_COLS)
            v = rng.choice(["A", "N", "R", "O", "F"])
            filters.append((c, "=", f"'{v}'"))

    group = rng.choice(STR_COLS + [None])
    aggs = []
    for _ in range(rng.randint(1, 3)):
        how = rng.choice(["count", "min", "max", "isum"])
        if how == "isum":
            aggs.append(("isum", rng.choice(INT_COLS)))
        elif how == "count":
            aggs.append(("count", None))
        else:
            aggs.append((how, rng.choice(NUM_COLS + INT_COLS + STR_COLS)))
    # dedup output aliases
    seen, uniq = set(), []
    for how, c in aggs:
        alias = f"{how}_{c or 'all'}"
        if alias not in seen:
            seen.add(alias)
            uniq.append((how, c, alias))

    def spark_fn(spark):
        df = spark.read.parquet(f"{SF}/lineitem.parquet")
        for c, op, v in filters:
            if op == "mod":
                df = df.filter((F.col(c) % int(v)) == 0)
            elif op == "=":
                df = df.filter(F.col(c) == v.strip("'"))
            else:
                df = df.filter(F.expr(f"{c} {op} {v}"))
        exprs = []
        for how, c, alias in uniq:
            if how == "count":
                exprs.append(F.count(F.lit(1)).alias(alias))
            elif how == "isum":
                exprs.append(F.sum(c).alias(alias))
            elif how == "min":
                exprs.append(F.min(c).alias(alias))
            else:
                exprs.append(F.max(c).alias(alias))
        if group:
            return df.groupBy(group).agg(*exprs)
        return df.agg(*exprs)

    conds = []
    for c, op, v in filters:
        if op == "mod":
            conds.append(f"{c} % {v} = 0")
        else:
            conds.append(f"{c} {op} {v}")
    sels = []
    for how, c, alias in uniq:
        if how == "count":
            sels.append(f"count(*)::BIGINT AS {alias}")
        elif how == "isum":
            sels.append(f"sum({c})::BIGINT AS {alias}")
        else:
            sels.append(f"{how}({c}) AS {alias}")
    sql = (
        f"SELECT {group + ', ' if group else ''}{', '.join(sels)} "
        f"FROM lineitem WHERE {' AND '.join(conds)} "
        + (f"GROUP BY {group}" if group else "")
    )
    return spark_fn, sql


@pytest.mark.parametrize("seed", range(40))
def test_random_pipeline_matches_duckdb(spark, seed):
    rng = random.Random(20260815 + seed)
    spark_fn, sql = _gen_pipeline(rng)

    sdf = spark_fn(spark)
    scols = sdf.columns
    srows = [
        tuple(from_pandas(v) for v in row)
        for row in sdf.toPandas().itertuples(index=False, name=None)
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    res = con.sql(sql)
    ocols = list(res.columns)
    orows = [
        tuple(from_pandas(v) for v in row)
        for row in res.df().itertuples(index=False, name=None)
    ]
    con.close()

    sc, sr = normalize_rows(scols, srows)
    oc, orr = normalize_rows(ocols, orows)
    assert sc == oc, f"seed {seed}: schema {sc} != {oc}\nSQL: {sql}"
    assert sr == orr, f"seed {seed}: values differ\nSQL: {sql}\nfirst: {sr[:2]} vs {orr[:2]}"


def _gen_rank_pipeline(rng: random.Random):
    """Random RUNNING-aggregate pipeline: filters, a pre-aggregation to
    a UNIQUE sort key (lineitem's (l_orderkey, l_linenumber) has
    duplicate pairs, and running values at tied rows are inherently
    tie-order-dependent — Spark resolves ties by an arbitrary row id,
    DuckDB by physical order, so the differential needs a tie-free
    order), then Dataset.rank vs the equivalent DuckDB window SQL.
    Exact surfaces only: countAll/sum/min/max on integer columns plus
    countDistinct (replayed via the same first-occurrence-marker
    decomposition rank uses, since DuckDB also has no DISTINCT window
    functions)."""
    from warp_spark import Aggregator, Dataset, Order

    filters = []
    for _ in range(rng.randint(1, 2)):
        c = rng.choice(INT_COLS)
        op = rng.choice(["<", ">"])
        filters.append((c, op, str(rng.randint(500, 4000))))

    aggs = []
    for _ in range(rng.randint(1, 3)):
        how = rng.choice(["countAll", "isum", "min", "max", "countDistinct"])
        c = rng.choice(INT_COLS)
        aggs.append((how, c))
    seen, uniq = set(), []
    for how, c in aggs:
        alias = f"{how.lower()}_{c}"
        if alias not in seen:
            seen.add(alias)
            uniq.append((how, c, alias))
    # the sort keys are already in the output; min(key) AS key would
    # create a duplicate column
    base_cols = sorted({c for _, c, _ in uniq} - {"l_orderkey", "l_linenumber"})

    def spark_fn(spark):
        df = spark.read.parquet(f"{SF}/lineitem.parquet")
        for c, op, v in filters:
            df = df.filter(F.expr(f"{c} {op} {v}"))
        if base_cols:
            df = df.groupBy("l_orderkey", "l_linenumber").agg(
                *[F.min(c).alias(c) for c in base_cols]
            )
        else:  # every agg column IS a sort key: plain key dedup
            df = df.select("l_orderkey", "l_linenumber").distinct()
        ranks = {}
        for how, c, alias in uniq:
            kind = {"isum": "sum"}.get(how, how)
            ranks[alias] = Aggregator(F.col(c), kind)
        out = Dataset(df).rank(
            ranks, by=[Order("l_orderkey"), Order("l_linenumber")]
        )
        cols = ["l_orderkey", "l_linenumber"] + [a for _, _, a in uniq]
        return out.to_df().select(*cols)

    conds = " AND ".join(f"{c} {op} {v}" for c, op, v in filters)
    markers, sels = [], []
    for how, c, alias in uniq:
        if how == "countAll":
            sels.append("row_number() OVER w AS " + alias)
        elif how == "isum":
            # the prefix path sums through the double coercion, so the
            # replay casts to DOUBLE (exact: integer sums < 2^53)
            sels.append(f"sum({c}) OVER wf ::DOUBLE AS {alias}")
        elif how in ("min", "max"):
            sels.append(f"{how}({c}) OVER wf AS {alias}")
        else:  # countDistinct
            markers.append(
                f"CASE WHEN {c} IS NOT NULL AND row_number() OVER ("
                f"PARTITION BY {c} ORDER BY l_orderkey, l_linenumber) = 1 "
                f"THEN 1 ELSE 0 END AS fs_{alias}"
            )
            sels.append(f"sum(fs_{alias}) OVER wf ::BIGINT AS {alias}")
    base_sel = ", ".join(f"min({c}) AS {c}" for c in base_cols)
    sql = (
        "WITH f AS (SELECT l_orderkey, l_linenumber"
        + (", " + base_sel if base_sel else "")
        + " FROM lineitem"
        + (f" WHERE {conds}" if conds else "")
        + " GROUP BY 1, 2), m AS (SELECT *"
        + ("".join(", " + m for m in markers))
        + " FROM f) SELECT l_orderkey, l_linenumber, "
        + ", ".join(sels)
        + " FROM m WINDOW w AS (ORDER BY l_orderkey, l_linenumber), "
        + "wf AS (ORDER BY l_orderkey, l_linenumber "
        + "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return spark_fn, sql


@pytest.mark.parametrize("seed", range(16))
def test_random_running_aggregates_match_duckdb(spark, seed):
    rng = random.Random(30260815 + seed)
    spark_fn, sql = _gen_rank_pipeline(rng)

    sdf = spark_fn(spark)
    scols = sdf.columns
    srows = [
        tuple(from_pandas(v) for v in row)
        for row in sdf.toPandas().itertuples(index=False, name=None)
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    res = con.sql(sql)
    ocols = list(res.columns)
    orows = [
        tuple(from_pandas(v) for v in row)
        for row in res.df().itertuples(index=False, name=None)
    ]
    con.close()

    sc, sr = normalize_rows(scols, srows)
    oc, orr = normalize_rows(ocols, orows)
    assert sc == oc, f"seed {seed}: schema {sc} != {oc}\nSQL: {sql}"
    assert sr == orr, f"seed {seed}: rows differ\nSQL: {sql}"
