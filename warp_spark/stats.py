"""Exact-moment statistics: correlation matrices that are bit-stable
across engines.

Floating-point Σxy accumulation is summation-order-dependent, so a
naive ``corr()`` differs between Spark and any oracle engine in the
last ulps — the same failure mode as the round-1 variancePopulation
hash mismatch. The fix is the same discipline (catalog.py
``aggregate_reducers``): measure each variable in exact integer units
(fixed-point scale), accumulate count / Σx / Σx² / Σxy as
``decimal(38,0)`` — order-independent integer arithmetic — and cast to
double exactly once for the final Pearson ratio

    corr(x, y) = (n·Σxy − Σx·Σy) / √(n·Σx² − (Σx)²) / √(n·Σy² − (Σy)²)

One pass over the data (a single hash aggregate with map-side
partials, all 2 + k + k(k+1)/2 accumulators in the same agg), then a
driver-free projection expands the pairs.
"""

from __future__ import annotations

from itertools import combinations
from typing import Mapping, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Union[Column, str]


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_corr_matrix(
    df: DataFrame,
    variables: Mapping[str, Tuple[ColumnLike, int]],
) -> DataFrame:
    """Pearson correlation for every pair of ``variables`` — each given
    as (column, fixed-point scale): the column is measured in exact
    integer units of 1/scale (e.g. prices at scale 100 are cents).

    Returns long form: one row per unordered pair ``(var_a, var_b,
    corr)`` with var_a < var_b in the mapping's order, corr rounded to
    6 — identical on any engine that replicates the integer moments.

    Headroom bound: moments accumulate in ``decimal(38,0)`` (~38
    digits), while a HUGEINT oracle has 128 bits (~38.5 digits) — but
    the DERIVED products ``n·Σxy`` can overflow Spark's decimal first
    and silently become NULL under non-ANSI mode. With per-variable
    integer magnitude ≤ 10^d and n rows, ``n·Σxy ≤ n²·10^(2d)`` — keep
    ``2·log10(n) + 2d ≤ 38`` (e.g. d=9 units is safe to n ≈ 10^10
    rows). A runtime ``assert_true`` guard fails the job loudly instead
    of emitting NULL corr if the bound is ever exceeded."""
    names = list(variables)
    ints = {
        k: F.round(_col(c) * scale, 0).cast("decimal(38,0)")
        for k, (c, scale) in variables.items()
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for k in names:
        aggs.append(F.sum(ints[k]).alias(f"__s_{k}"))
    for a, b in combinations(names, 2):
        aggs.append(F.sum(ints[a] * ints[b]).alias(f"__p_{a}_{b}"))
    for k in names:
        aggs.append(F.sum(ints[k] * ints[k]).alias(f"__p_{k}_{k}"))
    one = df.agg(*aggs)

    n = F.col("__n")
    # overflow guard: under non-ANSI Spark a decimal(38,0) product that
    # exceeds 38 digits silently becomes NULL (the oracle's HUGEINT
    # keeps going to 128 bits) — fail loudly rather than emit NULL corr
    moment_cols = [c for c in one.columns if c.startswith(("__s_", "__p_"))]
    checks = [F.col(c).isNotNull() for c in moment_cols]
    checks += [
        (n * F.col(c)).isNotNull() for c in moment_cols if c.startswith("__p_")
    ]
    acc = F.lit(True)
    for c in checks:
        acc = acc & c
    all_ok = (n == 0) | acc
    one = one.filter(
        F.assert_true(
            all_ok,
            F.lit(
                "exact_corr_matrix: decimal(38,0) moment overflow — reduce "
                "fixed-point scales or row count (see docstring headroom bound)"
            ),
        ).isNull()
    )

    def ss(k: str) -> Column:
        # n·Σx² − (Σx)² — exact integer, cast once
        return (n * F.col(f"__p_{k}_{k}") - F.col(f"__s_{k}") * F.col(f"__s_{k}")).cast(
            "double"
        )

    rows = []
    for a, b in combinations(names, 2):
        cov = (n * F.col(f"__p_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")).cast(
            "double"
        )
        corr = F.when(
            (ss(a) > 0) & (ss(b) > 0),
            F.round(cov / F.sqrt(ss(a)) / F.sqrt(ss(b)), 6),
        )
        rows.append(
            F.struct(
                F.lit(a).alias("var_a"), F.lit(b).alias("var_b"), corr.alias("corr")
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def profile_columns(df: DataFrame, columns: list) -> DataFrame:
    """Column profile — per-column row/null/distinct counts and
    min/max (the reference surfaces these stats in its data view) — as
    a UNION of per-column two-phase aggregates, one job total.  Min/max
    are emitted as strings so heterogeneous column types share a single
    output schema.

    Each branch groups by its own column (map-side partial aggregation
    collapses the stream to the column's distinct values before its
    exchange) and folds the group table to one row: n_rows = Σcount,
    n_nulls = the null group's count, n_distinct = the non-null group
    count, min/max over the group keys — identical by definition to
    the raw-row aggregates.  Parquet column pruning means the N
    branches together read the same bytes as one N-column scan.

    The previous shape — one wide aggregate with N countDistinct
    terms — hit Catalyst's multi-distinct rewrite: an Expand that
    re-emits every input row once per distinct column (×(N+1) rows)
    into a SortAggregate chain.  Measured on orders (6 columns):
    3.0 → 1.04 s at sf0.1 and 14.2 → 1.6 s at a 10× input point, same
    rows and schema (pytest-pinned).

    Returns one row per column: ``column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value``."""
    branches = []
    for c in columns:
        g = df.groupBy(F.col(c).alias("__k")).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        branches.append(
            g.agg(
                F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__k").isNull(), F.col("__cnt"))),
                    F.lit(0),
                ).alias("n_nulls"),
                F.count("__k").alias("n_distinct"),
                F.min("__k").cast("string").alias("min_value"),
                F.max("__k").cast("string").alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def exact_skew_kurtosis(
    df: DataFrame,
    group_col: str,
    value: ColumnLike,
    scale: int = 100,
) -> DataFrame:
    """Population skewness and excess kurtosis per group, bit-identical
    cross-engine at ANY data scale — the 3rd/4th-moment extension of the
    ``exact_corr_matrix`` discipline.

    Raw power sums overflow fast (a 38-digit accumulator cannot hold
    (Σx)⁴ beyond ~1e9 value-rows), so this uses the exact TWO-PASS
    centered form instead: pass 1 takes n and S = Σx in integer units;
    each group then centers on the integer c = S div n, and pass 2
    accumulates Σd..Σd⁴ for d = x − c — |d| is bounded by the VALUE
    RANGE, not the data volume, so d⁴ sums have ~10 orders of headroom
    at 100 TB. The fractional remainder δ = r/n (r = S − n·c, exact)
    shifts the centered sums to true central moments:

        M2 = Σd² − r²/n
        M3 = Σd³ − 3rΣd²/n + 2r³/n²
        M4 = Σd⁴ − 4rΣd³/n + 6r²Σd²/n² − 3r⁴/n³

    Every input to the float stage is an exact integer (long /
    decimal(38,0) ↔ BIGINT/HUGEINT) and the double expression tree is
    written with fixed parenthesization mirrored verbatim in the oracle
    SQL, so skew = √n·M3/(M2·√M2) and kurt = n·M4/M2² − 3 reproduce to
    the last bit with NO rounding (√ is IEEE-correctly-rounded; no
    pow()).

    Shape: two shuffles on the group key (the second joins the 3-ish-row
    per-group (n, c, r) table back broadcast) — the honest cost of
    overflow-proof higher moments."""
    v = F.round(_col(value) * scale).cast("long")
    g = df.select(F.col(group_col).alias("__g"), v.alias("__v")).groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s")
    )
    base = g.select(
        "__g",
        "__n",
        F.expr("__s DIV __n").alias("__c"),
        (F.col("__s") - F.col("__n") * F.expr("__s DIV __n")).alias("__r"),
    )
    d = (
        df.select(F.col(group_col).alias("__g"), v.alias("__v"))
        .join(F.broadcast(base), "__g")
        .withColumn("__d", F.col("__v") - F.col("__c"))
    )
    # d² fits a long (range-bounded), but d³ and Σd² do not at cent
    # scales — promote to decimal(38,0) BEFORE the power/accumulate
    # (the DuckDB twin promotes to HUGEINT at the same points)
    d2 = F.col("__d") * F.col("__d")
    d2w = d2.cast("decimal(38,0)")
    m = d.groupBy("__g").agg(
        F.max("__n").alias("n"),
        F.max("__r").alias("r"),
        F.sum(d2w).alias("s2"),
        F.sum(d2w * F.col("__d")).alias("s3"),
        F.sum(d2w * d2).alias("s4"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    s2d, s3d = F.col("s2").cast("double"), F.col("s3").cast("double")
    s4d = F.col("s4").cast("double")
    r2d = (F.col("r") * F.col("r")).cast("double")
    r3d = (F.col("r") * F.col("r") * F.col("r")).cast("double")
    r4d = (
        (F.col("r") * F.col("r")).cast("decimal(38,0)")
        * (F.col("r") * F.col("r"))
    ).cast("double")
    m2 = s2d - r2d / nd
    m3 = s3d - ((F.lit(3.0) * rd) * s2d) / nd + (F.lit(2.0) * r3d) / (nd * nd)
    m4 = (
        s4d
        - ((F.lit(4.0) * rd) * s3d) / nd
        + ((F.lit(6.0) * r2d) * s2d) / (nd * nd)
        - (F.lit(3.0) * r4d) / (nd * nd * nd)
    )
    return m.select(
        F.col("__g").alias(group_col),
        F.col("n"),
        F.when(m2 > 0, F.sqrt(nd) * m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        F.when(m2 > 0, nd * m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis"),
    )


def pareto_frontier_2d(
    df: DataFrame,
    m1: str,
    m2: str,
    keep_cols: list | None = None,
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline, Börzsönyi et al. ICDE'01)
    maximizing integer metrics ``m1`` and ``m2``: keep every row no
    other row weakly dominates with at least one strict improvement.
    Rows tied on BOTH metrics are mutually non-dominating and all
    survive — the SQL-standard skyline semantics.

    The 2-D case has a monotone structure that kills the naive O(n²)
    all-pairs test: a row survives iff its m2 (a) equals the max m2
    within its m1 group and (b) strictly exceeds the max m2 over all
    strictly-larger m1 groups.  That factors into
      1. one hash aggregation  m1 → max(m2)   (map-side combinable),
      2. a running max over the DISTINCT-m1 artifact ordered m1 DESC
         (bounded by |distinct m1| — metric cardinality, not rows; for
         length-like metrics a few thousand values at any corpus size),
      3. one broadcast join of that artifact back to the rows.
    No row-level window, no self-join, no shuffle beyond the group-by —
    the shape that survives 100 TB where the textbook NOT EXISTS
    anti-join is quadratic."""
    from pyspark.sql import Window

    keep = keep_cols if keep_cols is not None else df.columns
    g = df.groupBy(F.col(m1).alias("__m1")).agg(F.max(m2).alias("__mbest"))
    w = (
        Window.orderBy(F.col("__m1").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the window runs over the distinct-m1 artifact (bounded by metric
    # cardinality); rows never enter a global window
    art = g.select("__m1", "__mbest", F.max("__mbest").over(w).alias("__gtmax"))
    joined = df.join(
        F.broadcast(art), df[m1] == art["__m1"], "inner"
    ).filter(
        (F.col(m2) == F.col("__mbest"))
        & (F.col("__gtmax").isNull() | (F.col(m2) > F.col("__gtmax")))
    )
    return joined.select(*keep)
