"""Data-quality expectation checks — the validation gate a training
pipeline runs before promoting a batch (Great-Expectations-style rule
tables, re-expressed as ONE conditional aggregate).

Each rule is a boolean Column (TRUE = row passes). All rules evaluate
in a single map-side pass over the scan — one wide aggregate, no
per-rule jobs, no shuffle beyond the final 1-row combine — so a
100-rule suite costs one table scan at 100 TB. NULL rule results count
as violations (SQL three-valued logic would otherwise let NULL rows
slip through every CHECK).
"""

from __future__ import annotations

from typing import Mapping, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RuleLike = Union[Column, str]


def _cond(rule: RuleLike) -> Column:
    return F.expr(rule) if isinstance(rule, str) else rule


def check_rules(df: DataFrame, rules: Mapping[str, RuleLike]) -> DataFrame:
    """Evaluate every rule over ``df`` in one pass. Returns one row per
    rule: ``rule, n_rows, n_violations, violation_ppm, passed`` —
    sorted by rule name so the output is deterministic. The rate is
    exact integer parts-per-million (floor division of exact counts):
    a rounded float rate can flip on .xxxxxx5 boundaries cross-engine,
    the catalog's no-boundary-round discipline."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, rule in rules.items():
        # NULL → violation: coalesce the pass-flag to FALSE before negating
        aggs.append(
            F.sum(
                F.when(F.coalesce(_cond(rule), F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    # unpivot the single aggregate row with one explode — a
    # union-of-selects would re-run the aggregate once per rule
    per_rule = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").cast("long").alias("n_rows"),
                        F.col(f"__v_{name}").cast("long").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.*")
    return (
        per_rule.withColumn(
            "violation_ppm",
            F.expr("(n_violations * 1000000) DIV n_rows"),
        )
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("rule")
    )


def enforce(df: DataFrame, rules: Mapping[str, RuleLike]) -> DataFrame:
    """Filter ``df`` to rows passing ALL rules (NULL = fail, as in
    check_rules) — the quarantine-complement: what a pipeline promotes."""
    keep = F.lit(True)
    for rule in rules.values():
        keep = keep & F.coalesce(_cond(rule), F.lit(False))
    return df.filter(keep)
