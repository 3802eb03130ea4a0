"""Stratified (per-group) sampling — the training-data form of the
reference's flat ``random`` step (Data.swift:240-243): draw up to n rows
per group so minority strata (languages, sources, labels) survive the
cut instead of being swamped by the head of the distribution.

Scale shape: one shuffle on the group key, then a per-group
``row_number() over (order by rand)`` — no global sort, no driver
collect. A pathologically hot group sorts its partition's rows by the
random key; for extreme skew pre-thin with ``threshold`` (a Bernoulli
pre-pass that keeps the exact sampler's output uniform while bounding
the sort input).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK = "__strat_rank"
_KEY = "__strat_key"


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    seed: Optional[int] = None,
    threshold: Optional[float] = None,
) -> DataFrame:
    """Uniform sample of up to ``n`` rows from every ``group_col`` group.

    Groups smaller than n are kept whole. With ``threshold`` in (0, 1],
    rows first pass an independent Bernoulli(threshold) filter — for
    groups where n ≪ group size this bounds the window-sort input by
    ~threshold·|group| while remaining a uniform draw (symmetry: every
    row has the same inclusion probability); choose threshold so that
    threshold·|group| ≫ n or small groups may under-fill."""
    rnd = F.rand(seed) if seed is not None else F.rand()
    src = df
    if threshold is not None:
        keep = F.rand(seed + 1) if seed is not None else F.rand()
        src = src.where(keep < threshold)
    w = Window.partitionBy(group_col).orderBy(F.col(_KEY))
    return (
        src.withColumn(_KEY, rnd)
        .withColumn(_RANK, F.row_number().over(w))
        .where(F.col(_RANK) <= n)
        .drop(_RANK, _KEY)
    )
