"""Slowly-changing-dimension (type 2) interval construction from an
event log: collapse each entity's consecutive runs of an attribute value
into validity intervals ``[valid_from, valid_to)``, the query-side
complement of the mutable warehouse's storage-side history
(mutable.py time travel / change feed).  Reference analogue: warp's
event ordering + rank steps build the same run-length segments by hand
(Data.swift rank/sort); SCD2 is the canonical warehouse form.

Scale shape: two window passes over ONE ``(entity, order)`` sort — the
change markers and the segment numbering share a partitioning, and the
final segment aggregate reuses the same hash keys; a hot entity's rows
colocate (the inherent requirement of per-entity ordering), but the
carried projection is narrow (entity, order keys, attribute).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build type-2 validity intervals: one row per maximal run of
    identical ``attr_col`` per entity in ``(ts, *tiebreak)`` order.

    ``valid_from`` = first event ts of the run, ``valid_to`` = the next
    run's valid_from (NULL for the entity's current value — half-open
    intervals, so an as-of probe is ``valid_from <= t < valid_to``),
    ``n_events`` = run length.  The tiebreak columns must make the
    per-entity order total or run boundaries at equal timestamps are
    engine-dependent.
    """
    order: list[Column] = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    # a run boundary is a row whose attribute differs from its
    # predecessor's (NULL-safe: the first row starts segment 1)
    changed = (
        ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    ).cast("long")
    seg = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        df.select(entity_col, attr_col, ts_col, *tiebreak_cols)
        .withColumn("__seg", seg)
        .groupBy(entity_col, "__seg")
        .agg(
            F.min(attr_col).alias(attr_col),  # constant within a run
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wnext = Window.partitionBy(entity_col).orderBy("__seg")
    return runs.select(
        entity_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wnext).alias("valid_to"),
        "n_events",
    )
