"""As-of (temporal) join — a scale extension beyond the reference
(pixelspark/warp has no temporal joins; its only join types are left
outer and inner with arbitrary predicates, WarpCore/Sources/Data.swift:113-130).

For each left row, attach the payload of the nearest right row for the
same key: the most recent with ``right.on <= left.on`` (backward, the
default), the earliest with ``right.on >= left.on`` (forward), or the
closer of the two (nearest) — the standard event-enrichment primitive
(trades→quotes, purchases→clicks).

Spark-first implementation: tag both sides, union, and run ONE window
pass per key ordered by time — ``last(payload, ignorenulls=True)``
(or ``first`` for forward) carries the adjacent right payload onto each
left row. Cost is a single shuffle on the key columns (the window
partitioning); nothing is broadcast and neither side is collected, so
the plan survives arbitrarily large inputs on both sides. A
sort-merge-join formulation would need an inequality predicate (no
equi-join) and degenerate to BroadcastNestedLoop; the union+window
shape keeps it a hash shuffle + per-partition sort.

Skew note: partitioning is by ``by`` keys only, so a pathologically hot
key serializes through one task. At 100 TB, range-bucket the time axis
first (join left to the right rows of the same and previous time bucket,
then window within bucket) — the `tolerance` parameter makes the
bucketed variant semantics-preserving.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColsLike = Union[str, Sequence[str]]


def _as_list(v: ColsLike) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def _directional_match(tagged: DataFrame, on: str, by: list[str], direction: str) -> Column:
    """The adjacent right payload for each row under one direction.

    Right rows get sort-rank 0 (backward) or 2 (forward) against the
    left rows' 1, so an equal-timestamp right row falls INSIDE the
    frame (inclusive match) in either direction. Equal-time right rows
    tie-break on the full payload — deterministic: backward's last()
    picks the max payload, forward's first() the min."""
    if direction == "backward":
        rank, frame, pick = 0, (Window.unboundedPreceding, Window.currentRow), F.last
    else:
        rank, frame, pick = 2, (Window.currentRow, Window.unboundedFollowing), F.first
    order_side = F.when(F.col("__asof_side") == 0, F.lit(rank)).otherwise(F.lit(1))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), order_side, F.col("__asof_payload"))
        .rowsBetween(*frame)
    )
    return pick("__asof_payload", ignorenulls=True).over(w)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: ColsLike = (),
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    tolerance: Optional[Column] = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join (every left row kept; right payload columns
    null when no right row matches).

    on: time column name, present in both sides.
    by: equality key column(s), present in both sides.
    value_cols: right columns to carry (default: all but ``on``/``by``).
    suffix: appended to carried right column names that clash with left.
    tolerance: optional max distance (e.g. ``F.expr("INTERVAL 1 HOUR")``)
        — matches farther than that from ``left.on`` are nulled out.
    direction: 'backward' (most recent right.on <= left.on, default),
        'forward' (earliest right.on >= left.on), or 'nearest' (closer
        of the two; exact ties go backward).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by = _as_list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {v: v + suffix if v in left.columns else v for v in value_cols}

    # single right payload struct → one window pick per row
    payload = F.struct(
        F.col(on).alias("__asof_ts"), *[F.col(v).alias(v) for v in value_cols]
    )
    r = right.select(*by, F.col(on), payload.alias("__asof_payload"))
    l = left.withColumn("__asof_payload", F.lit(None).cast(r.schema["__asof_payload"].dataType))
    tagged = l.withColumn("__asof_side", F.lit(1)).unionByName(
        r.withColumn("__asof_side", F.lit(0)), allowMissingColumns=True
    )

    directions = ("backward", "forward") if direction == "nearest" else (direction,)
    for d in directions:
        tagged = tagged.withColumn(f"__asof_{d}", _directional_match(tagged, on, by, d))
    matched = tagged.filter(F.col("__asof_side") == 1)

    def in_tolerance(match: Column) -> Column:
        if tolerance is None:
            return match
        dist_ok = (match["__asof_ts"] >= F.col(on) - tolerance) & (
            match["__asof_ts"] <= F.col(on) + tolerance
        )
        return F.when(dist_ok, match)

    if direction == "nearest":
        b = in_tolerance(F.col("__asof_backward"))
        f = in_tolerance(F.col("__asof_forward"))
        # backward wins exact ties; cast to long so the comparison works
        # for TIMESTAMP and numeric `on` columns alike
        back_dist = F.col(on).cast("long") - b["__asof_ts"].cast("long")
        fwd_dist = f["__asof_ts"].cast("long") - F.col(on).cast("long")
        match = (
            F.when(b.isNull(), f).when(f.isNull(), b).when(back_dist <= fwd_dist, b).otherwise(f)
        )
    else:
        match = in_tolerance(F.col(f"__asof_{direction}"))
    matched = matched.withColumn("__asof_match", match)

    return matched.select(
        *left.columns,
        F.col("__asof_match")["__asof_ts"].alias(on + suffix),
        *[F.col("__asof_match")[v].alias(out_names[v]) for v in value_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: ColsLike = (),
    tolerance_seconds: int = 3600,
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
) -> DataFrame:
    """Hot-key-safe as-of join, equivalent to
    ``asof_join(..., tolerance=INTERVAL tolerance_seconds)`` (tested).

    The window formulation partitions by ``by`` alone, so one
    pathological key (a bot user, a null FK) serializes through a single
    task. Bounding the lookback with ``tolerance_seconds`` makes a
    bucketed formulation possible: quantize time into tolerance-sized
    buckets, send each right row to its bucket, probe each left row's
    own and previous bucket, then take the max-timestamp candidate per
    left row. The shuffle key becomes (key, time_bucket) — a hot key
    spreads over its active time range instead of one reducer, and no
    task ever holds more than ~2 buckets of one key.
    """
    by = _as_list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {v: v + suffix if v in left.columns else v for v in value_cols}
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(tolerance_seconds))  # noqa: E731

    l = left.withColumn("__ab_lid", F.monotonically_increasing_id()).withColumn(
        "__ab_bucket", F.explode(F.array(bucket(F.col(on)) - 1, bucket(F.col(on))))
    )
    payload = F.struct(
        F.col(on).alias("__asof_ts"), *[F.col(v).alias(v) for v in value_cols]
    )
    r = right.select(
        *[F.col(k).alias(f"__ab_r_{k}") for k in by],
        bucket(F.col(on)).alias("__ab_bucket"),
        F.col(on).alias("__ab_rts"),
        payload.alias("__ab_payload"),
    )
    cond = [l["__ab_bucket"] == r["__ab_bucket"]] + [l[k] == r[f"__ab_r_{k}"] for k in by]
    j = l.join(r, on=cond, how="left")
    in_range = (
        F.col("__ab_rts").isNotNull()
        & (F.col("__ab_rts") <= F.col(on))
        & (F.col("__ab_rts") >= F.col(on) - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
    )
    cand = F.when(in_range, F.struct(F.col("__ab_rts").alias("t"), F.col("__ab_payload").alias("p")))
    best = (
        j.withColumn("__ab_cand", cand)
        .groupBy("__ab_lid", *[l[c] for c in left.columns])
        .agg(F.max("__ab_cand").alias("__ab_best"))
    )
    return best.select(
        *left.columns,
        F.col("__ab_best")["p"]["__asof_ts"].alias(on + suffix),
        *[F.col("__ab_best")["p"][v].alias(out_names[v]) for v in value_cols],
    )
