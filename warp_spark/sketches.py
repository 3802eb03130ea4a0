"""Deterministic (RNG-free) frequency / distinct / quantile sketches.

The reference ships only exact reducers plus Spark-style approximates
behind its SQL dialects; this module adds the three classic mergeable
sketches a 100 TB pipeline actually keeps — CountMin (frequency),
HyperLogLog (distinct), and an HdrHistogram-style log-linear histogram
(quantiles) — built so the ESTIMATES THEMSELVES value-match a SQL
replay, not just land inside an error bound:

* every hash is the repo-wide md5-prefix uniform (``sampling._hash32``
  family), replayable in DuckDB as ``('0x' || substring(md5(x), ..))``;
* all sketch state is integer (counters, max-rank registers, bucket
  counts) — no float accumulation order to pin;
* the only floating-point steps are IEEE correctly-rounded multiplies
  and divides applied ONCE to integer state, with a fixed
  parenthesization mirrored verbatim in the oracle SQL.

This is the same discipline that made the KMV sketch (sampling.py)
exactly oracle-matchable, extended to the two other sketch families.

Scale shape (all three): state is O(sketch size), not O(data) —
CountMin is depth×width counters, HLL is m registers, the histogram is
≤ a few hundred buckets per group.  Each builds with ONE map-side
combinable groupBy on (group, cell); merging shards is cell-wise
add / max / add, so the same code is the shard-rollup path at 100 TB.

Papers: Cormode & Muthukrishnan 2005 (CountMin); Flajolet et al. 2007
(HyperLogLog); Gil Tene's HdrHistogram bucket scheme (log-linear
integer buckets, the deterministic cousin of DDSketch).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_mod(col: Column, salt: int, modulus: int) -> Column:
    """Salted 32-bit md5-prefix hash reduced mod ``modulus``.

    DuckDB replay:
    ``('0x' || substring(md5(salt || ':' || x::VARCHAR), 1, 8))::BIGINT
    % modulus``.
    """
    salted = F.concat(F.lit(f"{salt}:"), col.cast("string"))
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return h % modulus


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build a CountMin sketch of row frequencies of ``key_col``.

    Each of the ``depth`` salted hash rows maps a key to one of
    ``width`` counter cells; every occurrence increments its cell in
    every row.  Returns the sketch as a DataFrame
    ``(cm_row, cm_bucket, cm_count)`` with at most depth·width rows —
    O(1) state regardless of input size, built with one map-side
    combinable groupBy (the per-partition partial IS the per-shard
    sketch; merging shards is cell-wise addition).
    """
    key = F.col(key_col)
    cells = F.array(*[_md5_mod(key, i, width) for i in range(depth)])
    return (
        df.select(F.posexplode(cells).alias("cm_row", "cm_bucket"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.count(F.lit(1)).alias("cm_count"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch: estimate = min over rows of the probed
    cell (Cormode-Muthukrishnan); never underestimates, overestimates
    only via collisions.  The sketch side is tiny (depth·width rows) so
    it broadcasts; the probe side never shuffles.

    Returns ``probes`` plus an ``est_count`` column (BIGINT).
    """
    key = F.col(key_col)
    cells = F.array(*[_md5_mod(key, i, width) for i in range(depth)])
    # carry every probe column through the explode and group them back
    # — no join-back to the probe lineage, so the (possibly expensive)
    # probe plan executes exactly once, and a NULL probe key survives
    # as its own group (cells are NULL → no sketch match → est 0)
    # instead of being dropped by a null-rejecting equi-join.  A
    # synthetic per-row id keeps DUPLICATE probe rows distinct through
    # the group-back (contract: output cardinality == probe cardinality;
    # without it, two identical probe rows would collapse to one)
    # fresh synthetic name — withColumn would silently OVERWRITE a
    # caller column named __cm_probe_id and then duplicate it in the
    # select of *probes.columns (same guard pattern as dataset.ROW_ID)
    pid = "__cm_probe_id"
    while pid in probes.columns:
        pid = "_" + pid
    exploded = probes.withColumn(
        pid, F.monotonically_increasing_id()
    ).select(
        pid,
        *probes.columns,
        F.posexplode(cells).alias("cm_row", "cm_bucket"),
    )
    joined = exploded.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
    return (
        joined.groupBy(pid, *probes.columns)
        .agg(F.min(F.coalesce("cm_count", F.lit(0))).alias("est_count"))
        .drop(pid)
    )


# HLL with m = 256 registers (b = 8 index bits): rel. std. error
# 1.04/√256 = 6.5 %.  The 60-bit hash (15 md5 hex digits — stays
# positive in a signed 64-bit lane on both engines) splits into the
# 8-bit register index and a 52-bit remainder whose leading-zero rank
# is derived from bin()-string length — pure integer/string ops that
# both engines evaluate identically, unlike floor(log2()).
_HLL_M = 256
_HLL_REST_BITS = 52  # 60 - 8
_HLL_MAX_RANK = _HLL_REST_BITS + 1  # rank when the remainder is 0


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_col: Optional[str] = None,
) -> DataFrame:
    """HyperLogLog distinct-count sketch whose ESTIMATE value-matches a
    SQL replay (contrast ``approxCountDistinct``, whose HLL++ is
    engine-internal and only invariant-checkable — see the
    agg_approx_sketch entry).

    h(v)   = 60-bit md5-prefix integer
    j      = h mod 256                      (register index)
    rank   = 53 − bit_length(h div 256)     (leading zeros + 1)
    M_j    = max rank seen in register j    (integer state, mergeable
                                             by cell-wise max)
    S      = Σ_j 2^(53−M_j)  (empty registers contribute 2^53; exact
             BIGINT — at most 256·2^53 = 2^61)
    Ê      = α_256 · 256² · 2^53 / S  with α_256 = 0.7213/(1+1.079/256)

    The estimator arithmetic is four correctly-rounded double ops on
    one integer, so its bits are engine-independent given the fixed
    parenthesization (mirrored verbatim in the oracle).  The raw
    estimator is valid (no small-range correction) while Ê > 2.5·m =
    640 — callers point this at groups with ≥ ~700 distinct values;
    the returned ``hll_empty`` column lets a caller see how far from
    the linear-counting regime the group sits.

    Returns one row per group:
    ``[group_col,] hll_empty BIGINT, hll_s BIGINT, est_distinct DOUBLE``.
    """
    groups = [group_col] if group_col else []
    # NULLs are not values (countDistinct semantics): without the
    # filter a NULL hash falls through the rank F.when to MAX_RANK and
    # materializes a phantom present register, inflating the estimate
    df = df.where(F.col(value_col).isNotNull())
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    j = (h % _HLL_M).alias("__j")
    # shiftright, NOT floor(h / 256): the hash is 60 bits, and dividing
    # as double loses integer exactness beyond 2^53 (floor could land on
    # the wrong side of an integer boundary on one engine only)
    rest = F.call_function("shiftright", h, F.lit(8))
    rank = F.when(
        rest > 0, F.lit(_HLL_MAX_RANK) - F.length(F.bin(rest))
    ).otherwise(F.lit(_HLL_MAX_RANK))
    regs = (
        df.select(*groups, j, rank.alias("__rank"))
        .groupBy(*groups, "__j")
        .agg(F.max("__rank").alias("__m"))
    )
    term = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(_HLL_MAX_RANK) - F.col("__m"))
    )
    per = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(term).alias("__s_present"),
    )
    empty = (F.lit(_HLL_M) - F.col("__present")).cast("long")
    # empty registers: rank 0 → term 2^53 each
    s = (F.col("__s_present") + empty * F.lit(1 << _HLL_REST_BITS).cast("long") * 2).cast(
        "long"
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + (F.lit(1.079) / F.lit(256.0)))
    est = (
        (alpha * F.lit(65536.0)) * F.lit(float(1 << _HLL_REST_BITS) * 2.0)
    ) / s.cast("double")
    return per.select(
        *groups,
        empty.alias("hll_empty"),
        s.alias("hll_s"),
        est.alias("est_distinct"),
    )


def hdr_bucket(cents: Column, sub_bits: int = 5) -> Column:
    """HdrHistogram-style log-linear bucket of a non-negative integer:
    keep the top ``sub_bits`` significant bits, drop the rest.

    shift  = max(bit_length(c) − sub_bits, 0)
    bucket = c >> shift          (∈ [2^(sub_bits−1), 2^sub_bits) once
                                  c ≥ 2^sub_bits; identity below)
    key    = shift·2^sub_bits + bucket   — strictly monotone in c

    Relative bucket width ≤ 2^(1−sub_bits) (6.25 % at 5 bits): the
    same guarantee DDSketch gets from γ-log buckets, but in pure
    integer arithmetic — bit_length comes from bin()-string length, so
    there is no log() boundary to disagree on cross-engine.
    """
    bl = F.when(cents > 0, F.length(F.bin(cents))).otherwise(F.lit(0))
    shift = F.greatest(bl - F.lit(sub_bits), F.lit(0))
    idx = F.call_function("shiftright", cents, shift)
    return (shift * F.lit(1 << sub_bits) + idx).cast("long")


def hdr_bounds(key: Column, sub_bits: int = 5) -> tuple[Column, Column]:
    """Inclusive [lo, hi] integer bounds of an ``hdr_bucket`` key."""
    shift = F.floor(key / F.lit(1 << sub_bits)).cast("int")
    idx = (key % F.lit(1 << sub_bits)).cast("long")
    lo = F.call_function("shiftleft", idx, shift)
    hi = F.call_function("shiftleft", idx + 1, shift) - 1
    return lo.cast("long"), hi.cast("long")


def hdr_quantiles(
    df: DataFrame,
    cents_col: Column,
    group_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    sub_bits: int = 5,
) -> DataFrame:
    """Grouped quantile estimation from the log-linear histogram.

    Build: one map-side combinable groupBy on (group, bucket) — the
    histogram is ≤ (bit_length_max − sub_bits + 1)·2^sub_bits buckets
    per group (a few hundred), so per-group state is O(1) and shard
    histograms merge by adding counts.  Query: rank target
    r = ceil(q·n); answer is the [lo, hi] bound pair of the first
    bucket whose cumulative count reaches r — because the key is
    monotone, that bucket is ``min(key) where cum ≥ r``, a conditional
    aggregate over the tiny histogram (no second scan of the data).

    Returns one row per group: ``group, n, q{XX}_lo, q{XX}_hi`` —
    all BIGINT, so the oracle comparison is integer-exact.
    """
    hist = (
        df.select(F.col(group_col), hdr_bucket(cents_col, sub_bits).alias("__key"))
        .groupBy(group_col, "__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return hdr_quantiles_from_hist(hist, group_col, qs=qs, sub_bits=sub_bits)


def hdr_quantiles_from_hist(
    hist: DataFrame,
    group_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    sub_bits: int = 5,
) -> DataFrame:
    """Quantile read-off over an ALREADY-BUILT ``(group, __key, __cnt)``
    histogram — the entry point for histograms that arrive from
    elsewhere: a drained streaming aggregation, or per-shard histograms
    merged by summing counts (the 100 TB rollup).  Same output shape
    as :func:`hdr_quantiles`."""
    if len(set(qs)) != len(qs):
        raise ValueError(f"duplicate quantiles in qs: {qs}")
    w = (
        Window.partitionBy(group_col)
        .orderBy("__key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(group_col))
    )
    aggs = [F.max("__n").alias("n")]
    names = []
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("__n").cast("double")).cast("long")
        pick = F.min(F.when(F.col("__cum") >= target, F.col("__key")))
        name = f"q{int(round(q * 100)):02d}"
        names.append(name)
        aggs.append(pick.alias(f"__{name}_key"))
    out = cum.groupBy(group_col).agg(*aggs)
    cols = [F.col(group_col), F.col("n")]
    for name in names:
        lo, hi = hdr_bounds(F.col(f"__{name}_key"), sub_bits)
        cols += [lo.alias(f"{name}_lo"), hi.alias(f"{name}_hi")]
    return out.select(*cols)


def tdigest_hist(
    df: DataFrame,
    cents_col: Column,
    group_col: str,
    value_sub_bits: int = 7,
) -> DataFrame:
    """Stage 1 of the t-digest-style quantile sketch: the MERGEABLE
    integer artifact — a log-linear value histogram ``(group, __key,
    __cnt)`` at ``value_sub_bits`` precision (7 bits → ≤0.78 % relative
    bucket width, ≤ ~7.5k buckets over the full bigint range; in
    practice a few hundred).  Shard histograms merge by ADDING counts
    and a streaming update-mode count aggregation maintains the same
    state incrementally — this is the one artifact batch and streamed
    percentiles share (r10 verdict item 7)."""
    return (
        df.select(
            F.col(group_col), hdr_bucket(cents_col, value_sub_bits).alias("__key")
        )
        .groupBy(group_col, "__key")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def tdigest_quantiles_from_hist(
    hist: DataFrame,
    group_col: str,
    qs: Sequence[float] = (0.01, 0.5, 0.99),
    value_sub_bits: int = 7,
    rank_sub_bits: int = 5,
) -> DataFrame:
    """Stage 2 — the t-digest-STYLE read-off: centroids are formed in
    RANK space by applying the same log-linear bucketing to each
    rank's distance to its nearest tail, ``d = min(r, n+1−r)``, so
    centroid width is ≤ 2^(1−rank_sub_bits) · d (6.25 % of the
    distance-to-tail at 5 bits).  That is t-digest's defining accuracy
    profile — tight at the tails, coarse in the middle (centroid size
    ∝ min(q, 1−q)·n, the integer cousin of the k₁ scale function's
    √(q(1−q))) — with NO asin/log boundary to disagree on
    cross-engine: keys come from bin()-length integer arithmetic, so
    the whole read-off replays exactly in SQL.

    For each requested quantile: target rank r = ceil(q·n); its
    centroid's rank interval [r1, r2] is the closed-form key-preimage
    (mirrored to the upper side when 2r > n, clamped at the midpoint);
    the answer is the [lo, hi] VALUE envelope of the stage-1 buckets
    whose rank intervals intersect [r1, r2] — all BIGINT, so tail
    quantiles provably come back with tighter rank spans than the
    median (pytest-pinned).

    Output: one row per group — ``group, n`` then ``q{XX}_lo, q{XX}_hi,
    q{XX}_rank_span`` per quantile."""
    if len(set(qs)) != len(qs):
        raise ValueError(f"duplicate quantiles in qs: {qs}")
    w = (
        Window.partitionBy(group_col)
        .orderBy("__key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(group_col))
    )
    n = F.col("__n")
    c1 = F.col("__cum") - F.col("__cnt") + 1  # bucket rank interval lo
    c2 = F.col("__cum")  # bucket rank interval hi
    blo, bhi = hdr_bounds(F.col("__key"), value_sub_bits)
    aggs = [F.max("__n").alias("n")]
    names = []
    for q in qs:
        r = F.ceil(F.lit(q) * n.cast("double")).cast("long")
        d = F.least(r, n + 1 - r)
        lower = (r * 2) <= n
        dbl = F.when(d > 0, F.length(F.bin(d))).otherwise(F.lit(0))
        shift = F.greatest(dbl - F.lit(rank_sub_bits), F.lit(0))
        idx = F.call_function("shiftright", d, shift)
        d_lo = F.call_function("shiftleft", idx, shift).cast("long")
        d_hi = (F.call_function("shiftleft", idx + 1, shift) - 1).cast("long")
        mid = F.floor(n / 2).cast("long")
        r1 = F.when(lower, d_lo).otherwise(
            F.greatest(n + 1 - d_hi, mid + 1)
        )
        r2 = F.when(lower, F.least(d_hi, mid)).otherwise(n + 1 - d_lo)
        hit = (c1 <= r2) & (c2 >= r1)
        name = f"q{int(round(q * 100)):02d}"
        names.append(name)
        aggs += [
            F.min(F.when(hit, blo)).alias(f"{name}_lo"),
            F.max(F.when(hit, bhi)).alias(f"{name}_hi"),
            F.max(r2 - r1 + 1).alias(f"{name}_rank_span"),
        ]
    out = cum.groupBy(group_col).agg(*aggs)
    cols = [F.col(group_col), F.col("n")]
    for name in names:
        cols += [
            F.col(f"{name}_lo").cast("long").alias(f"{name}_lo"),
            F.col(f"{name}_hi").cast("long").alias(f"{name}_hi"),
            F.col(f"{name}_rank_span").cast("long").alias(f"{name}_rank_span"),
        ]
    return out.select(*cols)


def tdigest_quantiles(
    df: DataFrame,
    cents_col: Column,
    group_col: str,
    qs: Sequence[float] = (0.01, 0.5, 0.99),
    value_sub_bits: int = 7,
    rank_sub_bits: int = 5,
) -> DataFrame:
    """Build + read off in one call (the batch path); the streamed twin
    maintains :func:`tdigest_hist`'s state incrementally and calls
    :func:`tdigest_quantiles_from_hist` on the drained artifact."""
    return tdigest_quantiles_from_hist(
        tdigest_hist(df, cents_col, group_col, value_sub_bits),
        group_col,
        qs=qs,
        value_sub_bits=value_sub_bits,
        rank_sub_bits=rank_sub_bits,
    )
