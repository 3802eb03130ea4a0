"""Mergeable-sketch tier (warp_spark/sketches.py): CountMin, HLL,
HdrHistogram-style log-linear quantiles.

Beyond the catalog oracles (which pin cross-engine value parity), these
pin the three properties the oracles can't: the formal guarantee of
each sketch (never-underestimate / error envelope / bucket containment)
and the shard-MERGE laws (cell-wise add / max / add) that make each one
the 100 TB rollup path.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from warp_spark.sketches import (
    countmin_build,
    countmin_estimate,
    hdr_bounds,
    hdr_bucket,
    hdr_quantiles,
    hll_distinct,
)


def test_countmin_never_underestimates_and_exact_when_sparse(spark):
    # 40 keys in 4x512 cells: collisions possible but estimate >= truth
    # always (Cormode-Muthukrishnan), and min-over-rows makes equality
    # overwhelmingly likely; assert only the one-sided guarantee plus
    # equality on a known-sparse domain of 5 keys.
    df = spark.range(0, 4000).select((F.col("id") % 40).alias("k"))
    sketch = countmin_build(df, "k", depth=4, width=512)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = countmin_estimate(sketch, exact, "k", depth=4, width=512)
    rows = est.collect()
    assert len(rows) == 40
    assert all(r["est_count"] >= r["exact"] for r in rows)

    sparse = spark.range(0, 500).select((F.col("id") % 5).alias("k"))
    sk = countmin_build(sparse, "k", depth=4, width=512)
    ex = sparse.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    got = countmin_estimate(sk, ex, "k", depth=4, width=512).collect()
    assert all(r["est_count"] == r["exact"] == 100 for r in got)


def test_countmin_shards_merge_by_cellwise_add(spark):
    whole = spark.range(0, 3000).select((F.col("id") % 30).alias("k"))
    a = whole.filter(F.col("id") < 1400)
    b = whole.filter(F.col("id") >= 1400)
    merged = (
        countmin_build(a, "k").unionByName(countmin_build(b, "k"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.sum("cm_count").alias("cm_count"))
    )
    full = countmin_build(whole, "k")
    sym_diff = merged.exceptAll(full).unionByName(full.exceptAll(merged))
    assert sym_diff.count() == 0


def test_hll_estimate_within_envelope_and_register_count(spark):
    # m=256 -> rel std err 6.5%; assert a 4-sigma envelope at n=20000
    df = spark.range(0, 20000).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v").collect()[0]
    assert abs(row["est_distinct"] - 20000) / 20000 < 0.26
    assert row["hll_empty"] == 0  # 20000 >> 256: every register hit
    # duplicates must not move the sketch at all
    dup = df.unionByName(df)
    row2 = hll_distinct(dup, "v").collect()[0]
    assert row2["hll_s"] == row["hll_s"]


def test_hll_shards_merge_by_registerwise_max(spark):
    # Merging per-shard sketches must equal the whole-data sketch.
    # sketches.py exposes the built registers via the S statistic:
    # rebuild from the union of shard inputs vs whole input.
    whole = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    a = whole.filter(F.col("v") < 2000)
    b = whole.filter(F.col("v") >= 2000)
    merged = hll_distinct(a.unionByName(b), "v", group_col="g")
    full = hll_distinct(whole, "v", group_col="g")
    m = {r["g"]: (r["hll_s"], r["est_distinct"]) for r in merged.collect()}
    f = {r["g"]: (r["hll_s"], r["est_distinct"]) for r in full.collect()}
    assert m == f


def test_hdr_bucket_monotone_and_bounds_contain_value(spark):
    vals = spark.range(1, 200001).select(F.col("id").alias("c"))
    keyed = vals.select(
        "c", hdr_bucket(F.col("c"), sub_bits=5).alias("key")
    )
    lo, hi = hdr_bounds(F.col("key"), sub_bits=5)
    checked = keyed.select(
        "c",
        "key",
        lo.alias("lo"),
        hi.alias("hi"),
        F.lag("key").over(Window.orderBy("c")).alias("prev_key"),
    )
    bad = checked.filter(
        (F.col("c") < F.col("lo"))
        | (F.col("c") > F.col("hi"))
        | (F.col("prev_key") > F.col("key"))
        # relative width <= 2^(1-5) = 6.25%
        | ((F.col("hi") - F.col("lo")).cast("double") > F.lit(0.0625) * F.col("lo"))
    )
    assert bad.count() == 0


def test_hdr_quantile_bucket_contains_exact_quantile(spark):
    df = spark.range(0, 10007).select(
        F.lit("g").alias("g"), (F.col("id") * 13 % 100003 + 1).alias("c")
    )
    out = hdr_quantiles(df, F.col("c"), "g", qs=(0.5, 0.99), sub_bits=5).collect()[0]
    exact = df.selectExpr(
        "percentile(c, 0.5) as q50", "percentile(c, 0.99) as q99"
    ).collect()[0]
    assert out["q50_lo"] <= exact["q50"] <= out["q50_hi"]
    assert out["q99_lo"] <= exact["q99"] <= out["q99_hi"]
    assert out["n"] == 10007


def test_hll_ignores_nulls(spark):
    base = spark.range(0, 5000).select(F.col("id").alias("v"))
    with_nulls = base.unionByName(
        spark.range(0, 50).select(F.lit(None).cast("long").alias("v"))
    )
    a = hll_distinct(base, "v").collect()[0]
    b = hll_distinct(with_nulls, "v").collect()[0]
    assert (a["hll_s"], a["hll_empty"]) == (b["hll_s"], b["hll_empty"])


def test_countmin_estimate_keeps_null_probe_rows(spark):
    df = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    sketch = countmin_build(df, "k")
    probes = spark.createDataFrame([(0,), (None,)], "k long")
    rows = {r["k"]: r["est_count"] for r in countmin_estimate(sketch, probes, "k").collect()}
    assert rows[0] == 20
    assert rows[None] == 0  # never seen, not silently dropped


def test_countmin_estimate_preserves_duplicate_probe_rows(spark):
    """Contract: output cardinality == probe cardinality.  Two probe
    rows identical in every column must come back as two rows (each
    with the same estimate), not collapse into one through the
    explode/group-back round trip."""
    df = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    sketch = countmin_build(df, "k")
    probes = spark.createDataFrame([(3,), (3,), (1,)], "k long")
    got = countmin_estimate(sketch, probes, "k").collect()
    assert len(got) == 3
    by_key = sorted((r["k"], r["est_count"]) for r in got)
    assert by_key == [(1, 20), (3, 20), (3, 20)]


def test_kmv_overlap_estimates_track_truth(spark):
    from warp_spark.sampling import kmv_overlap

    # A = 0..3999, B = 2000..7999: union 8000, intersection 2000, J=0.25
    a = spark.range(0, 4000).select(F.col("id").alias("v"))
    b = spark.range(2000, 8000).select(F.col("id").alias("v"))
    row = kmv_overlap(a, b, "v", k=256).collect()[0]
    assert row["n_bottom"] == 256
    assert abs(row["est_union"] - 8000) / 8000 < 0.3
    assert abs(row["est_jaccard"] - 0.25) < 0.12  # binomial on 256 draws
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.5

    # disjoint sets: exact-zero overlap, exact union below k
    c = spark.range(0, 100).select(F.col("id").alias("v"))
    d = spark.range(100, 150).select(F.col("id").alias("v"))
    row = kmv_overlap(c, d, "v", k=256).collect()[0]
    assert row["c_both"] == 0 and row["est_union"] == 150.0
    assert row["est_jaccard"] == 0.0 and row["est_intersection"] == 0.0


def test_tdigest_bounds_contain_exact_quantiles_and_tails_tighter(spark):
    """The t-digest-style read-off must (a) bracket the exact quantile
    value inside each [lo, hi] envelope, and (b) exhibit the defining
    t-digest accuracy profile: tail centroids (q01, q99) span FEWER
    ranks than the median centroid — accuracy ∝ min(q, 1−q)."""
    from warp_spark.sketches import tdigest_quantiles

    # skewed positive data, one group, exact quantiles known via sort
    vals = [int(1.5**k) + j for k in range(1, 20) for j in range(5)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, cents long"
    )
    row = tdigest_quantiles(
        df, F.col("cents"), "grp", qs=(0.01, 0.5, 0.99)
    ).collect()[0]
    n = len(vals)
    assert row["n"] == n
    s = sorted(vals)
    import math

    for q, name in ((0.01, "q01"), (0.5, "q50"), (0.99, "q99")):
        exact = s[math.ceil(q * n) - 1]
        assert row[f"{name}_lo"] <= exact <= row[f"{name}_hi"], (name, exact, row)
    assert row["q01_rank_span"] <= row["q50_rank_span"]
    assert row["q99_rank_span"] <= row["q50_rank_span"]

    # the strict tail-vs-middle profile, asserted where the law of
    # large buckets applies (at small n midpoint clamping can shrink
    # the median centroid to 1 rank too)
    big = spark.range(0, 20000).select(
        F.lit("g").alias("grp"), (F.col("id") + 1).alias("cents")
    )
    row = tdigest_quantiles(
        big, F.col("cents"), "grp", qs=(0.01, 0.5, 0.99)
    ).collect()[0]
    assert row["q01_rank_span"] < row["q50_rank_span"]
    assert row["q99_rank_span"] < row["q50_rank_span"]


def test_tdigest_hist_shards_merge_by_count_add(spark):
    """Stage 1 is the mergeable artifact: per-shard histograms summed
    cell-wise must produce the IDENTICAL read-off as one global build —
    the contract that lets streamed and batch percentiles share one
    artifact (and the 100 TB shard-rollup path)."""
    from pyspark.sql import functions as F

    from warp_spark.sketches import tdigest_hist, tdigest_quantiles_from_hist

    df = spark.range(0, 5000).select(
        F.lit("g").alias("grp"), (F.col("id") * 7 % 9973 + 1).alias("cents")
    )
    full = tdigest_hist(df, F.col("cents"), "grp")
    sh1 = tdigest_hist(df.filter(F.col("id") % 2 == 0), F.col("cents"), "grp")
    sh2 = tdigest_hist(df.filter(F.col("id") % 2 == 1), F.col("cents"), "grp")
    merged = (
        sh1.unionByName(sh2)
        .groupBy("grp", "__key")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    a = tdigest_quantiles_from_hist(full, "grp").collect()
    b = tdigest_quantiles_from_hist(merged, "grp").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
