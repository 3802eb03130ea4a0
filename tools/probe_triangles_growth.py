#!/usr/bin/env python
"""Triangle-count probe on a GROWING edge set (VERDICT r6 item 2).

The generic sf1 replication (tools/probe_sf1.py) offsets orderkeys but
keeps `l_partkey` in the original key space, so every replica re-emits
the SAME part co-purchase edges — the distinct edge set saturates and
the flat 10× SCALE.md cell for `graph_triangle_counts` exercised the
scan, not the graph algorithm.  This probe replicates lineitem with
per-replica offsets on BOTH keys (`l_orderkey` so the co-order groups
stay replica-local, `l_partkey` so each replica owns a disjoint part id
space): the result is MULT disjoint copies of the co-purchase graph, so
edges, triangles, and wedge work all grow exactly MULT×.

Two measurements, run on the catalog entry UNMODIFIED:

1. **Wall time** sf0.1 vs the grown graph (best-of-2 round-robin, noop
   sink, quiet-box pre-flight) — the judged number.
2. **Exact wedge work** Σ C(outdeg⁺, 2) over the degree-ordered
   orientation at both scales — the deterministic work metric the
   O(m^1.5) claim is about, immune to box noise.  For a graph whose
   edge count grows 10× the NAIVE bound allows (10m)^1.5 / m^1.5 ≈
   31.6× more wedge work; degree-ordered orientation on a
   structure-preserving 10× replication should hold it to ≈10×
   (degrees unchanged, just 10× as many vertices), demonstrating the
   work tracks Σ C(d⁺,2), not the hub-degree square.

Usage: python tools/probe_triangles_growth.py [--rebuild]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SF01 = "/root/testdata/sf0.1"
GROWN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sf1_parts",
)
MULT = 10


def build_grown(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(GROWN, exist_ok=True)
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    okey_span = li.agg(F.max("l_orderkey")).first()[0] + 1
    pkey_span = li.agg(F.max("l_partkey")).first()[0] + 1
    reps = li.crossJoin(
        F.broadcast(spark.range(MULT).select(F.col("id").alias("rep")))
    )
    reps.select(
        (F.col("l_orderkey") + F.col("rep") * okey_span).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * pkey_span).alias("l_partkey"),
        "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(f"{GROWN}/lineitem.parquet")
    print(f"  wrote lineitem ({MULT}× rows, disjoint order+part key spaces)", flush=True)


def copurchase_edges(spark, sf_dir):
    """The exact edge construction graph_triangle_counts uses."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    other = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    return (
        li.join(other, "l_orderkey")
        .where(F.col("l_partkey") < F.col("dst"))
        .select(F.col("l_partkey").alias("src"), "dst")
    )


def wedge_work(spark, sf_dir):
    """(edges, Σ C(outdeg⁺,2)) under the (degree, node) orientation —
    the deterministic size of triangle_counts' wedge join input."""
    from pyspark.sql import functions as F

    u, v = F.col("src"), F.col("dst")
    und = (
        copurchase_edges(spark, sf_dir)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    m = und.count()
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    outdeg = (
        ranked.select(
            F.when(
                F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
                < F.struct(F.col("dv").alias("d"), F.col("v").alias("n")),
                F.col("u"),
            )
            .otherwise(F.col("v"))
            .alias("a")
        )
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    wedges = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("long").alias("w")
    ).first()["w"]
    und.unpersist()
    return m, wedges


def main() -> None:
    from tools.scale_probe_ann import preflight

    preflight()
    from warp_spark import get_spark
    from warp_spark.catalog import QUERIES

    spark = get_spark("probe-triangles-growth")
    if "--rebuild" in sys.argv and os.path.isdir(GROWN):
        shutil.rmtree(GROWN)
    if not os.path.isdir(GROWN):
        print(f"building .scratch/sf1_parts ({MULT}× lineitem, growing graph) ...", flush=True)
        build_grown(spark)

    print("exact work metric (deterministic, noise-immune):", flush=True)
    stats = {}
    for label, d in (("sf0.1", SF01), ("grown", GROWN)):
        m, w = wedge_work(spark, d)
        stats[label] = (m, w)
        print(f"  {label:6s} edges={m:,} wedges={w:,}", flush=True)
    me = stats["grown"][0] / stats["sf0.1"][0]
    we = stats["grown"][1] / stats["sf0.1"][1]
    naive = me ** 1.5
    print(
        f"  edge growth {me:.1f}× → wedge growth {we:.1f}× "
        f"(naive m^1.5 bound would allow {naive:.1f}×)",
        flush=True,
    )

    def run(sf_dir):
        QUERIES["graph_triangle_counts"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run("/root/testdata/sf0.001")  # codegen warmup
    best = {}
    for _ in range(2):
        for label, d in (("sf0.1", SF01), ("grown", GROWN)):
            t0 = time.time()
            run(d)
            dt = time.time() - t0
            best[label] = min(best.get(label, dt), dt)
            print(f"  graph_triangle_counts {label:6s} {dt:7.2f}s", flush=True)

    print("\nSCALE.md cell (best-of-2, quiet box):")
    print("| query | sf0.1 | grown (edges ×%.1f) | time growth | wedge growth | naive bound |" % me)
    print("|---|---|---|---|---|---|")
    print(
        f"| graph_triangle_counts | {best['sf0.1']:.2f}s | {best['grown']:.2f}s "
        f"| {best['grown'] / best['sf0.1']:.1f}× | {we:.1f}× | {naive:.1f}× |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
