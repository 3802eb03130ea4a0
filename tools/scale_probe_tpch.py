#!/usr/bin/env python
"""Empirical scaling probe for the relational (TPC-H) catalog queries.

The pipeline probe (tools/scale_probe.py) covers the dedup/ANN/text
operators; this one covers the relational core. It replicates the sf0.1
FACT tables 1x/4x/16x — o_orderkey/l_orderkey offset per replica so the
order→lineitem join key space grows with the data, customers/suppliers/
parts held fixed so the dimension joins stay broadcast-shaped exactly
as they would at 100 TB (dims grow with entities, facts with activity)
— materializes each scale under .scale_tmp/, and times the UNMODIFIED
catalog queries against it. Near-linear time growth = the plan scales;
super-linear = a shuffle or skew problem to fix.

Usage: python tools/scale_probe_tpch.py [sf_dir]   (appends to SCALE.md)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from warp_spark import get_spark  # noqa: E402

FACTS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
DIMS = ["region", "nation", "customer", "supplier", "part"]
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_pseudo_profit",
    "q13_customer_distribution",
    "q18_large_volume",
    "q21_waiting_suppliers",
    "aggregate_reducers",
]
SCRATCH = Path(".scale_tmp")


def materialize(spark, sf_dir: str, mult: int) -> str:
    out = SCRATCH / f"tpch_x{mult}"
    if out.exists():
        return str(out)
    out.mkdir(parents=True)
    for t in DIMS:
        shutil.copy(f"{sf_dir}/{t}.parquet", out / f"{t}.parquet")
    # events/documents/embeddings are not read by the probed queries but
    # keep the dir interface identical to a real sf dir
    max_ok = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    reps = F.broadcast(spark.range(mult).select(F.col("id").alias("rep")))
    for t, key in FACTS.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        scaled = df.crossJoin(reps).withColumn(key, F.col(key) + F.col("rep") * max_ok).drop("rep")
        # one file per mult keeps read parallelism comparable across scales
        scaled.repartition(max(1, mult)).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from warp_spark.catalog import QUERIES as CATALOG

    spark = get_spark("scale-probe-tpch")
    dirs = {m: materialize(spark, sf_dir, m) for m in (1, 4, 16)}

    # warm code paths once so 1x doesn't pay whole-stage codegen
    for q in QUERIES:
        CATALOG[q](spark, dirs[1]).write.format("noop").mode("overwrite").save()

    cells: dict[str, dict[int, str]] = {}
    for q in QUERIES:
        cells[q] = {}
        for m, d in dirs.items():
            t0 = time.time()
            df = CATALOG[q](spark, d)
            n = df.count()
            cells[q][m] = f"{time.time() - t0:.2f}s ({n:,})"
            print(q, f"x{m}", cells[q][m], flush=True)

    lines = [
        "",
        "## Relational (TPC-H) scaling — fact tables 1×/4×/16×, dims fixed",
        "",
        f"`tools/scale_probe_tpch.py` on `{sf_dir}`: orders+lineitem",
        "replicated with per-replica orderkey offsets (join key space",
        "grows with data), dimensions fixed — the 100 TB shape where",
        "facts outgrow entities. Unmodified catalog queries. Cells are",
        "`time (result rows)`; single runs on a shared box — read growth,",
        "not absolutes.",
        "",
        "| query | 1× | 4× | 16× |",
        "|---|---|---|---|",
    ] + [
        f"| {q} | {cells[q][1]} | {cells[q][4]} | {cells[q][16]} |" for q in QUERIES
    ]
    with open("SCALE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()
