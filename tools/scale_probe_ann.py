#!/usr/bin/env python
"""Focused quiet-box re-probe of the ANN scale cells (VERDICT r5 item 1).

The full tools/scale_probe.py runs ~30 operators in one long JVM; the
two late cells that read super-linear in round 4 (`ann_quantized`
26.3×, `ann_lsh_mp` 11.6× at 16× data) were single runs taken after
minutes of accumulated GC/codegen pressure on a box with bursty
hypervisor steal (the memory file documents a measured 23× distortion
under JVM contention).  This probe isolates exactly the ANN family in
a fresh JVM, refuses to run next to another Spark JVM, and takes
best-of-2 per cell so one steal burst can't write the table.

Expected shape: all four ANN variants score Θ(corpus × queries × dim)
per probe-visited candidate, so at constant query count their COMPUTE
grows ~linearly with corpus (16× data → ≤~16× time, usually much less
while fixed scheduling overhead dominates).  "Flat" only ever applied
to IVF/PQ, whose visited fraction shrinks with nprobe/codebook reuse.

Usage: python tools/scale_probe_ann.py [sf_dir]   (prints md rows)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def preflight() -> None:
    """Refuse to measure next to another Spark JVM; warn on load."""
    me = os.getpid()
    try:
        out = subprocess.run(
            ["pgrep", "-af", "java"], capture_output=True, text=True
        ).stdout
    except FileNotFoundError:
        out = ""
    others = [
        ln for ln in out.splitlines()
        if ("spark" in ln.lower() or "SparkSubmit" in ln) and str(me) not in ln.split()[0]
    ]
    if others:
        print("REFUSING: another Spark JVM is running — timings would be garbage:")
        for ln in others:
            print("  " + ln[:120])
        sys.exit(2)
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    if load1 > 0.5 * ncpu:
        print(f"WARNING: load1={load1:.1f} on {ncpu} cpus — box is not quiet")


def main() -> None:
    preflight()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from warp_spark import get_spark
    from tools.scale_probe import scaled_vecs

    spark = get_spark("scale-probe-ann")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    from warp_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        pq_codebooks,
        pq_topk,
        quantized_topk,
    )

    results: dict[str, list[float]] = {}
    for mult in (1, 4, 16):
        emb = scaled_vecs(emb0, mult).persist()
        n = emb.count()
        print(f"mult={mult}: {n} vectors", flush=True)
        q = emb.filter(F.col("vec_id") < 10)
        cb = pq_codebooks(emb)  # trained artifact, reused (scale discipline)
        ops = {
            "ann_bruteforce": lambda: brute_force_topk(q, emb),
            "ann_ivf": lambda: ivf_topk(q, emb, n_centroids=16, nprobe=4),
            "ann_lsh_mp": lambda: lsh_topk(
                q, emb, num_planes=4, num_tables=8, multi_probe=True
            ),
            "ann_pq_rerank": lambda: pq_topk(q, emb, rerank=50, codebooks=cb),
            "ann_quantized": lambda: quantized_topk(q, emb),
        }
        for name, build in ops.items():
            best = float("inf")
            rows = -1
            for _ in range(2):  # best-of-2: one steal burst can't write the table
                t0 = time.time()
                rows = build().count()
                best = min(best, time.time() - t0)
            results.setdefault(name, []).append(best)
            print(f"  {name:18s} x{mult:<3d} {best:7.2f}s  rows={rows}", flush=True)
        emb.unpersist()

    print("\nSCALE.md rows (best-of-2, quiet box, fresh JVM):")
    print("| operator | 1× | 4× | 16× | time growth | output growth |")
    for name, ts in results.items():
        growth = ts[-1] / ts[0] if ts[0] > 0 else float("nan")
        print(
            f"| {name} | {ts[0]:.2f}s (50) | {ts[1]:.2f}s (50) | "
            f"{ts[2]:.2f}s (50) | {growth:.1f}× | 1× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
