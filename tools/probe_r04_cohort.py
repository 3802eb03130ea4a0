#!/usr/bin/env python
"""Re-bench the 42 r04-vintage catalog entries before they re-enter the
driver window (VERDICT r7 item 3): they carry the oldest per-query
timing evidence in the catalog and several predate the r7
aggregate-split and the r5/r6 CollapseProject disciplines — the
full-catalog wall number would hide a silent single-query regression.

Protocol matches bench.py exactly: warm every query shape at sf0.001
first, then best-of-2 ROUND-ROBIN at sf0.1 to a noop sink.  Historical
baselines are the per-query numbers visible in the committed
BENCH_r0{4,7}.json driver tails (the driver truncates stdout, so only a
subset of each round's map survives; r7 numbers are used where r4's
didn't survive — both are best-of-N mins at sf0.1 on this box).

Prints a PARITY.md-ready table; ratios > 1.5× are flagged for
investigation (the box's documented single-query noise is ±30-45 %, so
1.5× is the smallest honest threshold).

Usage: python tools/probe_r04_cohort.py
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

COHORT = [
    "stratified_sample", "text_repetition", "text_tfidf_topterms",
    "decontaminate_bloom", "source_roundtrip_formats", "bpe_train_merges",
    "pipeline_curation_summary", "dedup_clusters_star", "winnow_overlap",
    "embedding_semantic_dedup", "ann_topk_pq", "ann_topk_quantized",
    "events_funnel", "events_user_retention", "events_gapfill_hourly",
    "q22_idle_customers", "q11_important_parts", "q20_promotable_suppliers",
    "q21_waiting_suppliers", "dedup_incremental", "events_stream_stream_join",
    "chunk_documents_rag", "split_assign", "events_heavy_hitters_streamed",
    "corr_matrix", "embedding_kmeans", "events_ewma", "dedup_containment",
    "quality_robust_stats", "zorder_index", "profile_orders",
    "quality_percentile_cut", "rollup_revenue", "window_functions_suite",
    "set_operations", "percentiles_exact", "semi_anti_join", "text_lm_score",
    "infer_formula_roundtrip", "mutable_dml_roundtrip", "multimodal_png_real",
    "multimodal_wav_real",
]


def historical() -> dict[str, tuple[float, str]]:
    """name -> (seconds, source_round), preferring the oldest (r4)."""
    out: dict[str, tuple[float, str]] = {}
    for rnd in ("07", "04"):  # r4 written last → wins
        try:
            tail = json.load(open(f"BENCH_r{rnd}.json")).get("tail", "")
        except FileNotFoundError:
            continue
        for name, val in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
            if name in COHORT:
                out[name] = (float(val), f"r{int(rnd)}")
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_r04_cohort")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    qs = m.queries()
    # warm every shape (codegen/classload) at the tiny SF, like bench.py
    for name in COHORT:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    best: dict[str, float] = {}
    for _ in range(2):
        for name in COHORT:
            t0 = time.time()
            qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
    hist = historical()
    print("| entry | r8 best (s) | hist (s) | src | ratio |")
    print("|---|---|---|---|---|")
    flagged = []
    for name in COHORT:
        now = best[name]
        if name in hist:
            h, src = hist[name]
            ratio = now / h if h > 0 else float("inf")
            mark = " ⚠" if ratio > 1.5 else ""
            if ratio > 1.5:
                flagged.append((name, now, h, src, ratio))
            print(f"| {name} | {now:.2f} | {h:.2f} | {src} | {ratio:.2f}×{mark} |")
        else:
            print(f"| {name} | {now:.2f} | — | none survives tail | — |")
    print()
    if flagged:
        print("FLAGGED (>1.5×):", [f"{n} {r:.2f}×" for n, *_, r in flagged])
    else:
        print("No entry exceeds 1.5× of its recorded history.")
    spark.stop()


if __name__ == "__main__":
    main()
