#!/usr/bin/env python
"""Plan audit: compile every catalog query at the given SF and report
the physical-plan properties that matter at 100 TB — shuffle count,
join strategies, parquet pushdown, Python stages. Writes PLANS.md.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def audit(plan: str) -> dict:
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "python": ("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan)
        or ("BatchEvalPython" in plan),
        "pushed": "PushedFilters: [I" in plan or "PushedFilters: [Eq" in plan
        or "PushedFilters: [Gr" in plan or "PushedFilters: [Le" in plan,
        "scan_cols": max((len(s.split(",")) for s in scans), default=0),
        "windows": plan.count("RunningWindowFunction") + plan.count("Window ["),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from warp_spark import get_spark
    from warp_spark.catalog import QUERIES

    spark = get_spark("plan-report")
    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, audit(plan)))
        except Exception as e:  # noqa: BLE001
            rows.append((name, {"error": str(e)[:60]}))

    lines = [
        "# PLANS — physical-plan audit of every catalog query",
        "",
        f"Compiled (not executed) against `{sf_dir}`; AQE initial plans.",
        "Columns: shuffle Exchanges / joins by strategy (broadcast-hash,",
        "sort-merge, shuffled-hash) / BNL+cartesian (must be 0 everywhere",
        "except the documented driver-side utilities) / Python stages",
        "(Arrow-batched only, by design) / parquet filter pushdown / max",
        "columns read by any scan (pruning).",
        "",
        "| query | exch | BHJ | SMJ | SHJ | BNL | py | pushdown | max scan cols |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | compile error: {a['error']} | | | | | | | |")
            continue
        lines.append(
            "| {n} | {exchanges} | {bhj} | {smj} | {shj} | {bnl} | {py} | {pu} | {sc} |".format(
                n=name,
                py="yes" if a["python"] else "—",
                pu="yes" if a["pushed"] else "—",
                sc=a["scan_cols"],
                **{k: a[k] for k in ("exchanges", "bhj", "smj", "shj", "bnl")},
            )
        )
    # As of round 4 the ONLY allowed BNL source is the exact/quantized
    # k-NN baseline: cross-score vs a tiny broadcast query set IS the
    # right plan (corpus never shuffles; map-side window top-k). The
    # recall entries embed that baseline. Every former 1-row scalar
    # crossJoin (q11/q22/tf-idf/funnel/sampling invariants) now inlines
    # the separately-computed aggregate as literals (catalog._scalar_join
    # — the DataFrame form of a SQL scalar subquery), so any other BNL
    # is a regression.
    expected_bnl = {
        "ann_topk_bruteforce",
        "ann_topk_quantized",
        "ann_topk_lsh",
        "ann_topk_ivf",
        "ann_topk_pq",
        "ann_topk_ivfpq",
        # embeds the exact-kNN vector leg (brute_force_topk crossJoin)
        "hybrid_search_rrf",
        # recall contract vs the same exact baseline (probe side itself
        # is pruned-scan + mapInPandas, no BNL)
        "ann_index_probe",
        # same recall contract over the APPENDED index (r12) — the BNL
        # is the embedded brute_force_topk baseline, not the probe
        "ann_index_append",
        "ann_index_compact",
        # same recall contract over the DELETED index (r13) — again the
        # embedded exact baseline, not the delete/probe path
        "ann_index_delete",
        # embeds brute_force_topk PLUS the bounded candidate x candidate
        # similarity matrix (N=100 re-rank set) — both documented legs
        "embedding_mmr_diversify",
        # Mann-Kendall sign census: the non-equi (day_j > day_i) pair join
        # runs on the DAYS-BOUNDED artifact (<= ~2400 rows at any SF — time
        # span, not volume; rows collapse to per-day counts first), so the
        # nested loop is over O(span²) tiny pairs, never data
        "stats_trend_mann_kendall",
    }
    bnl_offenders = [
        n for n, a in rows if a.get("bnl", 0) > 0 and n not in expected_bnl
    ]
    lines += [
        "",
        f"BNL/cartesian outside the documented exact k-NN baseline: "
        f"{bnl_offenders or 'none'}.",
        "Python stages appear only in the pandas-UDF tier operators",
        "(simhash, minhash signature, IVF scoring, multimodal, blocked",
        "cosine) — every relational/text/formula query is pure JVM.",
        "`dedup_clusters` and `graph_pagerank` show flat plans because",
        "their iterative rounds run through localCheckpoint (lineage",
        "truncated by design; per-superstep shape is one co-partitioned",
        "join + one sum-by-dst aggregation).  `graph_triangle_counts`",
        "shows an INFLATED textual count: its persisted oriented-edge",
        "build is referenced three times (wedge join twice + closure",
        "probe) and plan toString expands the cached subtree at each",
        "InMemoryTableScan — runtime executes that subtree once.",
        "",
        '## WindowExec "No Partition Defined" warnings (benign, bounded)',
        "",
        "Spark logs `WARN WindowExec: No Partition Defined for Window",
        "operation! Moving all data to a single partition` for any",
        "un-partitioned window. Catalog sites that emit it:",
        "",
        "- `rank_running_total` / `Dataset.rank` distributed-prefix path:",
        "  the window input is the per-shuffle-partition totals table —",
        "  one row per partition (≤ spark.sql.shuffle.partitions = 32",
        "  here, a few thousand on a large cluster), never the data. The",
        "  data-bearing stage stays hash-partitioned; this is the designed",
        "  two-phase prefix shape.",
        "- `Dataset.rank` fallback for non-prefix-decomposable reducers:",
        "  the whole input on one task, deliberate and now runtime-warned",
        "  (dataset.py) — preview-sized data only.",
    ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
