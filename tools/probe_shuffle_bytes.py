#!/usr/bin/env python
"""Measured shuffle BYTES per catalog entry (VERDICT r7 item 5): the
100 TB claim for the heavy curation ops needs a bytes-level argument,
not just wall-clock ratios — time cells on this box carry ±30-45 %
steal noise, but shuffle bytes are a property of the plan and the data,
deterministic run-to-run.

Method: enable Spark event logging into a temp dir, run each entry to
a noop sink in its own SparkSession (one event-log file per entry),
then parse SparkListenerTaskEnd records summing
  - Shuffle Write Metrics / Shuffle Bytes Written   (bytes leaving map tasks)
  - Input Metrics / Bytes Read                      (scan-side bytes)
and report bytes at TWO scale factors so bytes/row linearity is
measured, not asserted.  Extrapolation to 100 TB is then arithmetic:
shuffle_bytes(sf) / input_rows(sf) held flat across a 10× step means
the shuffle volume is Θ(input) — a 1000-executor cluster moves
input_bytes × (measured shuffle/input ratio), with no super-linear
blow-up hiding below the test SFs.

Usage: python tools/probe_shuffle_bytes.py [entry ...]
       (default: the three r7-punch curation entries)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

DEFAULT_ENTRIES = [
    "curation_ablation_funnel",
    "curation_dsir_weights",
    "decontaminate_neardup",
]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def run_entry(name: str, sf_dir: str, log_dir: str) -> dict:
    """One fresh session per (entry, sf): the event log then contains
    exactly this entry's jobs — no cross-entry attribution problem."""
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"shuffle_probe_{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")  # parse as plain JSONL
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .getOrCreate()
    )
    try:
        df = m.queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    finally:
        spark.stop()  # flushes + closes the event log
    shuffle_w = 0
    input_b = 0
    # Spark 4 writes an eventlog_v2_<app> DIRECTORY (rolling format):
    # walk every regular file under the log dir
    paths = [
        os.path.join(root, fn)
        for root, _, fns in os.walk(log_dir)
        for fn in fns
        if not fn.startswith("appstatus_")
    ]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tm = ev.get("Task Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                shuffle_w += sw.get("Shuffle Bytes Written", 0)
                im = tm.get("Input Metrics") or {}
                input_b += im.get("Bytes Read", 0)
    return {"shuffle_write_bytes": shuffle_w, "input_bytes": input_b}


def input_rows(sf_dir: str, tables: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(sf_dir, f"{t}.parquet")).metadata.num_rows
        for t in tables
    )


# the tables each entry actually scans (for the rows denominator)
ENTRY_TABLES = {
    "curation_ablation_funnel": ["documents"],
    "curation_dsir_weights": ["documents"],
    "decontaminate_neardup": ["documents"],
    "graph_jaccard_links": ["lineitem"],
    "graph_wedges_persist": ["lineitem"],
    "dedup_index_persist": ["documents"],
    "dedup_index_probe": ["documents"],
    "stats_ks_two_sample": ["orders", "customer"],
    "dedup_index_append": ["documents"],
    "tdigest_persist": ["lineitem"],
    "graph_jaccard_links_exact": ["lineitem"],
}


def main() -> None:
    # the gateway JVM is the driver in local mode and its heap is fixed
    # at first launch — the PySpark default 1g OOMs on the wedge-census
    # entries at sf0.1, so size it BEFORE the first SparkSession
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell"
    )
    entries = sys.argv[1:] or DEFAULT_ENTRIES
    print("| entry | sf | input rows | input MiB | shuffle-write MiB | shuffle B/row |")
    print("|---|---|---|---|---|---|")
    results: dict[tuple[str, str], dict] = {}
    for name in entries:
        for sf_dir in SFS:
            log_dir = tempfile.mkdtemp(prefix=f"evlog_{name}_")
            try:
                met = run_entry(name, sf_dir, log_dir)
            finally:
                shutil.rmtree(log_dir, ignore_errors=True)
            rows = input_rows(sf_dir, ENTRY_TABLES.get(name, ["documents"]))
            met["rows"] = rows
            results[(name, sf_dir)] = met
            sf = os.path.basename(sf_dir)
            print(
                f"| {name} | {sf} | {rows:,} "
                f"| {met['input_bytes'] / 2**20:.1f} "
                f"| {met['shuffle_write_bytes'] / 2**20:.2f} "
                f"| {met['shuffle_write_bytes'] / max(rows, 1):.0f} |",
                flush=True,
            )
    print()
    for name in entries:
        a = results[(name, SFS[0])]
        b = results[(name, SFS[1])]
        r_rows = b["rows"] / max(a["rows"], 1)
        r_shuf = b["shuffle_write_bytes"] / max(a["shuffle_write_bytes"], 1)
        print(
            f"{name}: rows ×{r_rows:.1f} → shuffle bytes ×{r_shuf:.1f} "
            f"({'sub-linear' if r_shuf <= r_rows * 1.05 else 'SUPER-LINEAR'}); "
            f"bytes/row {b['shuffle_write_bytes'] / max(b['rows'], 1):.0f} at "
            f"{os.path.basename(SFS[1])}"
        )


if __name__ == "__main__":
    main()
