#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column names, and values
(order-insensitive, column-name-sorted, float-tolerant).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact compare — the driver's hash is exact, so the local gate
        # must be at least as strict or local green won't predict driver
        # green (this masked the round-1/2 variancePopulation failure)
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c.lower() for c in sorted(columns, key=str.lower)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from warp_spark import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows={len(srows)} (no oracle — rows-only check)")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            res = con.sql(sql)
            ocols = list(res.columns)
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sr = normalize_rows(scols, srows)
        oc, orr = normalize_rows(ocols, orows)
        dt = time.time() - t0
        if sc != oc:
            print(f"FAIL  {name}: schema mismatch spark={sc} oracle={oc}")
            failures.append(name)
        elif len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            failures.append(name)
        elif sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(sr)} rows [{dt:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print(f"all {len([q for q in queries if not only or q in only])} queries passed")


if __name__ == "__main__":
    main()
