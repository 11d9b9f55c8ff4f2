#!/usr/bin/env python
"""Builder-side replica of the driver correctness gate at any SF.

Runs each named query through __spark_entry__.queries() on a HOSTILE
plain session (driver-style: its own SparkSession, non-UTC default
until _prepared fixes it) and its oracle through DuckDB on the same
parquet, comparing with tests/oracle_compare.compare_frames (stricter
than the driver's hash).

Usage:
  python scripts/driver_sim.py [--sf DIR] query [query ...]
  python scripts/driver_sim.py --sf /root/testdata/sf0.01 --all
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from oracle_compare import compare_frames  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
            if name in oracles:
                duck_pdf = duck.execute(oracles[name]).fetchdf()
                problems = compare_frames(spark_pdf, duck_pdf, name)
            else:
                problems = [] if len(spark_pdf.columns) else [f"{name}: empty schema"]
        except Exception as exc:  # surface, keep sweeping
            problems = [f"{name}: ERROR {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        status = "PASS" if not problems else "FAIL"
        if problems:
            n_fail += 1
        print(f"{status} {name} ({dt:.1f}s)")
        for p in problems[:3]:
            print(f"  {p}")
    print(f"\n{len(names) - n_fail}/{len(names)} green")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
