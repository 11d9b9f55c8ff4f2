#!/usr/bin/env python
"""Isolated warm min-of-N adjudication for named queries (r8 protocol).

One process, bench-identical session confs, a fresh calibration probe
first (so the numbers are normalizable against any other round's
table), then per query: one untimed warmup + N timed noop-sink runs.

Usage: python scripts/adjudicate.py [--sf DIR] [--runs 3] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_healthcare_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        app_name="adjudicate",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    import bench  # noqa: E402  (reuse the frozen calibration workload)

    calib, calib_raw = bench._calibration_sec(spark, args.runs)
    out: dict[str, object] = {
        "calibration_sec": calib,
        "calibration_raw": calib_raw,
        "sf": args.sf,
        "queries": {},
    }
    for name in args.names:
        spec = REGISTRY[name]
        spec.fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup
        raw = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            raw.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {"min": min(raw), "raw": raw}
        print(f"# {name}: min={min(raw):.3f}s raw={raw}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
