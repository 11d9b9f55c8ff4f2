#!/usr/bin/env python
"""Fourth-decade scale points (sf3 / sf10) under the min-of-3 protocol.

sf10 (= 100x the bench SF, .scale/sf10 from
``SPARK_GRAFT_REPLICAS=100 make_sf1.py``) raw spreads reach 2.6x on
the heavy dedup entries, so min-of-2 readings there are unreliable —
both round-10 false alarms (wash_sale 1.26->0.71, method_agreement
1.09->0.71) were min-of-2 artifacts. This script pins the protocol:
one untimed warmup + THREE timed noop-sink runs per (query, sf), both
scale factors measured in the same session, a host-speed calibration
probe first (bench._calibration_sec, so the numbers are normalizable
against any other round's table). Rows merge into SCALE10.json with
the raw arrays kept for audit.

Exponent: ln(t_sf10 / t_sf3) / ln(10/3) — 1.0 = linear.

Usage: python scripts/scale_fourth_decade.py [--runs 3] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_healthcare_etl_pipeline_spark.session import get_spark  # noqa: E402

SF3 = os.environ.get("SPARK_GRAFT_SF3", os.path.join(REPO, ".scale", "sf3"))
SF10 = os.environ.get("SPARK_GRAFT_SF10", os.path.join(REPO, ".scale", "sf10"))


def time_query(spark, name: str, sf_dir: str, runs: int) -> tuple[float, list[float]]:
    spec = REGISTRY[name]

    def once() -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    raw = [once() for _ in range(max(3, runs))]
    return min(raw), raw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        app_name="scale_fourth_decade",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    import bench  # noqa: E402  (reuse the frozen calibration workload)

    calib, calib_raw = bench._calibration_sec(spark, args.runs)
    print(f"# calibration: {calib:.3f}s raw={calib_raw}", file=sys.stderr)

    path = os.path.join(REPO, "SCALE10.json")
    doc = json.load(open(path)) if os.path.exists(path) else {"queries": {}}
    doc.setdefault("queries", {})
    for name in args.names:
        t3, raw3 = time_query(spark, name, SF3, args.runs)
        t10, raw10 = time_query(spark, name, SF10, args.runs)
        exp = round(math.log(t10 / t3) / math.log(10 / 3), 2)
        doc["queries"][name] = {
            "sf3": t3,
            "sf10": t10,
            "exp_3_10": exp,
            "raw_sf3": raw3,
            "raw_sf10": raw10,
            "protocol": f"warmup + min-of-{max(3, args.runs)}, same-session, cal {calib}",
        }
        print(
            f"# {name}: sf3={t3:.2f}s {raw3} sf10={t10:.2f}s {raw10} exp={exp}",
            file=sys.stderr,
        )
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({"n": len(args.names), "calibration_sec": calib, "out": "SCALE10.json"}))


if __name__ == "__main__":
    main()
