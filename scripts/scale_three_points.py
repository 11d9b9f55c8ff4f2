#!/usr/bin/env python
"""Three-point scale check (sf0.1 / sf1 / sf3) for the queries with the
largest sf0.1->sf1 exponents.

Two timing points fit ANY straight line: a measured exponent of 1.09
could be a true superlinear kernel or a one-off crossover (cache
spill, candidate-domain saturation) that decays at the next decade.
The third point separates them (VERDICT r3 #5): per query this prints
and stores both segment exponents —

    e_01_1 = log10(t_sf1 / t_sf0.1)          (10x data)
    e_1_3  = log(t_sf3 / t_sf1) / log(3)     (3x data)

A true superlinear kernel keeps e_1_3 >= e_01_1; a saturation artifact
shows e_1_3 well below it. Results merge into SCALE3.json.

Usage: python scripts/scale_three_points.py [query ...]
       (default: the worst-5 list from VERDICT r3)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_healthcare_etl_pipeline_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1", os.path.join(REPO, ".scale", "sf1"))
SF3 = os.environ.get("SPARK_GRAFT_SF3", os.path.join(REPO, ".scale", "sf3"))
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

WORST5 = [
    "dedup_ngram_jaccard_pairs",
    "fuzzy_name_matches",
    "text_pii_redaction",
    "pipeline_ffd_packing",
    "interval_join_campaign_orders",
]


def time_query(spark, name: str, sf_dir: str) -> float:
    """Warmup + min-of-RUNS, auto-escalating to min-of-3 when the
    min-of-2 spread exceeds 1.5x (round-11 protocol: both round-10
    false alarms — wash_sale 1.26->0.71, method_agreement 1.09->0.71
    — were min-of-2 artifacts of a GC/host-load outlier; a third
    sample is cheap insurance against recording one)."""
    spec = REGISTRY[name]

    def once() -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    raw = [once() for _ in range(RUNS)]
    while len(raw) < max(3, RUNS) and max(raw) / min(raw) > 1.5:
        raw.append(once())
    return round(min(raw), 3)


def main() -> None:
    names = sys.argv[1:] or WORST5
    spark = get_spark(
        app_name="scale3",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    path = os.path.join(REPO, "SCALE3.json")
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))
    for name in names:
        t01 = time_query(spark, name, SF01)
        t1 = time_query(spark, name, SF1)
        t3 = time_query(spark, name, SF3)
        e01_1 = round(math.log10(t1 / t01), 2)
        e1_3 = round(math.log(t3 / t1) / math.log(3), 2)
        results[name] = {
            "sf0.1": t01, "sf1": t1, "sf3": t3,
            "exp_sf0.1_sf1": e01_1, "exp_sf1_sf3": e1_3,
        }
        print(
            f"# {name}: {t01:.2f}s -> {t1:.2f}s -> {t3:.2f}s  "
            f"exp {e01_1} then {e1_3}",
            file=sys.stderr,
        )
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({"n": len(names), "out": "SCALE3.json"}))


if __name__ == "__main__":
    main()
