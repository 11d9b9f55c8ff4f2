#!/usr/bin/env python
"""sf0.1 -> sf1 scale sweep: per-query times and scaling exponents.

Runs the bench HEADLINE queries at two scale factors (default
/root/testdata/sf0.1 and /root/repo/.scale/sf1 from make_sf1.py) with
the same warmup+min-of-2 protocol as bench.py, and writes
SCALE_SWEEP.json with per-query times and the empirical exponent
log10(t_sf1 / t_sf01) — 1.0 = linear, <1 sublinear (fixed overhead
amortizing), >1 superlinear (a scale risk to explain or fix).

Usage: python scripts/scale_sweep.py [query ...]   (default: all HEADLINE)
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
from bench import HEADLINE  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1", os.path.join(REPO, ".scale", "sf1"))
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


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
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(
        app_name="scale_sweep",
        extra_conf={
            # sf0.1 files are ~10 MB; without this every scan is 1 task
            # (same override and rationale as bench.py)
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.range(1).count()

    rows = {}
    for name in names:
        t01 = time_query(spark, name, SF01)
        t1 = time_query(spark, name, SF1)
        exp = round(math.log10(t1 / t01), 2) if t01 > 0 else None
        rows[name] = {"sf0.1": t01, "sf1": t1, "exp": exp}
        print(f"# {name}: sf0.1={t01:.2f}s sf1={t1:.2f}s exp={exp}", file=sys.stderr)

    # merge into an existing sweep file so a targeted re-run of a few
    # queries updates their rows instead of clobbering the full table
    path = os.path.join(REPO, "SCALE_SWEEP.json")
    merged = {}
    if os.path.exists(path) and set(names) != set(HEADLINE):
        with open(path) as f:
            merged = json.load(f).get("queries", {})
    merged.update(rows)
    out = {
        "protocol": f"warmup + min of {RUNS}, noop sink, local[*]",
        "queries": merged,
        "total_sf0.1": round(sum(r["sf0.1"] for r in merged.values()), 2),
        "total_sf1": round(sum(r["sf1"] for r in merged.values()), 2),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"total_sf0.1": out["total_sf0.1"], "total_sf1": out["total_sf1"], "n": len(rows)}))


if __name__ == "__main__":
    main()
