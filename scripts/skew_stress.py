#!/usr/bin/env python
"""Skew stress: time the join-heaviest headline queries on uniform sf1
vs the zipf-skewed sf1 variant (scripts/make_sf1_skew.py).

The two datasets have IDENTICAL row counts and payload distributions —
only the fact-side foreign-key frequencies differ (cubic head: the
hottest supplier owns ~4.6% of lineitem) — so wall_skew / wall_uniform
isolates what key skew does to each plan's shuffle/join stages. A
ratio >2x is a straggler: the fix is salting, a broadcast, or AQE
skew-join kicking in (spark.sql.adaptive.skewJoin is ON in
session.py; this is the first dataset that actually triggers it).

Results merge into SKEW_STRESS.json; SCALE.md quotes the table.

Usage: python scripts/skew_stress.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402
from aws_healthcare_etl_pipeline_spark.session import get_spark  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1", os.path.join(REPO, ".scale", "sf1"))
SFZ = os.environ.get(
    "SPARK_GRAFT_SF1ZIPF", os.path.join(REPO, ".scale", "sf1zipf")
)
OUT = os.path.join(REPO, "SKEW_STRESS.json")

# The 20 join-heaviest headline queries whose join/groupBy keys include
# a skewed column (l_suppkey, l_partkey, o_custkey, user_id).
JOIN_HEAVY = [
    "q5_region_revenue",
    "q3_shipping_priority",
    "join_brand_supplier_volume",
    "left_join_order_counts",
    "q7_nation_trade_pairs",
    "q18_large_volume_customers",
    "q20_shaped_dominant_supplier",
    "q21_sole_late_supplier",
    "join_salted_skew_equivalence",
    "join_bucketed_colocated",
    "join_hint_shuffle_hash",
    "join_bloom_filter_audit",
    "asof_purchase_last_click",
    "sessionize_user_events",
    "scd2_point_in_time_join",
    "interval_join_campaign_orders",
    "orders_cohort_ltv_triangle",
    "audit_join_fanout_estimates",
    "view_incremental_join_maintenance",
    "graph_triangle_count",
]


def time_query(spark, name: str, sf_dir: str) -> float:
    spec = REGISTRY[name]
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    names = sys.argv[1:] or JOIN_HEAVY
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(
        app_name="skew-stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name in names:
        tu = time_query(spark, name, SF1)
        tz = time_query(spark, name, SFZ)
        ratio = round(tz / tu, 2) if tu > 0 else None
        results[name] = {
            "uniform_sec": tu,
            "zipf_sec": tz,
            "ratio": ratio,
        }
        print(f"{name}: uniform={tu:.2f}s zipf={tz:.2f}s ratio={ratio}")
    json.dump(results, open(OUT, "w"), indent=1, sort_keys=True)
    bad = {k: v for k, v in results.items() if (v["ratio"] or 0) > 2}
    print(f"\n>2x blowups: {list(bad) or 'none'} -> {OUT}")


if __name__ == "__main__":
    main()
