"""Property-based checks for the exact-arithmetic operators:
largest-remainder allocation (conservation + quota fairness) and the
2-D Pareto frontier (agreement with brute-force dominance)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.frontier import pareto_frontier_2d
from aws_healthcare_etl_pipeline_spark.operators.money import (
    allocate_largest_remainder,
)

# groups of (total, [weights]) — weights positive, totals non-negative
alloc_cases = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.lists(st.integers(1, 500), min_size=1, max_size=8),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=15, deadline=None)
@given(cases=alloc_cases)
def test_allocation_conserves_and_respects_quota(spark, cases):
    rows = [
        (g, i, w, total)
        for g, (total, weights) in enumerate(cases)
        for i, w in enumerate(weights)
    ]
    df = spark.createDataFrame(rows, "grp long, item long, w long, total long")
    out = allocate_largest_remainder(
        df, key="grp", weight="w", total="total", tiebreak="item", out="alloc"
    ).collect()

    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["grp"], []).append(r)
    for g, (total, weights) in enumerate(cases):
        got = by_group[g]
        # conservation: allocations sum exactly to the group total
        assert sum(r["alloc"] for r in got) == total
        # quota property of largest-remainder: every allocation is the
        # exact proportional share rounded down or up, never further
        sum_w = sum(weights)
        for r in got:
            exact = total * r["w"] / sum_w
            assert int(exact) <= r["alloc"] <= int(exact) + 1


points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)),
    min_size=1,
    max_size=30,
)


def _brute_frontier(pts: list[tuple[int, int]]) -> set[tuple[int, int, int]]:
    keep = set()
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y)) for x2, y2 in pts
        )
        if not dominated:
            keep.add((i, x, y))
    return keep


@settings(max_examples=15, deadline=None)
@given(pts=points)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    got = {
        (r["id"], r["x"], r["y"])
        for r in pareto_frontier_2d(df, x="x", y="y").collect()
    }
    assert got == _brute_frontier(pts)
