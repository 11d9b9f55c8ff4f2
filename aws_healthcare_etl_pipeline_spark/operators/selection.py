"""Distributed exact selection (k-th smallest / median) WITHOUT a
global sort.

A total sort of 100 TB to read one middle element is the canonical
waste; the selection algorithm does histogram passes instead: bucket
the domain, count per bucket (one map-side-combined aggregation),
find the bucket containing rank k, recurse into it. With B buckets a
domain of D distinct values needs ceil(log_B D) passes — 2 passes at
B=4096 cover 16M distinct values, 3 cover 64G. Each pass ships B
counts per partition, nothing else.

Works on integer domains (cents, epoch units, ids). Exactness is
trivial: the final interval has one distinct value = the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    n_buckets: int = 4096,
    max_passes: int = 8,
) -> int:
    """Exact k-th smallest (1-based) of an integer column via
    iterative histogram refinement. Driver state per pass: B counts."""
    bounds = df.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    remaining_k = k
    for _ in range(max_passes):
        if lo == hi:
            return lo
        span = hi - lo + 1
        width = max(1, -(-span // n_buckets))  # ceil
        bucket = ((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
        counts = dict(
            (r.b, r.n)
            for r in df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc = 0
        for b in range(n_buckets + 1):
            n = counts.get(b, 0)
            if acc + n >= remaining_k:
                remaining_k -= acc
                lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
                break
            acc += n
        else:
            raise ValueError("rank k exceeds row count in range")
    if lo != hi:
        raise RuntimeError(f"did not converge: [{lo}, {hi}]")
    return lo


def exact_median_cents(df: DataFrame, money_col: Column) -> tuple[int, int, float]:
    """(n, median_cents, median) of a 2-decimal money column: lower
    median for even n (deterministic, matches quantile_disc 0.5 with
    DuckDB's lower-mid convention is NOT assumed — callers state the
    convention they oracle against)."""
    cents_df = df.select((money_col * 100).cast("long").alias("__c"))
    n = cents_df.count()
    k = (n + 1) // 2  # lower median
    c = kth_smallest(cents_df, "__c", k)
    return n, c, c / 100.0
