"""Distributed exact running totals — no global-window sort.

A running total ``SUM(x) OVER (ORDER BY k)`` planned naively is a
single-partition WindowExec: every row of the frame funnels through
one task — the canonical entity-grain scale-killer this repo's own
SCALE.md grammar forbids. The two-level decomposition here is the
pattern SCALE.md's sweep-line note promises ("per-bucket sums, then
add each bucket's carry-in"), as a reusable operator:

1. one partial-aggregating shuffle reduces the frame to BUCKET
   subtotals (a bounded grain the caller picks — e.g. month);
2. an exclusive prefix sum over that bounded spine produces each
   bucket's carry-in (the only unpartitioned window, over B rows);
3. a window PARTITIONED by bucket computes the within-bucket running
   sum (per-partition sorts, externally spillable, fully parallel);
4. carry-in joins back by bucket (broadcast — B rows) and adds.

Exactness: the value column must be DECIMAL (the registry convention)
so partial sums are associative and carry + within == the global
running sum bit-for-bit.

Cost at 100 TB: shuffle 1 is the same partial-agg shuffle any
aggregate pays; the per-bucket windows sort only their partition; the
spine window is B rows. Wall-clock parallelism is bounded by the
bucket count — pick a bucket granularity with >= cluster-parallelism
buckets (day/hour for order-grain frames).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_running_total(
    df: DataFrame,
    value: Column,
    bucket_col: str,
    order_cols: list[str],
    out_col: str = "running_total",
    zero: Column | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact running sum of ``value`` over rows
    ordered by (bucket_col, *order_cols), without a global window.

    ``value`` must be an exact (DECIMAL/integral) expression;
    ``order_cols`` must make the global order total (tie-free) for a
    deterministic result. ``zero`` is the first bucket's carry-in and
    must match SUM(value)'s type (default: decimal).

    ``bucket_col`` must be a monotone function of the leading order
    dimension (e.g. month of an ordered date) so that ordering by
    (bucket, *order_cols) equals the intended global order.
    """
    if zero is None:
        zero = F.lit(0).cast("decimal(25,2)")
    sub = df.groupBy(bucket_col).agg(F.sum(value).alias("_bucket_sum"))
    spine = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = sub.select(
        bucket_col,
        F.coalesce(F.sum("_bucket_sum").over(spine), zero).alias("_carry"),
    )
    within = Window.partitionBy(bucket_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.join(F.broadcast(carry), bucket_col)
        .withColumn(out_col, F.col("_carry") + F.sum(value).over(within))
        .drop("_carry")
    )
