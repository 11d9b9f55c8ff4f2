"""Exact integer allocation: distribute a per-group total across the
group's rows proportionally to integer weights, largest-remainder
(Hamilton) rounding.

All arithmetic is int64 (base = total*w div sum_w, leftover cents to
the largest division remainders), so allocations are engine- and
partitioning-exact and conservation (sum of allocations == total)
holds by construction. The distributed shape is two windows over one
group-key shuffle — no driver loop, no doubles anywhere.

Caller contract: ``total`` is constant within a group, weights are
non-negative with a positive group sum, and ``max(total) * max(w)``
fits in int64 (cents-scale money satisfies this by orders of
magnitude).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def allocate_largest_remainder(
    df: DataFrame,
    key: str,
    weight: str,
    total: str,
    tiebreak: str,
    out: str = "alloc",
) -> DataFrame:
    """Add ``out``: the int64 share of ``total`` for each row.

    Per group ``key``: base share ``total*w div sum(w)``; the leftover
    ``total - sum(base)`` units go one each to the rows with the
    largest division remainders (``tiebreak`` orders equal
    remainders deterministically).
    """
    grp = Window.partitionBy(key)
    prod: Column = F.col(total) * F.col(weight)
    with_base = (
        df.withColumn("_sum_w", F.sum(weight).over(grp))
        .withColumn("_base", F.expr(f"({total} * {weight}) div _sum_w"))
        .withColumn("_rem", prod % F.col("_sum_w"))
    )
    ranked = with_base.withColumn(
        "_rr",
        F.row_number().over(
            Window.partitionBy(key).orderBy(F.col("_rem").desc(), F.asc(tiebreak))
        ),
    ).withColumn("_leftover", F.col(total) - F.sum("_base").over(grp))
    return ranked.withColumn(
        out,
        F.col("_base") + F.when(F.col("_rr") <= F.col("_leftover"), 1).otherwise(0),
    ).drop("_sum_w", "_base", "_rem", "_rr", "_leftover")
