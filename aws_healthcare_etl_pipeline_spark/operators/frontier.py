"""2-D Pareto frontier (skyline) minimizing two columns, as window
minima over one sort — no pairwise dominance join.

A row survives iff no other row has x' <= x AND y' <= y with at least
one strict inequality: equivalently (a) every strictly-smaller-x row
has y' > y (RANGE-frame min over the x ordering), and (b) the row has
the minimum y among its own x value (per-x partition min). Duplicate
(x, y) points all survive — identical points don't dominate each
other. Comparisons only; no float arithmetic can perturb membership.

At scale: one range-partitioned sort on x; both windows share it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` on the (min ``x``, min ``y``) Pareto frontier."""
    smaller = Window.orderBy(x).rangeBetween(Window.unboundedPreceding, -1)
    same_x = Window.partitionBy(x)
    ranked = df.withColumn("_best_smaller", F.min(y).over(smaller)).withColumn(
        "_best_same", F.min(y).over(same_x)
    )
    return ranked.filter(
        (F.col("_best_smaller").isNull() | (F.col("_best_smaller") > F.col(y)))
        & (F.col("_best_same") == F.col(y))
    ).drop("_best_smaller", "_best_same")
