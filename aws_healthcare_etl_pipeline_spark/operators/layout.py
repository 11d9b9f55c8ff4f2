"""Z-order (Morton) data layout for multi-dimensional file skipping.

Parquet data skipping is 1-D: a file is pruned when the filter column's
footer min/max excludes the predicate. Sorting by one column clusters
only that column; a 2-D box query then scans every file for the second
dimension. Interleaving the bits of both (quantized) dimensions into a
single Morton value and range-partitioning + sorting on it gives every
file a tight min/max envelope on BOTH columns — the standard lakehouse
Z-ORDER optimization (Delta/Iceberg expose the same idea as a table
maintenance command), built here from plain DataFrame expressions.

Everything stays JVM-side whole-stage-codegen: the interleave expands
to a fixed fan-in of shift/mask/OR expressions, no UDF. At 100 TB the
write is one repartitionByRange shuffle (range boundaries via Spark's
reservoir sampling) and the payoff is footer-level pruning on every
subsequent box query — scans touch O(files overlapping the box), not
O(all files).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def quantize(col: Column, lo: Column | float, hi: Column | float, bits: int = DEFAULT_BITS) -> Column:
    """Map a numeric column into [0, 2^bits) rank buckets by min/max
    scaling — monotonic, so range predicates survive quantization."""
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    span = hi_c.cast("double") - lo_c.cast("double")
    frac = (col.cast("double") - lo_c.cast("double")) / span
    scaled = F.floor(frac * F.lit((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled)).cast("long")


def morton_interleave(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two quantized longs:
    x occupies even bit positions, y odd — a fixed tree of
    shift/mask/OR expressions, fully codegen'd."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Z-value of
    (col_x, col_y): quantize both dims against their global min/max
    (one 1-row aggregate), range-partition on the Morton value so each
    output file owns a contiguous Z-range, and sort within partitions
    so row groups inherit the clustering too.

    Both columns must be numeric (derive epoch days/seconds from
    temporal columns first — the min/max bounds are used as floats).
    """
    bounds = df.agg(
        F.min(col_x).alias("x_lo"),
        F.max(col_x).alias("x_hi"),
        F.min(col_y).alias("y_lo"),
        F.max(col_y).alias("y_hi"),
    ).collect()[0]
    z = morton_interleave(
        quantize(F.col(col_x), float(bounds.x_lo), float(bounds.x_hi), bits),
        quantize(F.col(col_y), float(bounds.y_lo), float(bounds.y_hi), bits),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
