"""Vector math as Catalyst column expressions — no Python UDFs.

``array<float>`` embeddings are combined with ``F.zip_with`` /
``F.aggregate`` so the whole computation stays inside whole-stage
codegen on the JVM. All arithmetic is done in DOUBLE after an explicit
element cast: summation is sequential in array order, which makes the
result deterministic and bit-identical to any other engine that sums
the same doubles left-to-right (the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two float/double arrays."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def scale_by(a: Column, divisor: Column) -> Column:
    """Divide every element by ``divisor``.

    PERFORMANCE CONTRACT: ``divisor`` must be a cheap expression or a
    materialized column reference — anything referenced inside the
    lambda is re-evaluated per array element. Unit-normalizing is
    therefore two projections:

        df.withColumn("n", l2_norm(F.col("v")))
          .withColumn("unit", scale_by(F.col("v"), F.col("n")))

    (an inline ``scale_by(v, l2_norm(v))`` would recompute the norm per
    element — O(d^2) per vector).
    """
    return F.transform(_as_double(a), lambda x: x / divisor)
