"""Skew-mitigation utilities for 100 TB-scale joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit tools cover the cases AQE can't: a broadcast-
ineligible dimension joined on a pathologically hot key, and
high-cardinality aggregation where single-key partitions overflow.

Both are pure DataFrame rewrites — deterministic (salt comes from
hashing stable columns, never rand()), and semantically identical to
the unsalted forms (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_from(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of identifying columns.

    Using xxhash64 of stable columns (not rand()) keeps retries and
    speculative tasks consistent — a re-executed task lands rows in the
    same salt bucket.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_exprs: dict[str, tuple[str, str]],
    salt_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation through a salt: groupBy(keys+salt) partial,
    then groupBy(keys) merge — caps any single reducer at ~1/buckets of
    the hottest key.

    ``agg_exprs`` maps output column -> (function, input column) where
    function is one of sum/count/min/max (the decomposable aggregates;
    avg = sum+count at the call site).
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn, _ in agg_exprs.values():
        if fn not in partial_fns:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salted = df.withColumn(SALT_COL, _salt_from(salt_cols, buckets))
    partial = salted.groupBy(*group_cols, SALT_COL).agg(
        *[partial_fns[fn](col).alias(out) for out, (fn, col) in agg_exprs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merge_fns[fn](out).alias(out) for out, (fn, _) in agg_exprs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: the skewed side gets a
    deterministic salt, the other side is replicated ``buckets`` times
    (explode), and the join key becomes (key, salt) — spreading each hot
    key over ``buckets`` reducers at the cost of replicating the small
    side.

    Only the join *distribution* changes; the result multiset is
    identical to the plain join.
    """
    salt_cols = list(salt_cols or [c for c in skewed.columns if c != on])
    if not salt_cols:
        raise ValueError("need at least one non-key column to derive the salt")
    s = skewed.withColumn(SALT_COL, _salt_from(salt_cols, buckets))
    o = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = s.join(o, [on, SALT_COL], how)
    return joined.drop(SALT_COL)
