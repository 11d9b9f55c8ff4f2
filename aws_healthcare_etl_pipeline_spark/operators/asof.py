"""As-of (nearest-earlier) join — an operator Spark lacks natively.

Implemented as the union + ``last(ignorenulls)`` window trick
(SURVEY.md §2.5): tag both sides, union on (key, time), sort within
each key, and carry the most recent right-side payload forward onto
left rows. One shuffle on the key + one per-key sort — the same
physical cost as a sort-merge join, fully JVM-side (no Pandas UDF),
so it scales like any other windowed op: partitioned by key, no
driver involvement, skew handled by AQE.

``pd.merge_asof`` via applyInPandas would express the same thing but
pays Arrow transfer on 100% of rows — kept out of the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` (direction="backward"; "forward" is the
    smallest ``right_time >= left_time``) within the same ``on`` key.

    Right rows with no match leave NULL payload columns (left join
    semantics). Equal timestamps match (inclusive bound).

    ``tolerance`` (an SQL interval string, e.g. ``"2 hours"``) bounds
    the match distance like ``pd.merge_asof(tolerance=...)``: a
    nearest-earlier (or -later) row further than the bound is treated
    as no match and the payload nulls out. Inclusive, and applied
    after the nearest match is chosen — never "the nearest row inside
    the window", which would differ from merge_asof.

    Tie contract: if several right rows share the SAME (key, time), the
    one carried forward is arbitrary (matching pandas merge_asof and
    DuckDB ASOF, which are likewise unspecified there). Deduplicate the
    right side on (key, time) first when that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    left_cols = [c for c in left.columns]
    right_payload = [c for c in right.columns if c not in (on, right_time)]
    out_names = {c: (c + suffix if c in left_cols else c) for c in right_payload}
    t = "__asof_t"

    l_tagged = left.withColumn(t, F.col(left_time)).withColumn(_SIDE, F.lit(1))
    for c in right_payload:
        l_tagged = l_tagged.withColumn(out_names[c], F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumnRenamed(right_time, t).withColumn(_SIDE, F.lit(0))
    for c in right_payload:
        r_tagged = r_tagged.withColumnRenamed(c, out_names[c])
    for c in left_cols:
        if c != on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    rt = "__asof_rt"
    l_tagged = l_tagged.withColumn(rt, F.lit(None).cast(right.schema[right_time].dataType))
    r_tagged = r_tagged.withColumn(rt, F.col(t))
    cols = (
        [on, t, _SIDE, rt]
        + [c for c in left_cols if c != on]
        + [out_names[c] for c in right_payload]
    )
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(t).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(t).desc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731

    filled = unioned.select(
        on,
        t,
        _SIDE,
        *[c for c in left_cols if c != on],
        fill(rt).alias(rt),
        *[fill(out_names[c]).alias(out_names[c]) for c in right_payload],
    )
    result = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        # inclusive distance bound on the CHOSEN match (merge_asof
        # semantics); the interval subtraction stays JVM-side. Applied
        # while the union-time copy is still in scope.
        if direction == "backward":
            in_bound = F.col(t) - F.col(rt) <= F.expr(f"INTERVAL {tolerance}")
        else:
            in_bound = F.col(rt) - F.col(t) <= F.expr(f"INTERVAL {tolerance}")
        for c in right_payload:
            result = result.withColumn(
                out_names[c], F.when(in_bound, F.col(out_names[c]))
            )
    # left rows keep their original ``left_time`` column; the union-key
    # copy ``t``, the side tag and the matched-time carrier are
    # internal and dropped here.
    return result.drop(_SIDE, t, rt).select(
        *left_cols, *[out_names[c] for c in right_payload]
    )
