"""Wave-198 (round 5): month-arithmetic law.

``time_add_months_eom_battery`` — the end-of-month clamping law
that silently corrupts billing schedules: add_months(Jan 31, 1)
lands on Feb 28/29 in BOTH engines (Spark add_months, DuckDB
+ INTERVAL MONTH), and once clamped the day-of-month is lost
forever. The battery runs every end-of-month order date through
offsets {1, 12, 13} and emits the mapped dates — leap February is
in the fixture span, so the 29/28 cases are real rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_AM_OFFSETS = (1, 12, 13)


@query(
    "time_add_months_eom_battery",
    oracle=f"""
        WITH eom AS (
            SELECT DISTINCT o_orderdate AS d
            FROM orders
            WHERE o_orderdate = last_day(o_orderdate)
        ), mapped AS (
            {" UNION ALL ".join(
                f"SELECT d, {k} AS offset_months,"
                f" CAST(d + INTERVAL {k} MONTH AS DATE) AS r"
                f" FROM eom" for k in _AM_OFFSETS)}
        )
        SELECT strftime(d, '%Y-%m-%d') AS from_date,
               offset_months,
               strftime(r, '%Y-%m-%d') AS to_date,
               r = last_day(r) AS lands_on_eom
        FROM mapped
        ORDER BY from_date, offset_months
    """,
    description="End-of-month clamping, pinned: every end-of-month "
    "order date maps through add_months offsets {1, 12, 13} (Spark "
    "add_months == DuckDB + INTERVAL MONTH, both clamp to the "
    "target month's last valid day), with a lands_on_eom flag that "
    "shows where the clamp fired — the fixture span includes leap "
    "February, so the Jan-31 -> Feb-29 -> (+12) Feb-28 cases are "
    "real rows, and the non-associativity of month addition "
    "(clamping loses the original day-of-month) is visible in the "
    "data. 100 TB shape: the EOM panel is bounded by the calendar "
    "(~84 rows), the mapping is constant work — the billing-"
    "schedule law every subscription system must encode, tested "
    "not remembered.",
)
def time_add_months_eom_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    eom = (
        orders.where(
            F.col("o_orderdate") == F.expr("last_day(o_orderdate)")
        )
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
        .localCheckpoint(eager=False)  # one lane per offset
    )
    lanes = []
    for k in _AM_OFFSETS:
        lanes.append(
            eom.selectExpr(
                "d",
                f"{k} AS offset_months",
                f"add_months(d, {k}) AS r",
            )
        )
    mapped = lanes[0]
    for ln in lanes[1:]:
        mapped = mapped.unionAll(ln)
    return mapped.selectExpr(
        "date_format(d, 'yyyy-MM-dd') AS from_date",
        "offset_months",
        "date_format(r, 'yyyy-MM-dd') AS to_date",
        "r = last_day(r) AS lands_on_eom",
    ).orderBy("from_date", "offset_months")

