"""Wave-53 (round 5): change-point detection and business-calendar
arithmetic — two analytics staples done in exact integer domains.

* ``events_cusum_changepoint`` — CUSUM change-point per event type.
  The textbook statistic cusum_k = sum_{i<=k}(v_i - mean) needs the
  global mean (a division); scaling by n keeps it integer:
  n*prefix_k - k*S is n times the CUSUM, and argmax is invariant
  under positive scaling. Exact in both engines.
* ``time_business_day_sla`` — order->ship latency in BUSINESS days
  (Mon-Fri) via a closed-form weekday-count formula on epoch-day
  numbers, avoiding the classic cross-engine trap (Spark dayofweek is
  1=Sunday, DuckDB dayofweek is 0=Sunday, isodow differs again) and
  avoiding a calendar-dimension join entirely.

Portability per plans/registry.py: doubles only enter through the
established DECIMAL(15,2) cent quantization; everything downstream is
int64; day-grain windows run on the bounded calendar spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------------ CUSUM change-point


@query(
    "events_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(15,2))) * 100 AS BIGINT)
                       AS v_cents
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ), seq AS (
            SELECT event_type, day,
                   row_number() OVER w AS k,
                   SUM(v_cents) OVER w AS prefix,
                   COUNT(*) OVER (PARTITION BY event_type) AS n,
                   SUM(v_cents) OVER (PARTITION BY event_type) AS s
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), cusum AS (
            SELECT event_type, day, n,
                   abs(n * prefix - k * s) AS abs_cusum
            FROM seq
        ), peak AS (
            SELECT event_type, MAX(abs_cusum) AS max_abs_cusum
            FROM cusum GROUP BY event_type
        )
        SELECT c.event_type,
               CAST(MIN(c.day) AS VARCHAR) AS cp_day,
               CAST(p.max_abs_cusum AS BIGINT) AS max_abs_cusum,
               CAST(MAX(c.n) AS BIGINT) AS n_days
        FROM cusum c JOIN peak p
          ON c.event_type = p.event_type AND c.abs_cusum = p.max_abs_cusum
        GROUP BY c.event_type, p.max_abs_cusum
        ORDER BY c.event_type
    """,
    description="CUSUM change-point per event type: the day where the "
    "cumulative deviation from the series mean peaks (earliest day on "
    "ties). Stays exact by scaling: n*prefix_k - k*S is n x the "
    "textbook CUSUM and shares its argmax, so no mean division ever "
    "happens — pure int64 (bounded: days x total cents < 2^53 by "
    "fixture audit). The heavy event stream reduces through ONE "
    "partial-agg shuffle to the (type x day) grain; the ordered "
    "window runs on the bounded calendar spine (the scale-sanctioned "
    "place, SCALE.md) and the peak lookup is a broadcast-size "
    "self-join. At 100 TB this is the standard drift-detection sweep: "
    "day-grain first, O(days) window after — never an ordered window "
    "over raw events.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            dec("value").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg((F.sum("v") * 100).cast("bigint").alias("v_cents"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    cusum = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.abs(
            F.count(F.lit(1)).over(wall) * F.sum("v_cents").over(w)
            - F.row_number().over(wk) * F.sum("v_cents").over(wall)
        ).alias("abs_cusum"),
    )
    peak = (
        cusum.groupBy("event_type")
        .agg(F.max("abs_cusum").alias("max_abs_cusum"))
        .select(F.col("event_type").alias("et"), "max_abs_cusum")
    )
    return (
        cusum.join(
            F.broadcast(peak),
            (F.col("event_type") == F.col("et"))
            & (F.col("abs_cusum") == F.col("max_abs_cusum")),
        )
        .groupBy("event_type", "max_abs_cusum")
        .agg(
            F.min("day").cast("string").alias("cp_day"),
            F.max("n").cast("bigint").alias("n_days"),
        )
        .select(
            "event_type",
            "cp_day",
            F.col("max_abs_cusum").cast("bigint"),
            "n_days",
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ business-day SLA

# g(e) = weekdays (Mon-Fri) in [1970-01-01, 1970-01-01 + e days).
# 1970-01-01 is a Thursday, so the residual-day weekday pattern is
# [Thu,Fri,Sat,Sun,Mon,Tue,Wed] -> cumulative 0,1,2,2,2,3,4 =
# least(r,2) + greatest(r-4,0). Valid for e >= 0 (all fixture dates
# are post-epoch).
_G_SQL = "(({e}) // 7) * 5 + least(({e}) % 7, 2) + greatest(({e}) % 7 - 4, 0)"
_G_SPARK = "(({e}) div 7) * 5 + least(({e}) % 7, 2) + greatest(({e}) % 7 - 4, 0)"


@query(
    "time_business_day_sla",
    oracle=f"""
        WITH joined AS (
            SELECT o_orderpriority,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS e1,
                   date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)) AS e2
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), lat AS (
            SELECT o_orderpriority,
                   ({_G_SQL.format(e='e2')}) - ({_G_SQL.format(e='e1')})
                       AS bdays,
                   e2 - e1 AS caldays
            FROM joined
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(bdays) AS BIGINT) AS sum_bdays,
               CAST(MIN(bdays) AS BIGINT) AS min_bdays,
               CAST(MAX(bdays) AS BIGINT) AS max_bdays,
               CAST(SUM(caldays) AS BIGINT) AS sum_caldays
        FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="Order->ship SLA latency in business days (Mon-Fri) "
    "per order priority, via a closed-form weekday-count on epoch-day "
    "numbers: g(e) = (e div 7)*5 + least(e%7,2) + greatest(e%7-4,0) "
    "counts weekdays since the (Thursday) epoch, and g(e2)-g(e1) is "
    "signed so the fixture's out-of-order ship dates are handled. "
    "This sidesteps the dayofweek numbering trap (Spark 1=Sunday, "
    "DuckDB 0=Sunday, isodow 1=Monday) — no dow function appears at "
    "all — and replaces the calendar-dimension join a warehouse "
    "would use: at 100 TB the formula is a map-side expression inside "
    "whole-stage codegen, zero extra shuffles beyond the fact join "
    "(broadcast orders-side keys pruned to two columns) and the "
    "5-row final aggregate.",
)
def time_business_day_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    joined = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("e1"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("e2"),
    )
    lat = joined.select(
        "o_orderpriority",
        (
            F.expr(_G_SPARK.format(e="e2")) - F.expr(_G_SPARK.format(e="e1"))
        ).alias("bdays"),
        (F.col("e2") - F.col("e1")).alias("caldays"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("bdays").cast("bigint").alias("sum_bdays"),
            F.min("bdays").cast("bigint").alias("min_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
            F.sum("caldays").cast("bigint").alias("sum_caldays"),
        )
        .orderBy("o_orderpriority")
    )
