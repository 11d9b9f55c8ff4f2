"""Wave-204 (round 5): SLA credits + supplier scorecards.

* ``ops_sla_credit_calculation`` — the SLA clause as a query: hours
  whose error share exceeds 20% count as downtime, monthly uptime
  permille maps through the contract's credit ladder (99.9% -> 0,
  99% -> 10%, 95% -> 25%, else 50%), and the credit lands in cents
  against that month's revenue — the invoice adjustment computed
  from raw events and orders in one pass each.

* ``supplier_composite_scorecard`` — the vendor scorecard: per
  supplier, on-time rate (ship within 30 days), average delay days,
  and volume, min-max normalized to permille on the supplier table
  and combined 50/30/20 into a composite score with a deterministic
  rank — the quarterly-business-review artifact, exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_SLA_ERR_PM = 200  # hour is "down" if error share > 20%


@query(
    "ops_sla_credit_calculation",
    oracle=f"""
        WITH hours AS (
            SELECT EXTRACT(year FROM ts) * 100
                   + EXTRACT(month FROM ts) AS ym,
                   epoch_us(ts) // 3600000000 AS h,
                   CAST(SUM(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS errs,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), monthly AS (
            SELECT ym,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(SUM(CASE WHEN errs * 1000 > {_SLA_ERR_PM} * n
                        THEN 1 ELSE 0 END) AS BIGINT) AS down_hours
            FROM hours GROUP BY ym
        ), uptime AS (
            SELECT ym, n_hours, down_hours,
                   (n_hours - down_hours) * 1000 // n_hours
                       AS uptime_pm
            FROM monthly
        ), rev AS (
            SELECT EXTRACT(year FROM o_orderdate) * 100
                   + EXTRACT(month FROM o_orderdate) AS ym,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        )
        SELECT u.ym AS month, u.n_hours, u.down_hours, u.uptime_pm,
               CASE WHEN u.uptime_pm >= 999 THEN 0
                    WHEN u.uptime_pm >= 990 THEN 100
                    WHEN u.uptime_pm >= 950 THEN 250
                    ELSE 500 END AS credit_permille,
               CAST(COALESCE(r.cents, 0)
                    * CASE WHEN u.uptime_pm >= 999 THEN 0
                           WHEN u.uptime_pm >= 990 THEN 100
                           WHEN u.uptime_pm >= 950 THEN 250
                           ELSE 500 END // 1000 AS BIGINT)
                   AS credit_cents
        FROM uptime u LEFT JOIN rev r ON r.ym = u.ym
        ORDER BY month
    """,
    description="The SLA clause, executed: hours with error share > "
    "20% count as downtime (exact cross-multiplied share test, no "
    "division), monthly uptime permille maps through the contract "
    "ladder (>=99.9% -> 0, >=99% -> 10%, >=95% -> 25%, else 50% "
    "credit), and the credit lands in cents against that month's "
    "order revenue via a left join on the bounded month key. This "
    "is the invoice adjustment a platform team owes, computed from "
    "raw events — not from a dashboard screenshot. 100 TB shape: "
    "one (month, hour) partial agg, bounded month rollups, one "
    "bounded join; the events and orders tables are each scanned "
    "once.",
)
def ops_sla_credit_calculation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    hours = events.groupBy(
        F.expr("year(ts) * 100 + month(ts)").alias("ym"),
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    monthly = hours.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(
            F.when(
                F.expr(f"errs * 1000 > {_SLA_ERR_PM} * n"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("down_hours"),
    )
    uptime = monthly.selectExpr(
        "ym",
        "n_hours",
        "down_hours",
        "(n_hours - down_hours) * 1000 div n_hours AS uptime_pm",
    )
    rev = orders.groupBy(
        F.expr(
            "year(o_orderdate) * 100 + month(o_orderdate)"
        ).alias("ym2")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)"
            " AS BIGINT)"
        ).alias("cents")
    )
    ladder = (
        "CASE WHEN uptime_pm >= 999 THEN 0"
        " WHEN uptime_pm >= 990 THEN 100"
        " WHEN uptime_pm >= 950 THEN 250 ELSE 500 END"
    )
    return (
        uptime.join(rev, uptime.ym == rev.ym2, "left")
        .selectExpr(
            "ym AS month",
            "n_hours",
            "down_hours",
            "uptime_pm",
            f"{ladder} AS credit_permille",
            f"CAST(COALESCE(cents, 0) * ({ladder}) div 1000"
            f" AS BIGINT) AS credit_cents",
        )
        .orderBy("month")
    )


@query(
    "supplier_composite_scorecard",
    oracle="""
        WITH perf AS (
            SELECT l.l_suppkey AS sk,
                   CAST(COUNT(*) AS BIGINT) AS volume,
                   CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate,
                        l.l_shipdate) <= 30 THEN 1 ELSE 0 END)
                        * 1000 // COUNT(*) AS BIGINT) AS ontime_pm,
                   CAST(SUM(GREATEST(date_diff('day', o.o_orderdate,
                        l.l_shipdate), 0)) // COUNT(*) AS BIGINT)
                       AS avg_delay_days
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        ), spans AS (
            SELECT MIN(volume) AS vmin, MAX(volume) AS vmax,
                   MIN(avg_delay_days) AS dmin,
                   MAX(avg_delay_days) AS dmax
            FROM perf
        ), scored AS (
            SELECT p.sk, p.volume, p.ontime_pm, p.avg_delay_days,
                   (5 * p.ontime_pm
                    + 3 * (1000 - (p.avg_delay_days - s.dmin) * 1000
                           // GREATEST(s.dmax - s.dmin, 1))
                    + 2 * ((p.volume - s.vmin) * 1000
                           // GREATEST(s.vmax - s.vmin, 1))) // 10
                       AS composite_pm
            FROM perf p CROSS JOIN spans s
        )
        SELECT CAST(composite_pm // 50 AS BIGINT) AS score_band,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(MIN(composite_pm) AS BIGINT) AS min_score,
               CAST(MAX(composite_pm) AS BIGINT) AS max_score,
               CAST(SUM(volume) AS BIGINT) AS volume_mass
        FROM scored
        GROUP BY 1
        ORDER BY 1
    """,
    description="The vendor scorecard: per supplier, on-time rate "
    "(ship within 30 days, permille), average delay days (negative "
    "ship-before-order clamped to 0 — the fixture's unenforced date "
    "rule again handled explicitly), and volume, min-max normalized "
    "on the bounded supplier table and combined 50/30/20 into a "
    "composite permille; output banded so the result is a stable "
    "histogram rather than a supplier-count-sized list. All "
    "truncating integer normalizations, identical both engines. "
    "100 TB shape: one orderkey-local join + supplier-grain partial "
    "agg; normalization constants are one bounded agg broadcast "
    "back — the QBR artifact, exact.",
)
def supplier_composite_scorecard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    perf = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("volume"),
            F.expr(
                "CAST(SUM(CASE WHEN datediff(l_shipdate, o_orderdate)"
                " <= 30 THEN 1 ELSE 0 END) * 1000 div COUNT(*)"
                " AS BIGINT)"
            ).alias("ontime_pm"),
            F.expr(
                "CAST(SUM(GREATEST(datediff(l_shipdate, o_orderdate),"
                " 0)) div COUNT(*) AS BIGINT)"
            ).alias("avg_delay_days"),
        )
    )
    spans = perf.agg(
        F.min("volume").alias("vmin"),
        F.max("volume").alias("vmax"),
        F.min("avg_delay_days").alias("dmin"),
        F.max("avg_delay_days").alias("dmax"),
    )
    scored = perf.crossJoin(F.broadcast(spans)).selectExpr(
        "sk",
        "volume",
        "(5 * ontime_pm"
        " + 3 * (1000 - (avg_delay_days - dmin) * 1000"
        "        div GREATEST(dmax - dmin, 1))"
        " + 2 * ((volume - vmin) * 1000"
        "        div GREATEST(vmax - vmin, 1))) div 10"
        " AS composite_pm",
    )
    return (
        scored.groupBy(
            F.expr("CAST(composite_pm div 50 AS BIGINT)").alias(
                "score_band"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.min("composite_pm").cast("long").alias("min_score"),
            F.max("composite_pm").cast("long").alias("max_score"),
            F.sum("volume").cast("long").alias("volume_mass"),
        )
        .orderBy("score_band")
    )
