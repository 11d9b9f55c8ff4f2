"""Wave-62 (round 5): FP&A revenue decomposition + SRE error budgets.

* ``finance_price_volume_mix`` — the price/volume bridge every FP&A
  team builds between two fiscal years: revenue change per brand is
  decomposed into a volume effect (base price x quantity change) and
  a price effect (price change x current quantity), in EXACT cents
  with floor-division rational prices and an explicit residual row so
  the bridge reconciles to the cent (the honest version — most BI
  tools silently smear the rounding).
* ``slo_error_budget_burn`` — SRE error-budget accounting over the
  event stream: per-day error rate, cumulative budget consumption
  against a 2% SLO, and the burn flag via integer cross-
  multiplication (50*cum_err > cum_total), never a float rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ price / volume / mix

_PVM_Y0, _PVM_Y1 = 1995, 1996


@query(
    "finance_price_volume_mix",
    oracle=f"""
        WITH yr AS (
            SELECT p.p_brand,
                   EXTRACT(year FROM l.l_shipdate) AS y,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE EXTRACT(year FROM l.l_shipdate)
                      IN ({_PVM_Y0}, {_PVM_Y1})
            GROUP BY 1, 2
        ), wide AS (
            SELECT a.p_brand,
                   a.qty AS q0, a.cents AS r0,
                   b.qty AS q1, b.cents AS r1
            FROM yr a JOIN yr b
              ON b.p_brand = a.p_brand AND a.y = {_PVM_Y0}
             AND b.y = {_PVM_Y1}
        )
        SELECT p_brand,
               r0 AS rev0_cents, r1 AS rev1_cents,
               CAST((r0 * (q1 - q0)) // q0 AS BIGINT) AS volume_effect,
               CAST(r1 - (r0 * q1) // q0 AS BIGINT) AS price_effect,
               CAST((r1 - r0)
                    - ((r0 * (q1 - q0)) // q0)
                    - (r1 - (r0 * q1) // q0) AS BIGINT) AS residual_cents
        FROM wide ORDER BY p_brand
    """,
    description="Price-volume bridge per brand between two fiscal "
    "years: revenue delta decomposed into volume effect "
    "floor(p0*(q1-q0)) and price effect r1 - floor(p0*q1), with the "
    "base price p0 = r0/q0 kept as a cross-multiplied rational "
    "(floor-division cents) and an EXPLICIT residual column so the "
    "bridge reconciles to the cent instead of smearing rounding — "
    "the honest FP&A waterfall. At 100 TB: one partial-agg shuffle "
    "on (brand, year) with the year filter pushed to the scan, a "
    "self-join on the ~brand-count aggregate (metadata-scale), zero "
    "windows.",
)
def finance_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = (
        line.filter(F.year("l_shipdate").isin(_PVM_Y0, _PVM_Y1))
        .join(F.broadcast(part), part["p_partkey"] == line["l_partkey"])
        .groupBy("p_brand", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    y0 = yr.filter(F.col("y") == _PVM_Y0).select(
        "p_brand", F.col("qty").alias("q0"), F.col("cents").alias("r0")
    )
    y1 = yr.filter(F.col("y") == _PVM_Y1).select(
        "p_brand", F.col("qty").alias("q1"), F.col("cents").alias("r1")
    )
    wide = y0.join(y1, "p_brand")
    return wide.select(
        "p_brand",
        F.col("r0").alias("rev0_cents"),
        F.col("r1").alias("rev1_cents"),
        F.expr("(r0 * (q1 - q0)) div q0").cast("long").alias("volume_effect"),
        F.expr("r1 - (r0 * q1) div q0").cast("long").alias("price_effect"),
        F.expr(
            "(r1 - r0) - ((r0 * (q1 - q0)) div q0) - (r1 - (r0 * q1) div q0)"
        )
        .cast("long")
        .alias("residual_cents"),
    ).orderBy("p_brand")


# ------------------------------------------------ SLO error-budget burn

# SLO: error rate <= 2% (1/50), integer cross-multiplied


@query(
    "slo_error_budget_burn",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
            FROM events GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               n_events, n_errors,
               CAST((n_errors * 1000) // n_events AS BIGINT)
                   AS error_rate_permille,
               CAST(SUM(n_errors) OVER (ORDER BY day) AS BIGINT)
                   AS cum_errors,
               CAST(SUM(n_events) OVER (ORDER BY day) AS BIGINT)
                   AS cum_events,
               (50 * SUM(n_errors) OVER (ORDER BY day))
                   > SUM(n_events) OVER (ORDER BY day) AS budget_exhausted
        FROM daily ORDER BY day
    """,
    description="SRE error-budget burn table against a 2% SLO: per-"
    "day error rate (integer permille), cumulative errors vs "
    "cumulative events, and budget exhaustion via the integer cross-"
    "multiplication 50*cum_err > cum_total — the on-call dashboard "
    "query, float-free. At 100 TB the only data-scale pass is the "
    "per-day conditional aggregation (one partial-agg shuffle); the "
    "cumulative windows run on the bounded observed-day spine (the "
    "repo's documented day-grain exception), so nothing global "
    "touches event-grain rows.",
)
def slo_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "n_errors",
        F.expr("(n_errors * 1000) div n_events")
        .cast("long")
        .alias("error_rate_permille"),
        F.sum("n_errors").over(w).cast("long").alias("cum_errors"),
        F.sum("n_events").over(w).cast("long").alias("cum_events"),
        (
            50 * F.sum("n_errors").over(w) > F.sum("n_events").over(w)
        ).alias("budget_exhausted"),
    ).orderBy("day")
