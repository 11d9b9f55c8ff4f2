"""Wave-173 (round 5): regression discontinuity + fiscal calendars.

* ``causal_rdd_quantity_cutoff`` — sharp regression discontinuity at
  the quantity-25 cutoff: each side of the window [15, 35] gets an
  EXACT least-squares line (the repo's integer OLS moment sums in
  DECIMAL(38)), the running variable is centered at the cutoff so
  the intercept IS the boundary estimate, and the jump aR - aL is
  evaluated by cross-multiplied rationals with ONE truncating div at
  the end. Headroom: the cross products stay under DECIMAL(38)
  through sf10-scale sides (~1e35); beyond that the sides would be
  pre-aggregated per quantity value (50 rows) first — which this
  plan already does, making the fact-scan cost one partial agg.

* ``time_fiscal_445_calendar`` — the 4-4-5 retail fiscal calendar as
  closed-form integer arithmetic from a Monday anchor (1995-01-30):
  week = days div 7, quarter = week div 13, period via the 4/4/5
  split of the 13-week quarter. Revenue rolls up by fiscal period
  with week-range sanity columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_RDD_LO, _RDD_CUT, _RDD_HI = 15, 25, 35


@query(
    "causal_rdd_quantity_cutoff",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(l_quantity AS BIGINT) - {_RDD_CUT} AS x,
                   CASE WHEN l_quantity >= {_RDD_CUT}
                        THEN 1 ELSE 0 END AS side,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS HUGEINT) AS y
            FROM lineitem
            WHERE l_quantity >= {_RDD_LO} AND l_quantity <= {_RDD_HI}
        ), moments AS (
            SELECT side,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
            FROM pts GROUP BY side
        ), fits AS (
            SELECT side,
                   CAST(n AS BIGINT) AS n,
                   sxx * sy - sx * sxy AS a_num,
                   n * sxx - sx * sx AS den,
                   n * sxy - sx * sy AS b_num
            FROM moments
        ), sides AS (
            SELECT MAX(CASE WHEN side = 0 THEN n END) AS n_l,
                   MAX(CASE WHEN side = 1 THEN n END) AS n_r,
                   MAX(CASE WHEN side = 0 THEN a_num END) AS anl,
                   MAX(CASE WHEN side = 1 THEN a_num END) AS anr,
                   MAX(CASE WHEN side = 0 THEN den END) AS dl,
                   MAX(CASE WHEN side = 1 THEN den END) AS dr,
                   MAX(CASE WHEN side = 0 THEN b_num END) AS bnl,
                   MAX(CASE WHEN side = 1 THEN b_num END) AS bnr
            FROM fits
        )
        SELECT n_l, n_r,
               CAST(anl // dl AS BIGINT) AS intercept_l_cents,
               CAST(anr // dr AS BIGINT) AS intercept_r_cents,
               CAST((anr * dl - anl * dr) // (dr * dl) AS BIGINT)
                   AS jump_cents,
               CAST(bnl * 1000 // dl AS BIGINT) AS slope_l_permille,
               CAST(bnr * 1000 // dr AS BIGINT) AS slope_r_permille
        FROM sides
    """,
    description="Sharp regression discontinuity at the quantity-25 "
    "cutoff on lineitem value: both sides of the [15,35] window get "
    "EXACT least-squares fits from integer moment sums (n, Sx, Sy, "
    "Sxx, Sxy in DECIMAL(38)/HUGEINT), the running variable is "
    "centered at the cutoff so each intercept IS the boundary "
    "estimate, and the jump aR - aL comes from cross-multiplied "
    "rationals ((anr*dl - anl*dr) div (dr*dl)) with one truncating "
    "div — no float regression anywhere. Cross products stay under "
    "1e38 through sf10-class sides; beyond that the same moments "
    "would be computed from the 21-row per-quantity pre-aggregate "
    "(the plan's partial agg already reduces the scan to that). 100 "
    "TB shape: one filtered scan (predicate reaches the scan), one "
    "2-group partial agg, bounded-row rational algebra — the "
    "causal-inference workhorse for any threshold-triggered policy.",
)
def causal_rdd_quantity_cutoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.where(
        (F.col("l_quantity") >= _RDD_LO)
        & (F.col("l_quantity") <= _RDD_HI)
    ).selectExpr(
        f"CAST(l_quantity AS BIGINT) - {_RDD_CUT} AS x",
        f"CASE WHEN l_quantity >= {_RDD_CUT} THEN 1 ELSE 0 END AS side",
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100"
        " AS DECIMAL(38,0)) AS y",
    )
    moments = pts.groupBy("side").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
    )
    fits = moments.selectExpr(
        "side",
        "CAST(n AS BIGINT) AS n",
        "sxx * sy - sx * sxy AS a_num",
        "n * sxx - sx * sx AS den",
        "n * sxy - sx * sy AS b_num",
    )
    sides = fits.agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).alias("n_l"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).alias("n_r"),
        F.max(F.when(F.col("side") == 0, F.col("a_num"))).alias("anl"),
        F.max(F.when(F.col("side") == 1, F.col("a_num"))).alias("anr"),
        F.max(F.when(F.col("side") == 0, F.col("den"))).alias("dl"),
        F.max(F.when(F.col("side") == 1, F.col("den"))).alias("dr"),
        F.max(F.when(F.col("side") == 0, F.col("b_num"))).alias("bnl"),
        F.max(F.when(F.col("side") == 1, F.col("b_num"))).alias("bnr"),
    )
    return sides.selectExpr(
        "n_l",
        "n_r",
        "CAST(anl div dl AS BIGINT) AS intercept_l_cents",
        "CAST(anr div dr AS BIGINT) AS intercept_r_cents",
        "CAST((anr * dl - anl * dr) div (dr * dl) AS BIGINT)"
        " AS jump_cents",
        "CAST(bnl * 1000 div dl AS BIGINT) AS slope_l_permille",
        "CAST(bnr * 1000 div dr AS BIGINT) AS slope_r_permille",
    )


_FY_ANCHOR = "1995-01-30"  # a Monday


@query(
    "time_fiscal_445_calendar",
    oracle=f"""
        WITH mapped AS (
            SELECT date_diff('day', DATE '{_FY_ANCHOR}', o_orderdate)
                       AS days,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
            WHERE o_orderdate >= DATE '{_FY_ANCHOR}'
        ), weeks AS (
            SELECT (days // 7) // 52 AS fy,
                   (days // 7) % 52 AS wiy,
                   cents
            FROM mapped
        ), periods AS (
            SELECT fy, wiy,
                   (wiy // 13) * 3
                   + CASE WHEN wiy % 13 < 4 THEN 1
                          WHEN wiy % 13 < 8 THEN 2
                          ELSE 3 END AS period,
                   cents
            FROM weeks
        )
        SELECT CAST(fy AS BIGINT) AS fiscal_year,
               CAST(period AS BIGINT) AS fiscal_period,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               CAST(MIN(wiy) AS BIGINT) AS min_week,
               CAST(MAX(wiy) AS BIGINT) AS max_week
        FROM periods
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="The 4-4-5 retail fiscal calendar as closed-form "
    "integer arithmetic: week = days-since-Monday-anchor div 7, "
    "fiscal year = week div 52, quarter = week-in-year div 13, and "
    "the period via the 4/4/5 split of each 13-week quarter — no "
    "calendar UDF, no locale dayofweek, identical day-diff "
    "arithmetic in both engines. Revenue and order counts roll up "
    "by (fiscal year, period) with min/max week sanity columns that "
    "make a mapping regression visible as a shifted range. 100 TB "
    "shape: pure per-row integer arithmetic folded into one map-"
    "side partial agg on the bounded (year, period) domain — the "
    "comparable-period reporting spine for every retail ledger.",
)
def time_fiscal_445_calendar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mapped = orders.where(
        F.col("o_orderdate") >= F.lit(_FY_ANCHOR).cast("date")
    ).selectExpr(
        f"datediff(o_orderdate, DATE '{_FY_ANCHOR}') AS days",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS cents",
    )
    periods = mapped.selectExpr(
        "(days div 7) div 52 AS fy",
        "(days div 7) % 52 AS wiy",
        "cents",
    ).selectExpr(
        "fy",
        "wiy",
        "(wiy div 13) * 3 + CASE WHEN wiy % 13 < 4 THEN 1"
        " WHEN wiy % 13 < 8 THEN 2 ELSE 3 END AS period",
        "cents",
    )
    return (
        periods.groupBy(
            F.col("fy").cast("long").alias("fiscal_year"),
            F.col("period").cast("long").alias("fiscal_period"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.min("wiy").cast("long").alias("min_week"),
            F.max("wiy").cast("long").alias("max_week"),
        )
        .orderBy("fiscal_year", "fiscal_period")
    )
