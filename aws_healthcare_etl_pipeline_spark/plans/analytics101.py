"""Wave-127 (round 5): Kadane extremes via prefix decomposition +
ABC/XYZ inventory classification.

* ``timeseries_kadane_extremes`` — the maximum-sum window (best
  above-trend run) and maximum drawdown of the daily revenue
  series, WITHOUT the sequential Kadane scan: with deviations
  d_i = n*x_i - S (mean-centering scaled by n to stay integer),
  max-window(i) = P_i - min_{j<i} P_j and drawdown(i) =
  max_{j<=i} P_j - P_i are prefix-sum + running-extremum algebra
  on the bounded day spine — the classic dynamic program turned
  into window functions, deterministic argmax tie-breaks included.
* ``orders_abc_xyz_classification`` — the standard inventory
  segmentation matrix: ABC by cumulative revenue share (80/95
  permille cut points, integer cross-multiplied on the 25-row
  brand spine) crossed with XYZ by demand variability (CV^2
  classes via 4*(n*ss - s^2) <= s^2 and (n*ss - s^2) <= s^2 —
  no division, no sqrt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# --------------------------------------------- Kadane extremes


@query(
    "timeseries_kadane_extremes",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ), dev AS (
            SELECT day, CAST(d.x * t.n - t.s AS HUGEINT) AS d
            FROM daily d CROSS JOIN tot t
        ), pfx AS (
            SELECT day, d,
                   SUM(d) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS p
            FROM dev
        ), runs AS (
            SELECT day, p,
                   least(CAST(0 AS HUGEINT), COALESCE(MIN(p) OVER (
                       ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), CAST(0 AS HUGEINT))) AS pmin,
                   greatest(CAST(0 AS HUGEINT), COALESCE(MAX(p) OVER (
                       ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), CAST(0 AS HUGEINT))) AS pmax
            FROM pfx
        ), best AS (
            SELECT day AS end_day, p - pmin AS gain, pmax - p AS dd
            FROM runs
        ), pick AS (
            SELECT
              (SELECT strftime(end_day, '%Y-%m-%d') FROM best
               ORDER BY gain DESC, end_day LIMIT 1) AS best_end_day,
              (SELECT CAST(MAX(gain) AS HUGEINT) FROM best) AS best_gain,
              (SELECT strftime(end_day, '%Y-%m-%d') FROM best
               ORDER BY dd DESC, end_day LIMIT 1) AS trough_day,
              (SELECT CAST(MAX(dd) AS HUGEINT) FROM best) AS max_dd
        )
        SELECT t.n AS n_days,
               p.best_end_day,
               CAST(p.best_gain // t.n AS BIGINT)
                   AS best_window_above_mean_cents,
               p.trough_day,
               CAST(p.max_dd // t.n AS BIGINT)
                   AS max_drawdown_below_mean_cents
        FROM pick p CROSS JOIN tot t
    """,
    description="Kadane's maximum-sum window and the maximum "
    "drawdown of daily revenue, solved WITHOUT the sequential "
    "scan: center each day by d_i = n*x_i - S (integer-scaled "
    "mean deviation), then best-window-ending-at-i is "
    "P_i - min(0, min_{j<i} P_j) and drawdown-at-i is "
    "max(0, max_{j<=i-1} P_j) - P_i — prefix sum plus running "
    "extrema on the BOUNDED day spine, the classic DP turned into "
    "window algebra (the repo's running-total/sweepline pattern; "
    "argmax tie-broken by earliest day). Final figures divide the "
    "n-scaled gains back to cents by exact truncating division. "
    "The business read: the strongest above-trend revenue run and "
    "the deepest below-trend slump, in one pass. 100 TB shape: one "
    "partial-agg shuffle to the day grain; everything after is "
    "spine algebra.",
)
def timeseries_kadane_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    d38 = "decimal(38,0)"
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.expr(f"CAST(x * n - s AS {d38})").alias("d"),
        "n",
    )
    # bounded day spine: ordered windows OK
    wcur = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    zero = F.lit(0).cast(d38)
    runs = (
        dev.select(
            "day", "n", F.sum("d").over(wcur).cast(d38).alias("p")
        )
        .select(
            "day",
            "n",
            "p",
            F.least(zero, F.coalesce(F.min("p").over(wprev), zero)).alias(
                "pmin"
            ),
            F.greatest(
                zero, F.coalesce(F.max("p").over(wprev), zero)
            ).alias("pmax"),
        )
        .select(
            "day",
            "n",
            (F.col("p") - F.col("pmin")).alias("gain"),
            (F.col("pmax") - F.col("p")).alias("dd"),
        )
        .localCheckpoint(eager=False)  # feeds both argmax picks
    )
    best_g = runs.orderBy(F.col("gain").desc(), "day").limit(1).select(
        F.date_format("day", "yyyy-MM-dd").alias("best_end_day"),
        F.col("gain").alias("best_gain"),
        "n",
    )
    best_d = runs.orderBy(F.col("dd").desc(), "day").limit(1).select(
        F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
        F.col("dd").alias("max_dd"),
    )
    return best_g.crossJoin(F.broadcast(best_d)).select(
        F.col("n").alias("n_days"),
        "best_end_day",
        F.expr("CAST(best_gain div n AS LONG)").alias(
            "best_window_above_mean_cents"
        ),
        "trough_day",
        F.expr("CAST(max_dd div n AS LONG)").alias(
            "max_drawdown_below_mean_cents"
        ),
    )


# ------------------------------------------ ABC/XYZ matrix


@query(
    "orders_abc_xyz_classification",
    oracle="""
        WITH rev AS (
            SELECT p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                            * 100) AS BIGINT) AS r
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        ), weekly AS (
            SELECT p.p_brand AS brand,
                   date_trunc('week', l.l_shipdate) AS wk,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2
        ), var AS (
            SELECT brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS s,
                   CAST(SUM(q * q) AS BIGINT) AS ss
            FROM weekly GROUP BY brand
        ), tot AS (
            SELECT CAST(SUM(r) AS BIGINT) AS rt FROM rev
        ), ranked AS (
            SELECT brand, r,
                   CAST(SUM(r) OVER (ORDER BY r DESC, brand
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_r
            FROM rev
        )
        SELECT rk.brand,
               rk.r AS revenue_cents,
               CAST(rk.r * 1000 // t.rt AS BIGINT) AS share_permille,
               CASE WHEN rk.cum_r * 1000 <= 800 * t.rt THEN 'A'
                    WHEN rk.cum_r * 1000 <= 950 * t.rt THEN 'B'
                    ELSE 'C' END AS abc,
               CAST((v.n * v.ss - v.s * v.s) * 1000
                    // (v.s * v.s) AS BIGINT) AS cv2_permille,
               CASE WHEN 4 * (v.n * v.ss - v.s * v.s) <= v.s * v.s
                         THEN 'X'
                    WHEN (v.n * v.ss - v.s * v.s) <= v.s * v.s THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM ranked rk JOIN var v ON v.brand = rk.brand
        CROSS JOIN tot t
        ORDER BY rk.brand
    """,
    description="ABC/XYZ inventory segmentation — the planner's "
    "9-cell matrix: ABC by cumulative revenue share with 80%/95% "
    "cut points, integer cross-multiplied (cum_r*1000 <= 800*R) "
    "over the bounded 25-brand spine (the only ordered window), "
    "and XYZ by weekly-demand variability where the CV^2 class "
    "tests 4*(n*ss - s^2) <= s^2 (CV <= 1/2) and "
    "(n*ss - s^2) <= s^2 (CV <= 1) need neither division nor "
    "sqrt. cv2_permille is emitted exactly for the audit trail. "
    "A-X items get tight replenishment, C-Z get periodic review — "
    "this query IS that policy table. 100 TB shape: two lineitem "
    "partial-agg shuffles (brand grain, brand x week grain), "
    "broadcast part dim, then 25-row algebra.",
)
def orders_abc_xyz_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = line.join(
        F.broadcast(part), part.p_partkey == line.l_partkey
    )
    rev = joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("r")
    )
    weekly = joined.groupBy(
        F.col("p_brand").alias("brand"),
        F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    var = weekly.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    tot = rev.agg(F.sum("r").cast("long").alias("rt"))
    # bounded 25-brand spine: ordered window OK
    w = Window.orderBy(F.col("r").desc(), "brand").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "brand", "r", F.sum("r").over(w).cast("long").alias("cum_r")
    )
    return (
        ranked.join(var, "brand")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand",
            F.col("r").alias("revenue_cents"),
            F.expr("CAST(r * 1000 div rt AS LONG)").alias(
                "share_permille"
            ),
            F.when(F.col("cum_r") * 1000 <= 800 * F.col("rt"), "A")
            .when(F.col("cum_r") * 1000 <= 950 * F.col("rt"), "B")
            .otherwise("C")
            .alias("abc"),
            F.expr(
                "CAST((n * ss - s * s) * 1000 div (s * s) AS LONG)"
            ).alias("cv2_permille"),
            F.when(
                4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                <= F.col("s") * F.col("s"),
                "X",
            )
            .when(
                (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                <= F.col("s") * F.col("s"),
                "Y",
            )
            .otherwise("Z")
            .alias("xyz"),
        )
        .orderBy("brand")
    )
