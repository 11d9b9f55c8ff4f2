"""Wave-61 (round 5): FIFO cost accounting + conformal forecast audit.

* ``inventory_fifo_lot_valuation`` — FIFO lot consumption WITHOUT a
  sequential scan: consuming T units against date-ordered lots is
  consumed(lot) = clamp(T - cum_before, 0, qty), a pure function of
  the exclusive prefix sum — the classic proof that FIFO matching is
  set-expressible (two cumsums + clamp), not inherently stateful like
  the capped-balance recurrence. Remaining value allocates the lot's
  exact cents pro-rata with floor division.
* ``forecast_conformal_interval_audit`` — split-conformal calibration
  of a 7-slot seasonal-naive forecaster on daily revenue: the
  conformal radius is the ceil(0.9*(n+1))-th smallest absolute
  residual on the calibration window (EXACT order statistic, integer
  cents), then empirical coverage on the held-out window as an
  integer permille. The modern distribution-free uncertainty metric,
  made hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ FIFO lot valuation

# consume 80% of each part's total received quantity, FIFO by shipdate


@query(
    "inventory_fifo_lot_valuation",
    oracle="""
        WITH lots AS (
            SELECT l_partkey AS pk,
                   CAST(l_quantity AS BIGINT) AS qty,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   l_shipdate, l_orderkey, l_linenumber
            FROM lineitem
        ), pre AS (
            SELECT pk, qty, cents,
                   COALESCE(SUM(qty) OVER (PARTITION BY pk
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before,
                   (SUM(qty) OVER (PARTITION BY pk) * 8) // 10 AS t
            FROM lots
        ), lot AS (
            SELECT pk, qty, cents,
                   LEAST(qty, GREATEST(CAST(0 AS BIGINT),
                                       t - cum_before)) AS consumed
            FROM pre
        ), parted AS (
            SELECT p.p_brand,
                   qty - consumed AS rem,
                   ((cents * (qty - consumed)) // qty) AS rem_cents
            FROM lot JOIN part p ON p.p_partkey = lot.pk
        )
        SELECT p_brand,
               CAST(SUM(CASE WHEN rem > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS open_lots,
               CAST(SUM(rem) AS BIGINT) AS remaining_qty,
               CAST(SUM(rem_cents) AS BIGINT) AS remaining_value_cents
        FROM parted GROUP BY p_brand ORDER BY p_brand
    """,
    description="FIFO inventory lot valuation, set-based: consuming "
    "80% of each part's received quantity against shipdate-ordered "
    "lots is computed as consumed = clamp(T - exclusive-prefix-qty, "
    "0, lot_qty) — FIFO matching reduced to ONE per-key prefix sum "
    "plus a clamp, the proof that this accounting op needs no "
    "sequential scan (contrast the genuinely non-linear capped "
    "balance). Remaining lot value allocates exact cents pro-rata "
    "with floor division. At 100 TB: windows are partitioned per "
    "part key (bounded lots per part), the brand rollup is one "
    "partial-agg shuffle, and the part dim is broadcast — no global "
    "ordering anywhere.",
)
def inventory_fifo_lot_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w_order = (
        Window.partitionBy("pk")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = line.select(
        "pk",
        "qty",
        "cents",
        F.coalesce(F.sum("qty").over(w_order), F.lit(0)).alias("cum_before"),
        F.expr("(sum(qty) over (partition by pk) * 8) div 10").alias("t"),
    )
    lot = pre.select(
        "pk",
        "qty",
        "cents",
        F.least(
            F.col("qty"),
            F.greatest(F.lit(0).cast("long"), F.col("t") - F.col("cum_before")),
        ).alias("consumed"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    parted = lot.join(
        F.broadcast(part), part["p_partkey"] == lot["pk"]
    ).select(
        "p_brand",
        (F.col("qty") - F.col("consumed")).alias("rem"),
        F.expr("(cents * (qty - consumed)) div qty").alias("rem_cents"),
    )
    return (
        parted.groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("rem") > 0, 1).otherwise(0))
            .cast("long")
            .alias("open_lots"),
            F.sum("rem").cast("long").alias("remaining_qty"),
            F.sum("rem_cents").cast("long").alias("remaining_value_cents"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------- conformal forecast interval audit

_CONF_LAG = 7  # seasonal-naive horizon, in observed-day slots
_CONF_SPLIT = "1997-01-01"  # calibration before, test on/after
# conformal level: radius = ceil(0.9 * (n_cal + 1))-th smallest residual


@query(
    "forecast_conformal_interval_audit",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), resid AS (
            SELECT day,
                   ABS(cents - lag(cents, {_CONF_LAG}) OVER (ORDER BY day))
                       AS r
            FROM daily
            QUALIFY lag(cents, {_CONF_LAG}) OVER (ORDER BY day) IS NOT NULL
        ), cal AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rk,
                   COUNT(*) OVER () AS n_cal
            FROM resid WHERE day < DATE '{_CONF_SPLIT}'
        ), qhat AS (
            SELECT r AS q, n_cal FROM cal
            WHERE rk = LEAST(n_cal, (9 * (n_cal + 1) + 9) // 10)
        ), test AS (
            SELECT COUNT(*) AS n_test,
                   SUM(CASE WHEN r <= (SELECT q FROM qhat)
                            THEN 1 ELSE 0 END) AS covered
            FROM resid WHERE day >= DATE '{_CONF_SPLIT}'
        )
        SELECT CAST(q.n_cal AS BIGINT) AS n_cal,
               CAST(t.n_test AS BIGINT) AS n_test,
               CAST(q.q AS BIGINT) AS qhat_cents,
               CAST((t.covered * 1000) // t.n_test AS BIGINT)
                   AS coverage_permille
        FROM qhat q, test t
    """,
    description="Split-conformal calibration of a 7-slot seasonal-"
    "naive forecaster over daily revenue: absolute residuals in exact "
    "cents, conformal radius = the ceil(9(n+1)/10)-th smallest "
    "calibration residual (an EXACT order statistic, no interpolated "
    "quantile), and held-out empirical coverage as integer permille — "
    "the distribution-free prediction-interval guarantee, hash-"
    "checkable. At 100 TB the only data-scale pass is the day rollup "
    "(one partial-agg shuffle); everything after runs on the bounded "
    "observed-day spine (~thousands of rows), where the unpartitioned "
    "lag/rank windows are bounded by construction — the repo's "
    "documented day-grain exception.",
)
def forecast_conformal_interval_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    w_day = Window.orderBy("day")
    resid = (
        daily.withColumn("prev", F.lag("cents", _CONF_LAG).over(w_day))
        .filter(F.col("prev").isNotNull())
        .select("day", F.abs(F.col("cents") - F.col("prev")).alias("r"))
    )
    cal = resid.filter(F.col("day") < F.lit(_CONF_SPLIT).cast("date"))
    ranked = cal.select(
        "r",
        F.row_number().over(Window.orderBy("r", "day")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cal"),
    )
    qhat = ranked.filter(
        F.col("rk")
        == F.expr("least(n_cal, (9 * (n_cal + 1) + 9) div 10)")
    ).select(F.col("r").alias("q"), "n_cal")
    test = (
        resid.filter(F.col("day") >= F.lit(_CONF_SPLIT).cast("date"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.max("n_cal").cast("long").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("q").cast("long").alias("qhat_cents"),
            F.sum(F.when(F.col("r") <= F.col("q"), 1).otherwise(0)).alias(
                "covered"
            ),
        )
    )
    return test.select(
        "n_cal",
        "n_test",
        "qhat_cents",
        F.expr("(covered * 1000) div n_test")
        .cast("long")
        .alias("coverage_permille"),
    )
