"""Wave-196 (round 5): drawdown analytics on the revenue index.

``finance_max_drawdown_underwater`` — the risk metrics every fund
report leads with, computed exactly on a mean-centered cumulative
revenue index (daily revenue minus the all-days mean, cumulated — a
wandering series by construction): maximum drawdown (running peak
minus current value, maximized), the longest underwater spell in
days, and the count of new highs. All prefix arithmetic rides the
bounded day spine; the only subtlety — the mean enters as an exact
rational, multiplied through so no division precedes the cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query


@query(
    "finance_max_drawdown_underwater",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(rev) AS BIGINT) AS s
            FROM daily
        ), idx AS (
            -- index scaled by n: I_d = n*cumrev_d - d_rank*s, so the
            -- mean never divides; drawdowns scale by the same n
            SELECT d,
                   CAST(t.n * SUM(rev) OVER w
                        - ROW_NUMBER() OVER w * t.s AS HUGEINT) AS i
            FROM daily CROSS JOIN tot t
            WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), dd AS (
            SELECT d, i,
                   MAX(i) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS peak
            FROM idx
        ), marked AS (
            SELECT d, i, peak, peak - i AS draw,
                   CASE WHEN i = peak THEN 1 ELSE 0 END AS is_high,
                   SUM(CASE WHEN i = peak THEN 1 ELSE 0 END)
                       OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS spell
            FROM dd
        ), spells AS (
            SELECT spell, CAST(COUNT(*) AS BIGINT) AS len
            FROM marked WHERE is_high = 0 GROUP BY spell
        )
        SELECT CAST((SELECT MAX(draw) FROM marked)
                    // (SELECT n FROM tot) AS BIGINT)
                   AS max_drawdown_cents,
               (SELECT CAST(SUM(is_high) AS BIGINT) FROM marked)
                   AS n_new_highs,
               (SELECT CAST(COALESCE(MAX(len), 0) AS BIGINT)
                FROM spells) AS longest_underwater_days,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM marked)
                   AS n_days
    """,
    description="Max drawdown and underwater analysis on the mean-"
    "centered cumulative revenue index, exact: the index is scaled "
    "through by n (I_d = n*cumrev - rank*total) so the daily mean "
    "never divides anything before the cumulative pass, drawdown = "
    "running peak minus current (descaled by n only at the final "
    "output), new highs are peak touches, and underwater spells are "
    "gaps-and-islands on the running high count — longest spell in "
    "days emitted. All windows ride the bounded day spine. The "
    "risk triple (max DD, recovery time, high-water count) that "
    "fund reporting, SLO burn, and capacity planning all reuse — "
    "100 TB shape: one partial agg to days, bounded-spine windows, "
    "four scalars.",
)
def finance_max_drawdown_underwater(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)"
            " AS BIGINT)"
        ).alias("rev")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("d")
    idx = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.expr(
            "CAST(n AS DECIMAL(38,0))"
        ).alias("_nd"),
        (F.sum("rev").over(w)).alias("cumrev"),
        F.row_number().over(wr).alias("rk"),
        F.col("s"),
    ).selectExpr(
        "d",
        "n",
        "CAST(_nd * cumrev - CAST(rk AS DECIMAL(38,0)) * s"
        " AS DECIMAL(38,0)) AS i",
    )
    dd = idx.select(
        "d",
        "n",
        "i",
        F.max("i").over(w).alias("peak"),
    )
    marked = dd.select(
        "d",
        "n",
        (F.col("peak") - F.col("i")).alias("draw"),
        F.when(F.col("i") == F.col("peak"), 1).otherwise(0).alias(
            "is_high"
        ),
    ).withColumn(
        "spell",
        F.sum("is_high").over(w),
    ).localCheckpoint(eager=False)  # scalars + spell rollup
    spells = (
        marked.where(F.col("is_high") == 0)
        .groupBy("spell")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
        .agg(
            F.coalesce(F.max("len"), F.lit(0))
            .cast("long")
            .alias("longest_underwater_days")
        )
    )
    scalars = marked.agg(
        F.expr("CAST(MAX(draw) div MAX(n) AS BIGINT)").alias(
            "max_drawdown_cents"
        ),
        F.sum("is_high").cast("long").alias("n_new_highs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return scalars.crossJoin(F.broadcast(spells)).select(
        "max_drawdown_cents",
        "n_new_highs",
        "longest_underwater_days",
        "n_days",
    )
