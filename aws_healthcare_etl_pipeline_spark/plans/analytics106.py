"""Wave-132 (round 5): Spearman rank correlation + the NOT IN trap.

* ``stat_spearman_rank_correlation`` — the workhorse monotone-
  association statistic, missing link between the repo's Pearson
  and Kendall lanes: order value vs line-count ranks via the
  doubled-midrank histogram identity (NO global sort), Spearman's
  rho = 1 - 6*sum(d^2)/(n(n^2-1)) carried exactly in DECIMAL(38)/
  HUGEINT as rho_micro = (4A - 6B)*1e6 div (4A) with A = n(n^2-1)
  and B = sum of doubled-rank differences squared (midrank tie
  convention, no tie-correction factor — documented).
* ``sql_not_in_null_trap_battery`` — the most famous SQL semantics
  trap, demonstrated and pinned: the same 'customers who never
  placed a low-priority order' question via NOT IN (whose
  three-valued logic returns ZERO rows once the subquery contains
  one NULL), NOT EXISTS, and LEFT ANTI JOIN — three idioms, two
  answers, and both engines must agree on all three counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

# --------------------------------------------- Spearman rho


@query(
    "stat_spearman_rank_correlation",
    oracle="""
        WITH pairs AS (
            SELECT o.o_orderkey AS k,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS x,
                   CAST(COUNT(l.l_orderkey) AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ), hx AS (
            SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS h
            FROM pairs GROUP BY x
        ), cx AS (
            SELECT v, h,
                   CAST(COALESCE(SUM(h) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cb
            FROM hx
        ), hy AS (
            SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS h
            FROM pairs GROUP BY y
        ), cy AS (
            SELECT v, h,
                   CAST(COALESCE(SUM(h) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cb
            FROM hy
        ), ranked AS (
            SELECT p.k,
                   2 * a.cb + a.h + 1 AS r2x,
                   2 * b.cb + b.h + 1 AS r2y
            FROM pairs p
            JOIN cx a ON a.v = p.x
            JOIN cy b ON b.v = p.y
        ), mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(r2x - r2y AS HUGEINT)
                            * (r2x - r2y)) AS HUGEINT) AS b4
            FROM ranked
        )
        SELECT n,
               CAST(CAST(b4 AS DECIMAL(38,0)) AS VARCHAR) AS sum_d2_x4,
               CAST((4 * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT)
                          * n - 1)) - 6 * b4) * 1000000
                    // (4 * (CAST(n AS HUGEINT)
                             * (CAST(n AS HUGEINT) * n - 1)))
                    AS BIGINT) AS rho_micro
        FROM mom
    """,
    description="Spearman's rank correlation between order value and "
    "order width (line count) — the monotone-association workhorse "
    "between the repo's Pearson and Mann-Kendall lanes — with NO "
    "global sort: both variables rank via the doubled-midrank "
    "histogram identity 2R = 2*C(v-1) + h(v) + 1 (exact integers, "
    "midrank tie convention; the classical tie-correction factor is "
    "deliberately omitted and documented), and rho = 1 - "
    "6*sum(d^2)/(n(n^2-1)) is carried exactly as rho_micro = "
    "(4A - 6B)*1e6 div (4A) in HUGEINT/DECIMAL(38), with the raw "
    "B = sum((2dx-2dy)^2) emitted as VARCHAR (the >2^53 idiom). "
    "100 TB shape: one order-grain aggregate, two value-histogram "
    "shuffles with two-level-carry prefixes, two rank joins, one "
    "scalar combine.",
)
def stat_spearman_rank_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(line, line.l_orderkey == orders.o_orderkey)
        .groupBy(
            orders.o_orderkey.alias("k"),
            (F.col("o_totalprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("x"),
        )
        .agg(F.count("l_orderkey").cast("long").alias("y"))
        .localCheckpoint(eager=False)  # feeds both histograms + joins
    )

    def midranks(col: str, out: str):
        h = pairs.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("h")
        )
        cum = distributed_running_total(
            h.withColumn("vb", F.expr("v div 1048576")),
            F.col("h"),
            "vb",
            ["v"],
            out_col="ci",
            zero=F.lit(0).cast("bigint"),
        )
        return cum.select(
            F.col("v").alias(col),
            (2 * (F.col("ci") - F.col("h")) + F.col("h") + 1)
            .cast("long")
            .alias(out),
        )

    ranked = pairs.join(midranks("x", "r2x"), "x").join(
        midranks("y", "r2y"), "y"
    )
    d38 = "decimal(38,0)"
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"CAST(r2x - r2y AS {d38}) * (r2x - r2y)"))
        .cast(d38)
        .alias("b4"),
    )
    return mom.select(
        "n",
        F.col("b4").cast("string").alias("sum_d2_x4"),
        F.expr(
            f"""CAST((4 * (CAST(n AS {d38}) * (CAST(n AS {d38}) * n - 1))
                      - 6 * b4) * 1000000
                     div (4 * (CAST(n AS {d38})
                               * (CAST(n AS {d38}) * n - 1)))
                     AS LONG)"""
        ).alias("rho_micro"),
    )


# --------------------------------------------- NOT IN trap


@query(
    "sql_not_in_null_trap_battery",
    oracle="""
        WITH sub AS (
            SELECT CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                        ELSE o_custkey END AS ck
            FROM orders
        ), not_in AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
            WHERE c_custkey NOT IN (SELECT ck FROM sub)
        ), not_exists AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM sub s
                              WHERE s.ck = c.c_custkey)
        ), aj AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM customer c LEFT JOIN (SELECT DISTINCT ck FROM sub
                                       WHERE ck IS NOT NULL) s
              ON s.ck = c.c_custkey
            WHERE s.ck IS NULL
        )
        SELECT idiom, n,
               CASE WHEN n = 0 THEN 1 ELSE 0 END AS null_trap_hit
        FROM (
            SELECT 'not_in' AS idiom, n FROM not_in
            UNION ALL SELECT 'not_exists', n FROM not_exists
            UNION ALL SELECT 'left_anti', n FROM aj
        ) ORDER BY idiom
    """,
    description="The NOT IN null trap, demonstrated and pinned: the "
    "same question — customers absent from an order-key list that "
    "CONTAINS A NULL (low-priority orders map to NULL) — asked via "
    "NOT IN, NOT EXISTS, and LEFT ANTI JOIN. Three-valued logic "
    "makes x NOT IN (..., NULL) never TRUE, so the NOT IN count "
    "collapses to zero while the other two idioms agree on the "
    "real answer; both engines must reproduce all three counts "
    "exactly, which pins the subtlest corner of SQL's null "
    "semantics across the two optimizers (Spark rewrites NOT IN "
    "as null-aware anti join; DuckDB as a mark join — same "
    "REQUIRED result, very different plans). Every data team hits "
    "this once; this query is the regression test that it is "
    "handled identically at any scale.",
)
def sql_not_in_null_trap_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    orders.createOrReplaceTempView("w132_orders")
    customer.createOrReplaceTempView("w132_customer")
    return spark.sql(
        """
        WITH sub AS (
            SELECT CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                        ELSE o_custkey END AS ck
            FROM w132_orders
        ), not_in AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w132_customer
            WHERE c_custkey NOT IN (SELECT ck FROM sub)
        ), not_exists AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w132_customer c
            WHERE NOT EXISTS (SELECT 1 FROM sub s
                              WHERE s.ck = c.c_custkey)
        ), aj AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM w132_customer c LEFT JOIN (SELECT DISTINCT ck FROM sub
                                            WHERE ck IS NOT NULL) s
              ON s.ck = c.c_custkey
            WHERE s.ck IS NULL
        )
        SELECT idiom, n,
               CASE WHEN n = 0 THEN 1 ELSE 0 END AS null_trap_hit
        FROM (
            SELECT 'not_in' AS idiom, n FROM not_in
            UNION ALL SELECT 'not_exists', n FROM not_exists
            UNION ALL SELECT 'left_anti', n FROM aj
        ) ORDER BY idiom
        """
    )
