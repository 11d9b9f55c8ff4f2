"""Wave-188 (round 5): Smith's rule, audited on data.

``sched_smith_rule_wspt`` — the single-machine scheduling theorem
(WSPT minimizes the weighted sum of completion times) as a measured
fact: orders are jobs (processing time = line count, weight = the
priority ladder), and the objective sum(w_j * C_j) is evaluated
EXACTLY under three disciplines — Smith's weight/processing ratio,
shortest-processing-time, and FIFO arrival — each via the two-level
distributed running total over that discipline's order. WSPT's
objective is provably minimal; the emitted permille ratios measure
how much FIFO actually costs on this workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

_W_MAP = (
    "CASE o_orderpriority WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4"
    " WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 2"
    " ELSE 1 END"
)


@query(
    "sched_smith_rule_wspt",
    oracle=f"""
        WITH jobs AS MATERIALIZED (
            SELECT o.o_orderkey AS k, o.o_orderdate AS d,
                   CAST({_W_MAP.replace("o_orderpriority",
                                        "o.o_orderpriority")}
                        AS BIGINT) AS w,
                   CAST(COUNT(*) AS BIGINT) AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ), wspt AS (
            SELECT CAST(SUM(w * c) AS HUGEINT) AS obj FROM (
                SELECT w, CAST(SUM(p) OVER (ORDER BY
                    (w * 1000 // p) DESC, k ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS c
                FROM jobs)
        ), spt AS (
            SELECT CAST(SUM(w * c) AS HUGEINT) AS obj FROM (
                SELECT w, CAST(SUM(p) OVER (ORDER BY p, k ROWS
                    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS c
                FROM jobs)
        ), fifo AS (
            SELECT CAST(SUM(w * c) AS HUGEINT) AS obj FROM (
                SELECT w, CAST(SUM(p) OVER (ORDER BY d, k ROWS
                    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS c
                FROM jobs)
        )
        SELECT CAST(w.obj AS VARCHAR) AS wspt_obj,
               CAST(s.obj AS VARCHAR) AS spt_obj,
               CAST(f.obj AS VARCHAR) AS fifo_obj,
               CAST(s.obj * 1000 // w.obj AS BIGINT)
                   AS spt_vs_wspt_permille,
               CAST(f.obj * 1000 // w.obj AS BIGINT)
                   AS fifo_vs_wspt_permille,
               s.obj >= w.obj AND f.obj >= w.obj AS smith_rule_holds
        FROM wspt w CROSS JOIN spt s CROSS JOIN fifo f
    """,
    description="Smith's rule, audited: with orders as jobs "
    "(processing = line count, weight = the 5..1 priority ladder), "
    "the weighted completion-time objective sum(w*C) is evaluated "
    "exactly under WSPT (weight/processing ratio order — provably "
    "optimal), SPT, and FIFO. Each discipline's completion times "
    "come from the two-level distributed running total over that "
    "order (the ratio key has a bounded value domain, so its carry "
    "spine is tiny; FIFO buckets by month) — never a global sort of "
    "job rows. The permille ratios price FIFO's regret on THIS "
    "workload, and smith_rule_holds is the theorem as a boolean. "
    "100 TB shape: one orderkey-local join to job grain, three "
    "bounded-spine running totals, three 1-row objectives — the "
    "queue-discipline business case in one query.",
)
def sched_smith_rule_wspt(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    jobs = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.expr(f"CAST({_W_MAP} AS BIGINT)").alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("p"))
        .localCheckpoint(eager=False)  # three discipline lanes
    )

    def objective(df, bucket_expr, order_cols):
        run = distributed_running_total(
            df.withColumn("bk", F.expr(bucket_expr)),
            F.col("p"),
            "bk",
            order_cols,
            out_col="c",
            zero=F.lit(0).cast("bigint"),
        )
        return run.agg(
            F.expr(
                "CAST(SUM(CAST(w AS DECIMAL(38,0)) * c)"
                " AS DECIMAL(38,0))"
            ).alias("obj")
        )

    wspt = objective(
        jobs.withColumn("r", F.expr("-(w * 1000 div p)")),
        "r",
        ["r", "k"],
    ).selectExpr("obj AS wobj")
    spt = objective(jobs, "p", ["p", "k"]).selectExpr("obj AS sobj")
    fifo = objective(
        jobs, "year(d) * 100 + month(d)", ["d", "k"]
    ).selectExpr("obj AS fobj")
    return (
        wspt.crossJoin(F.broadcast(spt))
        .crossJoin(F.broadcast(fifo))
        .selectExpr(
            "CAST(wobj AS STRING) AS wspt_obj",
            "CAST(sobj AS STRING) AS spt_obj",
            "CAST(fobj AS STRING) AS fifo_obj",
            "CAST(sobj * 1000 div wobj AS BIGINT)"
            " AS spt_vs_wspt_permille",
            "CAST(fobj * 1000 div wobj AS BIGINT)"
            " AS fifo_vs_wspt_permille",
            "sobj >= wobj AND fobj >= wobj AS smith_rule_holds",
        )
    )
