"""Wave-191 (round 5): aggregation-grain fallacy + frame defaults.

* ``stats_grain_fallacy_audit`` — ratio-of-sums vs average-of-ratios,
  the metric bug that ships to production most often: overall
  average order value computed at the ORDER grain vs the unweighted
  mean of per-customer averages, per segment and overall, with the
  gap in permille. Heavy customers pull the two apart; the query
  quantifies by how much on this ledger.

* ``sql_window_frame_default_trap`` — the ANSI default-frame trap:
  with an ORDER BY but no frame clause, aggregate windows default to
  RANGE UNBOUNDED PRECEDING..CURRENT ROW, so last_value() returns
  the CURRENT row's value (plus its peers), not the partition's
  last. The battery counts, on the fixed panel, how many rows the
  naive last_value diverges from the explicit full-frame one — both
  engines implement the same ANSI default, and the hash match pins
  it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "stats_grain_fallacy_audit",
    oracle="""
        WITH base AS MATERIALIZED (
            SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), scoped AS (
            SELECT seg AS scope, ck, v FROM base
            UNION ALL
            SELECT 'ALL', ck, v FROM base
        ), per_cust AS (
            SELECT scope, ck,
                   CAST(SUM(v) // COUNT(*) AS BIGINT) AS cust_avg,
                   CAST(SUM(v) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM scoped GROUP BY scope, ck
        )
        SELECT scope,
               CAST(SUM(s) // SUM(n) AS BIGINT)
                   AS ratio_of_sums_cents,
               CAST(SUM(cust_avg) // COUNT(*) AS BIGINT)
                   AS avg_of_ratios_cents,
               CAST((SUM(s) // SUM(n) - SUM(cust_avg) // COUNT(*))
                    * 1000 // (SUM(s) // SUM(n)) AS BIGINT)
                   AS gap_permille,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM per_cust
        GROUP BY scope
        ORDER BY scope
    """,
    description="The aggregation-grain fallacy, priced: overall "
    "average order value at the ORDER grain (ratio of sums) vs the "
    "unweighted mean of per-customer averages (average of ratios), "
    "per segment and overall, all truncated integer cents so both "
    "engines agree bit-for-bit. The permille gap is the size of the "
    "bug when a dashboard averages customer-level averages — heavy "
    "buyers are under-weighted exactly in proportion to this "
    "number. 100 TB shape: one fact-dim join, one (scope, customer) "
    "partial agg, one scope rollup; no windows. The metric-"
    "definition review that should precede every KPI launch.",
)
def stats_grain_fallacy_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        customer.c_custkey == orders.o_custkey,
    ).selectExpr(
        "c_mktsegment AS seg",
        "o_custkey AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    ).localCheckpoint(eager=False)  # two scopes
    scoped = base.withColumnRenamed("seg", "scope").unionAll(
        base.selectExpr("'ALL' AS scope", "ck", "v")
    )
    per_cust = scoped.groupBy("scope", "ck").agg(
        F.expr("CAST(SUM(v) div COUNT(*) AS BIGINT)").alias(
            "cust_avg"
        ),
        F.sum("v").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        per_cust.groupBy("scope")
        .agg(
            F.expr("CAST(SUM(s) div SUM(n) AS BIGINT)").alias(
                "ratio_of_sums_cents"
            ),
            F.expr("CAST(SUM(cust_avg) div COUNT(*) AS BIGINT)").alias(
                "avg_of_ratios_cents"
            ),
            F.expr(
                "CAST((SUM(s) div SUM(n) - SUM(cust_avg) div COUNT(*))"
                " * 1000 div (SUM(s) div SUM(n)) AS BIGINT)"
            ).alias("gap_permille"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
        )
        .orderBy("scope")
    )


_FT_PANEL = 400


@query(
    "sql_window_frame_default_trap",
    oracle=f"""
        WITH sized AS (
            SELECT c_custkey AS ck, c_nationkey AS nk,
                   CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS v,
                   GREATEST(1, (SELECT COUNT(*) FROM customer)
                               // {_FT_PANEL}) AS m
            FROM customer
        ), panel AS (
            SELECT ck, nk, v FROM sized WHERE ck % m = 0
        ), framed AS (
            SELECT ck, nk, v,
                   LAST_VALUE(v) OVER (PARTITION BY nk ORDER BY ck)
                       AS naive_last,
                   LAST_VALUE(v) OVER (PARTITION BY nk ORDER BY ck
                       ROWS BETWEEN UNBOUNDED PRECEDING AND
                       UNBOUNDED FOLLOWING) AS true_last,
                   FIRST_VALUE(v) OVER (PARTITION BY nk ORDER BY ck)
                       AS first_ok
            FROM panel
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN naive_last <> true_last
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS naive_last_wrong,
               CAST(SUM(CASE WHEN naive_last = v THEN 1 ELSE 0 END)
                   AS BIGINT) AS naive_equals_current,
               CAST(SUM(CASE WHEN first_ok <> v AND naive_last = v
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS trap_rows
        FROM framed
    """,
    description="The ANSI default-frame trap, pinned: with ORDER BY "
    "and no frame clause the window frame is RANGE UNBOUNDED "
    "PRECEDING..CURRENT ROW, so LAST_VALUE silently returns the "
    "CURRENT row (plus peers) instead of the partition's last — "
    "the battery counts, on the fixed panel (unique order key, so "
    "no peers), how many rows the naive form diverges from the "
    "explicit full frame (= all non-last rows) and confirms "
    "FIRST_VALUE is immune. Both engines implement the same ANSI "
    "default; the hash match is the proof, and the counts are the "
    "teaching artifact. 100 TB shape: panel windows only (constant "
    "size); the production fix — always write the frame — costs "
    "nothing once this query is in the test suite.",
)
def sql_window_frame_default_trap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    pm = cust.agg(
        F.expr(f"GREATEST(1, COUNT(*) div {_FT_PANEL})").alias("m")
    )
    panel = (
        cust.crossJoin(F.broadcast(pm))
        .where(F.expr("c_custkey % m = 0"))
        .selectExpr(
            "c_custkey AS ck",
            "c_nationkey AS nk",
            "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " AS v",
        )
    )
    wdef = Window.partitionBy("nk").orderBy("ck")
    wfull = (
        Window.partitionBy("nk")
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    framed = panel.select(
        "v",
        F.last("v").over(wdef).alias("naive_last"),
        F.last("v").over(wfull).alias("true_last"),
        F.first("v").over(wdef).alias("first_ok"),
    )
    return framed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("naive_last") != F.col("true_last"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("naive_last_wrong"),
        F.sum(
            F.when(F.col("naive_last") == F.col("v"), 1).otherwise(0)
        )
        .cast("long")
        .alias("naive_equals_current"),
        F.sum(
            F.when(
                (F.col("first_ok") != F.col("v"))
                & (F.col("naive_last") == F.col("v")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("trap_rows"),
    )
