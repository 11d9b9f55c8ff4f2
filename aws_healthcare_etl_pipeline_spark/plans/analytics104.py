"""Wave-130 (round 5): join-order cost audit + value-tier migration.

* ``optimizer_join_order_cost_audit`` — the Selinger question
  ("which join order?") answered with receipts: for the 3-table
  chain lineitem-orders-customer, both orders' INTERMEDIATE sizes
  are estimated from base statistics only (|R||S| / max(ndv_R,
  ndv_S), exact integer division) and compared against the true
  intermediate counts; signed permille errors and the per-plan
  intermediate totals show why the optimizer should start from
  the orders-customer side. Completes the repo's optimizer lane
  (NDV correlation, fanout identity, zone maps, selectivity
  histograms).
* ``customer_value_tier_migration`` — the retention team's flow
  matrix: customers tiered by 1995 spend quartile (value-tied
  quartiles from cumulative histogram counts — no global sort;
  tier 0 = inactive) crossed with their 1996 tier, with row-share
  permille — the Sankey data behind every 'where did my best
  customers go' review.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

# ----------------------------------------- join-order audit


@query(
    "optimizer_join_order_cost_audit",
    oracle="""
        WITH stats AS (
            SELECT
              (SELECT COUNT(*) FROM lineitem) AS nl,
              (SELECT COUNT(*) FROM orders) AS no_,
              (SELECT COUNT(*) FROM customer) AS nc,
              (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS dl_ok,
              (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS do_ok,
              (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS do_ck,
              (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS dc_ck
        ), actuals AS (
            SELECT
              (SELECT COUNT(*) FROM lineitem l JOIN orders o
                 ON o.o_orderkey = l.l_orderkey) AS a_lo,
              (SELECT COUNT(*) FROM orders o JOIN customer c
                 ON c.c_custkey = o.o_custkey) AS a_oc,
              (SELECT COUNT(*) FROM lineitem l
                 JOIN orders o ON o.o_orderkey = l.l_orderkey
                 JOIN customer c ON c.c_custkey = o.o_custkey) AS a_loc
        ), rows_ AS (
            SELECT 'LO_then_C' AS plan, 1 AS step,
                   CAST(s.nl * s.no_ // greatest(s.dl_ok, s.do_ok)
                        AS BIGINT) AS est_rows,
                   CAST(a.a_lo AS BIGINT) AS actual_rows
            FROM stats s CROSS JOIN actuals a
            UNION ALL
            SELECT 'LO_then_C', 2,
                   CAST((s.nl * s.no_ // greatest(s.dl_ok, s.do_ok))
                        * s.nc // greatest(s.do_ck, s.dc_ck) AS BIGINT),
                   CAST(a.a_loc AS BIGINT)
            FROM stats s CROSS JOIN actuals a
            UNION ALL
            SELECT 'OC_then_L', 1,
                   CAST(s.no_ * s.nc // greatest(s.do_ck, s.dc_ck)
                        AS BIGINT),
                   CAST(a.a_oc AS BIGINT)
            FROM stats s CROSS JOIN actuals a
            UNION ALL
            SELECT 'OC_then_L', 2,
                   CAST((s.no_ * s.nc // greatest(s.do_ck, s.dc_ck))
                        * s.nl // greatest(s.do_ok, s.dl_ok) AS BIGINT),
                   CAST(a.a_loc AS BIGINT)
            FROM stats s CROSS JOIN actuals a
        )
        SELECT plan, CAST(step AS BIGINT) AS step, est_rows, actual_rows,
               CAST((est_rows - actual_rows) * 1000
                    // greatest(actual_rows, 1) AS BIGINT)
                   AS err_permille
        FROM rows_ ORDER BY plan, step
    """,
    description="Join-order cost audit with receipts — the Selinger "
    "estimator |R||S|/max(ndv_R(k), ndv_S(k)) applied to both "
    "orders of the lineitem-orders-customer chain, composed from "
    "BASE statistics only (as a bottom-up optimizer must), versus "
    "the true intermediate cardinalities, with signed permille "
    "errors: step-1 intermediates differ by ~4x between plans while "
    "the final result is identical, which is exactly the shuffle "
    "volume a wrong join order wastes at 100 TB. Completes the "
    "optimizer-audit lane (NDV correlation, join-fanout identity, "
    "zone-map skipping, selectivity histograms). All arithmetic is "
    "exact integer division; actuals are three FK-join counts that "
    "Catalyst executes as broadcast/shuffled hash joins.",
)
def optimizer_join_order_cost_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    stats = (
        line.agg(
            F.count(F.lit(1)).cast("long").alias("nl"),
            F.countDistinct("l_orderkey").cast("long").alias("dl_ok"),
        )
        .crossJoin(
            F.broadcast(
                orders.agg(
                    F.count(F.lit(1)).cast("long").alias("no_"),
                    F.countDistinct("o_orderkey")
                    .cast("long")
                    .alias("do_ok"),
                    F.countDistinct("o_custkey")
                    .cast("long")
                    .alias("do_ck"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                customer.agg(
                    F.count(F.lit(1)).cast("long").alias("nc"),
                    F.countDistinct("c_custkey")
                    .cast("long")
                    .alias("dc_ck"),
                )
            )
        )
    )
    lo = line.join(orders, orders.o_orderkey == line.l_orderkey)
    oc = orders.join(
        F.broadcast(customer), customer.c_custkey == orders.o_custkey
    )
    loc = lo.join(
        F.broadcast(customer), customer.c_custkey == F.col("o_custkey")
    )
    actuals = (
        lo.agg(F.count(F.lit(1)).cast("long").alias("a_lo"))
        .crossJoin(
            F.broadcast(
                oc.agg(F.count(F.lit(1)).cast("long").alias("a_oc"))
            )
        )
        .crossJoin(
            F.broadcast(
                loc.agg(F.count(F.lit(1)).cast("long").alias("a_loc"))
            )
        )
    )
    base = stats.crossJoin(F.broadcast(actuals)).localCheckpoint(
        eager=False
    )  # single row; unioned 4x
    rows = [
        (
            "LO_then_C",
            1,
            "nl * no_ div greatest(dl_ok, do_ok)",
            "a_lo",
        ),
        (
            "LO_then_C",
            2,
            "(nl * no_ div greatest(dl_ok, do_ok)) * nc"
            " div greatest(do_ck, dc_ck)",
            "a_loc",
        ),
        (
            "OC_then_L",
            1,
            "no_ * nc div greatest(do_ck, dc_ck)",
            "a_oc",
        ),
        (
            "OC_then_L",
            2,
            "(no_ * nc div greatest(do_ck, dc_ck)) * nl"
            " div greatest(do_ok, dl_ok)",
            "a_loc",
        ),
    ]
    out = None
    for plan, step, est, actual in rows:
        r = base.selectExpr(
            f"'{plan}' AS plan",
            f"CAST({step} AS LONG) AS step",
            f"CAST({est} AS LONG) AS est_rows",
            f"CAST({actual} AS LONG) AS actual_rows",
        )
        out = r if out is None else out.unionAll(r)
    return out.select(
        "plan",
        "step",
        "est_rows",
        "actual_rows",
        F.expr(
            "CAST((est_rows - actual_rows) * 1000"
            " div greatest(actual_rows, 1) AS LONG)"
        ).alias("err_permille"),
    ).orderBy("plan", "step")


# ------------------------------------- value-tier migration


@query(
    "customer_value_tier_migration",
    oracle="""
        WITH spend AS (
            SELECT c.c_custkey AS k,
                   CAST(COALESCE(SUM(CASE
                       WHEN EXTRACT(year FROM o.o_orderdate) = 1995
                       THEN CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                       END), 0) AS BIGINT) AS y95,
                   CAST(COALESCE(SUM(CASE
                       WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                       THEN CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                       END), 0) AS BIGINT) AS y96
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ), h95 AS (
            SELECT y95 AS v, CAST(COUNT(*) AS BIGINT) AS h
            FROM spend WHERE y95 > 0 GROUP BY 1
        ), c95 AS (
            SELECT v, CAST(SUM(h) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ci,
                   CAST(SUM(h) OVER () AS BIGINT) AS n
            FROM h95
        ), h96 AS (
            SELECT y96 AS v, CAST(COUNT(*) AS BIGINT) AS h
            FROM spend WHERE y96 > 0 GROUP BY 1
        ), c96 AS (
            SELECT v, CAST(SUM(h) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ci,
                   CAST(SUM(h) OVER () AS BIGINT) AS n
            FROM h96
        ), tiered AS (
            SELECT s.k,
                   CASE WHEN s.y95 = 0 THEN 0
                        ELSE ((a.ci - 1) * 4) // a.n + 1 END AS t95,
                   CASE WHEN s.y96 = 0 THEN 0
                        ELSE ((b.ci - 1) * 4) // b.n + 1 END AS t96
            FROM spend s
            LEFT JOIN c95 a ON a.v = s.y95 AND s.y95 > 0
            LEFT JOIN c96 b ON b.v = s.y96 AND s.y96 > 0
        ), matrix AS (
            SELECT t95, t96, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM tiered GROUP BY 1, 2
        )
        SELECT m.t95 AS tier_1995, m.t96 AS tier_1996, m.n_customers,
               CAST(m.n_customers * 1000 // SUM(m.n_customers)
                    OVER (PARTITION BY m.t95) AS BIGINT)
                   AS row_share_permille
        FROM matrix m
        ORDER BY tier_1995, tier_1996
    """,
    description="Customer value-tier migration matrix — the Sankey "
    "behind every retention review: customers tier into 1995 spend "
    "quartiles by value-tied cumulative histogram counts "
    "(((ci-1)*4) div n + 1 over the DISTINCT-spend histogram — no "
    "global sort, ties resolved identically in both engines; tier "
    "0 = inactive that year), the same independently for 1996, and "
    "the flow matrix counts plus row-share permille show exactly "
    "where each tier went — top-tier churn and inactive "
    "reactivation fall straight out of the rows. 100 TB shape: one "
    "customer-grain aggregate off the fact, two value-histogram "
    "shuffles, one matrix aggregate; the quartile assignment "
    "touches only distinct spend values.",
)
def customer_value_tier_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.col("o_totalprice").cast("decimal(15,2)") * 100
    spend = (
        customer.join(
            orders, orders.o_custkey == customer.c_custkey, "left"
        )
        .groupBy(customer.c_custkey.alias("k"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.year("o_orderdate") == 1995, cents)),
                F.lit(0),
            )
            .cast("long")
            .alias("y95"),
            F.coalesce(
                F.sum(F.when(F.year("o_orderdate") == 1996, cents)),
                F.lit(0),
            )
            .cast("long")
            .alias("y96"),
        )
        .localCheckpoint(eager=False)  # feeds both histograms + tiers
    )

    def tier_map(col: str):
        # value spine grows with customers: prefix via two-level carry,
        # NOT an unpartitioned window
        h = (
            spend.where(F.col(col) > 0)
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("h"))
        )
        cum = distributed_running_total(
            h.withColumn("vb", F.expr("v div 1048576")),
            F.col("h"),
            "vb",
            ["v"],
            out_col="ci",
            zero=F.lit(0).cast("bigint"),
        )
        n = h.agg(F.sum("h").cast("long").alias("n"))
        return (
            cum.crossJoin(F.broadcast(n))
            .select(
                "v", F.expr("((ci - 1) * 4) div n + 1").alias("tier")
            )
        )

    t95 = tier_map("y95").withColumnRenamed("v", "y95").withColumnRenamed(
        "tier", "t95v"
    )
    t96 = tier_map("y96").withColumnRenamed("v", "y96").withColumnRenamed(
        "tier", "t96v"
    )
    tiered = (
        spend.join(t95, "y95", "left")
        .join(t96, "y96", "left")
        .select(
            F.when(F.col("y95") == 0, 0)
            .otherwise(F.col("t95v"))
            .alias("t95"),
            F.when(F.col("y96") == 0, 0)
            .otherwise(F.col("t96v"))
            .alias("t96"),
        )
    )
    matrix = tiered.groupBy("t95", "t96").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return matrix.select(
        F.col("t95").alias("tier_1995"),
        F.col("t96").alias("tier_1996"),
        "n_customers",
        F.expr(
            "CAST(n_customers * 1000 div SUM(n_customers)"
            " OVER (PARTITION BY t95) AS LONG)"
        ).alias("row_share_permille"),
    ).orderBy("tier_1995", "tier_1996")
