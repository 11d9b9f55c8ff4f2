"""Wave-190 (round 5): bullwhip amplification + erasure blast radius.

* ``supply_bullwhip_ratio`` — the bullwhip effect on this ledger:
  the SAME line quantities aggregated by order date (demand signal)
  vs by ship date (fulfillment signal), each daily series' squared
  coefficient of variation computed from exact integer moments, and
  the amplification ratio in permille. Batching and lead-time
  spread push the ship-side variance above the order-side variance
  — the supply-chain instability number, measured without a float.

* ``privacy_erasure_blast_radius`` — the GDPR right-to-erasure cost
  estimate: for a fixed-size customer panel, how many rows would a
  cascade delete touch (orders, then lineitems through the order
  keys)? Emitted as a blast-radius histogram plus totals — the
  compliance-capacity number a DPO asks for before signing an SLA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "supply_bullwhip_ratio",
    oracle="""
        WITH li AS MATERIALIZED (
            SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q,
                   CAST(l_shipdate AS DATE) AS sd
            FROM lineitem
        ), by_order_day AS (
            SELECT o.o_orderdate AS d,
                   CAST(SUM(li.q) AS BIGINT) AS x
            FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
            GROUP BY 1
        ), by_ship_day AS (
            SELECT sd AS d, CAST(SUM(q) AS BIGINT) AS x
            FROM li GROUP BY 1
        ), mo AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS s,
                   CAST(SUM(x * x) AS HUGEINT) AS s2
            FROM by_order_day
        ), ms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS s,
                   CAST(SUM(x * x) AS HUGEINT) AS s2
            FROM by_ship_day
        )
        SELECT mo.n AS n_order_days, ms.n AS n_ship_days,
               CAST((mo.n * mo.s2 - mo.s * mo.s) * 1000
                    // (mo.s * mo.s) AS BIGINT) AS cv2_order_permille,
               CAST((ms.n * ms.s2 - ms.s * ms.s) * 1000
                    // (ms.s * ms.s) AS BIGINT) AS cv2_ship_permille,
               CAST(((ms.n * ms.s2 - ms.s * ms.s) * mo.s * mo.s)
                    * 1000
                    // ((mo.n * mo.s2 - mo.s * mo.s) * ms.s * ms.s)
                    AS BIGINT) AS bullwhip_permille
        FROM mo CROSS JOIN ms
    """,
    description="The bullwhip effect, measured float-free: the SAME "
    "line quantities aggregate into a daily demand series (by order "
    "date) and a daily fulfillment series (by ship date); each "
    "series' CV^2 = (n*S2 - S^2)/S^2 comes from exact integer "
    "moments (HUGEINT/DECIMAL38), and the amplification ratio "
    "CV^2_ship / CV^2_order is a cross-multiplied rational "
    "quantized once to permille — > 1000 means fulfillment is "
    "noisier than demand (batching/lead-time spread), the classic "
    "supply-chain instability signature. 100 TB shape: two bounded "
    "day-spine partial aggs (one via the orderkey-local join), "
    "then scalar algebra — the echelon-variance audit at the cost "
    "of two scans.",
)
def supply_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lin = li.selectExpr(
        "l_orderkey",
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(l_shipdate AS DATE) AS sd",
    ).localCheckpoint(eager=False)  # two series from one scan
    by_order_day = (
        lin.join(
            orders.select("o_orderkey", "o_orderdate"),
            lin.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum("q").cast("long").alias("x"))
    )
    by_ship_day = lin.groupBy(F.col("sd").alias("d")).agg(
        F.sum("q").cast("long").alias("x")
    )

    def moments(df, p):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"n{p}"),
            F.sum("x").cast("decimal(38,0)").alias(f"s{p}"),
            F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias(
                f"s2{p}"
            ),
        )

    mo = moments(by_order_day, "o")
    ms = moments(by_ship_day, "s")
    return mo.crossJoin(F.broadcast(ms)).selectExpr(
        "no AS n_order_days",
        "ns AS n_ship_days",
        "CAST((no * s2o - so * so) * 1000 div (so * so) AS BIGINT)"
        " AS cv2_order_permille",
        "CAST((ns * s2s - ss * ss) * 1000 div (ss * ss) AS BIGINT)"
        " AS cv2_ship_permille",
        "CAST(((ns * s2s - ss * ss) * so * so) * 1000"
        " div ((no * s2o - so * so) * ss * ss) AS BIGINT)"
        " AS bullwhip_permille",
    )


_ERASE_PANEL = 200


@query(
    "privacy_erasure_blast_radius",
    oracle=f"""
        WITH pm AS (
            SELECT GREATEST(1, COUNT(*) // {_ERASE_PANEL}) AS m
            FROM customer
        ), panel AS (
            SELECT c_custkey AS ck FROM customer, pm
            WHERE c_custkey % pm.m = 0
        ), ords AS (
            SELECT p.ck, o.o_orderkey
            FROM panel p JOIN orders o ON o.o_custkey = p.ck
        ), radius AS (
            SELECT p.ck,
                   CAST(COUNT(DISTINCT od.o_orderkey) AS BIGINT)
                       AS n_orders,
                   CAST(COUNT(l.l_linenumber) AS BIGINT)
                       AS n_lineitems
            FROM panel p
            LEFT JOIN ords od ON od.ck = p.ck
            LEFT JOIN lineitem l ON l.l_orderkey = od.o_orderkey
            GROUP BY p.ck
        )
        SELECT CAST((n_orders + n_lineitems) // 10 AS BIGINT)
                   AS radius_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS orders_mass,
               CAST(SUM(n_lineitems) AS BIGINT) AS lineitem_mass
        FROM radius
        GROUP BY 1
        ORDER BY 1
    """,
    description="Right-to-erasure blast radius: for a fixed-size "
    "customer panel (mod = greatest(1, n div 200) — constant cost "
    "at any scale), the cascade row count a delete would touch "
    "(orders by custkey, lineitems through the order keys), "
    "histogrammed in 10-row buckets with total masses. The zero "
    "bucket (customers with no orders) and the long tail are "
    "exactly what a DPO needs before committing to an erasure SLA, "
    "and the same plan prices a backfill or consent-revocation "
    "sweep. 100 TB shape: panel joins fan out only from 200 keys "
    "(broadcastable), the lineitem cascade is an orderkey equi-"
    "join, and the histogram output is bounded.",
)
def privacy_erasure_blast_radius(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pm = customer.agg(
        F.expr(f"GREATEST(1, COUNT(*) div {_ERASE_PANEL})").alias("m")
    )
    panel = (
        customer.crossJoin(F.broadcast(pm))
        .where(F.expr("c_custkey % m = 0"))
        .select(F.col("c_custkey").alias("ck"))
        .localCheckpoint(eager=False)  # root of the cascade joins
    )
    ords = orders.join(
        F.broadcast(panel), orders.o_custkey == F.col("ck")
    ).select("ck", "o_orderkey")
    radius = (
        panel.join(ords.withColumnRenamed("ck", "ck2"),
                   F.col("ck2") == F.col("ck"), "left")
        .join(li, li.l_orderkey == F.col("o_orderkey"), "left")
        .groupBy("ck")
        .agg(
            F.countDistinct("o_orderkey")
            .cast("long")
            .alias("n_orders"),
            F.count("l_linenumber").cast("long").alias("n_lineitems"),
        )
    )
    return (
        radius.groupBy(
            F.expr(
                "CAST((n_orders + n_lineitems) div 10 AS BIGINT)"
            ).alias("radius_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("orders_mass"),
            F.sum("n_lineitems").cast("long").alias("lineitem_mass"),
        )
        .orderBy("radius_bucket")
    )
