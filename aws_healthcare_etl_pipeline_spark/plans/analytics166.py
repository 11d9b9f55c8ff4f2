"""Wave-192 (round 5): hierarchical cost allocation + design effect.

* ``finance_stepdown_allocation`` — two-level step-down allocation:
  a fixed cost pool (10% of total revenue) allocates to market
  segments by revenue share, then each segment's grant allocates to
  its orders by order value — BOTH levels via the shared largest-
  remainder operator, so conservation holds to the cent at every
  level and the query emits the proof flags alongside per-segment
  min/max per-order grants.

* ``experiment_icc_design_effect`` — the cluster-randomization
  planning pair: intraclass correlation of order values within
  customers (one-way ANOVA mean squares from exact integer scatter
  identities, per-cluster quantization documented) and the design
  effect 1 + (m_bar - 1) * ICC that inflates every sample-size
  calculation when you randomize customers but measure orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.money import allocate_largest_remainder
from ..sources.tables import load_table
from .registry import query


@query(
    "finance_stepdown_allocation",
    oracle="""
        WITH base AS MATERIALIZED (
            SELECT o.o_orderkey AS k, c.c_mktsegment AS seg,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), pool AS (
            SELECT CAST(SUM(v) // 10 AS BIGINT) AS amt FROM base
        ), seg_w0 AS (
            SELECT seg, CAST(SUM(v) AS BIGINT) AS wraw,
                   SUM(SUM(v)) OVER () AS traw
            FROM base GROUP BY seg
        ), seg_w AS (
            SELECT seg,
                   CAST(wraw // GREATEST(1, traw // 100000)
                        AS BIGINT) AS w,
                   SUM(CAST(wraw // GREATEST(1, traw // 100000)
                        AS BIGINT)) OVER () AS tw
            FROM seg_w0
        ), seg_alloc AS (
            SELECT seg, w,
                   (p.amt * w) // tw
                   + CASE WHEN ROW_NUMBER() OVER (ORDER BY
                       (p.amt * w) % tw DESC, seg)
                       <= p.amt - SUM((p.amt * w) // tw) OVER ()
                       THEN 1 ELSE 0 END AS grant
            FROM seg_w CROSS JOIN pool p
        ), scaled AS (
            SELECT seg, k, v // 4096 AS vs FROM base
        ), ord_alloc AS (
            SELECT b.seg, b.k,
                   (sa.grant * b.vs) // sw.sv
                   + CASE WHEN ROW_NUMBER() OVER (PARTITION BY b.seg
                       ORDER BY (sa.grant * b.vs) % sw.sv DESC, b.k)
                       <= sa.grant - SUM((sa.grant * b.vs) // sw.sv)
                          OVER (PARTITION BY b.seg)
                       THEN 1 ELSE 0 END AS cents
            FROM scaled b
            JOIN seg_alloc sa ON sa.seg = b.seg
            JOIN (SELECT seg, CAST(SUM(vs) AS BIGINT) AS sv
                  FROM scaled GROUP BY seg) sw ON sw.seg = b.seg
        )
        SELECT oa.seg,
               CAST(MAX(sa.grant) AS BIGINT) AS seg_grant_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(oa.cents) AS BIGINT) AS allocated_cents,
               SUM(oa.cents) = MAX(sa.grant) AS conserved,
               CAST(MIN(oa.cents) AS BIGINT) AS min_order_grant,
               CAST(MAX(oa.cents) AS BIGINT) AS max_order_grant
        FROM ord_alloc oa JOIN seg_alloc sa ON sa.seg = oa.seg
        GROUP BY oa.seg
        ORDER BY oa.seg
    """,
    description="Two-level step-down cost allocation, cent-exact: a "
    "pool of 10% of revenue allocates to segments by revenue share, "
    "then each segment's grant allocates to its orders by order "
    "value (weights share-quantized — segment weights to 1e5 units, "
    "order weights div 4096 — so every total*weight product stays in "
    "int64 at sf1000; both engines quantize identically) — both "
    "levels largest-remainder (the shared money "
    "operator on the Spark side; base = total*w div sum_w, leftover "
    "cents to the largest remainders with deterministic tie-breaks) "
    "— so SUM(order grants) = segment grant = its share of the pool "
    "exactly, and the conserved flag proves it per segment. 100 TB "
    "shape: level 1 is bounded-row arithmetic, level 2 is one "
    "segment-keyed shuffle with two segment-local windows — the "
    "overhead-absorption / show-back allocation every finance org "
    "runs monthly, with the audit built in.",
)
def finance_stepdown_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        customer.c_custkey == orders.o_custkey,
    ).selectExpr(
        "o_orderkey AS k",
        "c_mktsegment AS seg",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    ).localCheckpoint(eager=False)  # pool + weights + level 2
    pool = base.agg(
        F.expr("CAST(SUM(v) div 10 AS BIGINT)").alias("amt")
    )
    tw = base.agg(
        F.expr("GREATEST(1, SUM(v) div 100000)").alias("wscale")
    )
    seg_w = (
        base.groupBy("seg")
        .agg(F.sum("v").cast("long").alias("wraw"))
        .crossJoin(F.broadcast(tw))
        .selectExpr("seg", "CAST(wraw div wscale AS BIGINT) AS w")
        .crossJoin(F.broadcast(pool))
        .withColumn("grp", F.lit("all"))
    )
    seg_alloc = allocate_largest_remainder(
        seg_w,
        key="grp",
        weight="w",
        total="amt",
        tiebreak="seg",
        out="grant",
    ).select("seg", "grant")
    scaled = base.selectExpr("seg", "k", "v div 4096 AS vs")
    lvl2 = scaled.join(F.broadcast(seg_alloc), "seg")
    ord_alloc = allocate_largest_remainder(
        lvl2,
        key="seg",
        weight="vs",
        total="grant",
        tiebreak="k",
        out="cents",
    )
    return (
        ord_alloc.groupBy("seg")
        .agg(
            F.max("grant").cast("long").alias("seg_grant_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("allocated_cents"),
            (F.sum("cents") == F.max("grant")).alias("conserved"),
            F.min("cents").cast("long").alias("min_order_grant"),
            F.max("cents").cast("long").alias("max_order_grant"),
        )
        .orderBy("seg")
    )


@query(
    "experiment_icc_design_effect",
    oracle="""
        WITH y AS MATERIALIZED (
            SELECT o_custkey AS ck,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), per_c AS (
            SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(v) AS HUGEINT) AS s_i,
                   CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT)
                       AS s2_i
            FROM y GROUP BY ck
        ), within AS (
            SELECT CAST(SUM((n_i * s2_i - s_i * s_i) // n_i)
                       AS HUGEINT) AS wss,
                   CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS kk,
                   CAST(SUM(s_i) AS HUGEINT) AS s,
                   CAST(SUM(s2_i) AS HUGEINT) AS s2
            FROM per_c
        ), ms AS (
            SELECT n, kk,
                   ((n * s2 - s * s) // n - wss) // (kk - 1) AS msb,
                   wss // (n - kk) AS msw,
                   n // kk AS m_bar
            FROM within
        )
        SELECT n AS n_orders, kk AS n_clusters,
               CAST(m_bar AS BIGINT) AS mean_cluster_size,
               CAST((msb - msw) * 1000
                    // (msb + (m_bar - 1) * msw) AS BIGINT)
                   AS icc_permille,
               CAST(1000 + (m_bar - 1) * ((msb - msw) * 1000
                    // (msb + (m_bar - 1) * msw)) // 1 AS BIGINT)
                   AS design_effect_permille
        FROM ms
    """,
    description="The cluster-randomization planning pair: intraclass "
    "correlation of order values within customers from one-way "
    "ANOVA mean squares — every scatter is the exact integer "
    "identity (n*S2 - S^2) div n (per-cluster quantization "
    "documented, HUGEINT/DECIMAL38 throughout) — and the design "
    "effect 1 + (m_bar - 1)*ICC in permille, the factor that "
    "inflates sample-size math when you randomize CUSTOMERS but "
    "measure ORDERS. Positive ICC says orders within a customer "
    "correlate; DE says how many extra orders that costs the "
    "experiment. 100 TB shape: one customer-grain partial agg, one "
    "bounded rollup, scalar algebra — the power-analysis input for "
    "any B2B experiment platform.",
)
def experiment_icc_design_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y = orders.selectExpr(
        "o_custkey AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    )
    per_c = y.groupBy("ck").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("v").cast("decimal(38,0)").alias("s_i"),
        F.expr("SUM(CAST(v AS DECIMAL(38,0)) * v)").alias("s2_i"),
    )
    within = per_c.agg(
        F.expr(
            "CAST(SUM(CAST((n_i * s2_i - s_i * s_i) div n_i"
            " AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("wss"),
        F.sum("n_i").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum("s_i").cast("decimal(38,0)").alias("s"),
        F.sum("s2_i").cast("decimal(38,0)").alias("s2"),
    )
    ms = within.selectExpr(
        "n",
        "kk",
        "((n * s2 - s * s) div n - wss) div (kk - 1) AS msb",
        "wss div (n - kk) AS msw",
        "n div kk AS m_bar",
    )
    return ms.selectExpr(
        "n AS n_orders",
        "kk AS n_clusters",
        "CAST(m_bar AS BIGINT) AS mean_cluster_size",
        "CAST((msb - msw) * 1000 div (msb + (m_bar - 1) * msw)"
        " AS BIGINT) AS icc_permille",
        "CAST(1000 + (m_bar - 1) * ((msb - msw) * 1000"
        " div (msb + (m_bar - 1) * msw)) div 1 AS BIGINT)"
        " AS design_effect_permille",
    )
