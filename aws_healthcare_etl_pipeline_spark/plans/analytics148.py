"""Wave-174 (round 5): graph reachability + financial rounding law.

* ``graph_two_hop_reach_panel`` — exact DISTINCT 2-hop neighborhood
  sizes (customer -> part -> customer) for a fixed-size source panel
  (the mod = greatest(1, n div TARGET) idiom): unlike the HITS path
  COUNTS, reach requires dedup of endpoints, which is why it rides a
  panel — the dedup set for every node at once is the one thing a
  100 TB graph cannot afford. Histogram output.

* ``finance_rounding_mode_battery`` — discounted revenue lands on
  hundredths of a cent (ext_cents x (100 - disc_pct) is EXACT), and
  the four textbook rounding modes (trunc, half-up, half-even/
  banker's, ceil) are implemented as pure integer formulas — no
  engine round() anywhere, so the comparison is engine-law-free.
  Emits per-mode totals, the exactly-half case count (where half-up
  and banker's provably differ), and the half-up-minus-banker's
  drift in cents — the invoicing bug class, quantified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_REACH_PANEL = 200


@query(
    "graph_two_hop_reach_panel",
    oracle=f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), pm AS (
            SELECT GREATEST(1, COUNT(DISTINCT c) // {_REACH_PANEL})
                       AS m
            FROM edges
        ), sources AS (
            SELECT DISTINCT c AS s FROM edges, pm WHERE c % pm.m = 0
        ), reach AS (
            SELECT s.s,
                   CAST(COUNT(DISTINCT e2.c) AS BIGINT) AS n_reach
            FROM sources s
            JOIN edges e1 ON e1.c = s.s
            JOIN edges e2 ON e2.p = e1.p AND e2.c <> s.s
            GROUP BY s.s
        )
        SELECT CAST(n_reach // 20 AS BIGINT) AS reach_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(MIN(n_reach) AS BIGINT) AS min_reach,
               CAST(MAX(n_reach) AS BIGINT) AS max_reach
        FROM reach
        GROUP BY 1
        ORDER BY 1
    """,
    description="Exact DISTINCT 2-hop neighborhood sizes (customer "
    "-> shared part -> other customer) for a fixed-size source panel "
    "(mod = greatest(1, n div 200), so panel cost is CONSTANT at any "
    "scale): where the HITS query counts paths by aggregation, reach "
    "needs endpoint DEDUP — the all-nodes version is the one thing a "
    "100 TB graph cannot afford, which is exactly why production "
    "reachability runs panels/samples. Two equi-joins fan out only "
    "from the 200 sources; COUNT(DISTINCT) dedups per source. "
    "Bucketed histogram output with extrema. 100 TB shape: edge "
    "dedup is one shuffle; the panel join touches a constant slice; "
    "the audience-overlap / blast-radius estimator for any "
    "co-purchase or co-access graph.",
)
def graph_two_hop_reach_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds panel mod + 2 hops
    )
    pm = edges.agg(
        F.expr(
            f"GREATEST(1, COUNT(DISTINCT c) div {_REACH_PANEL})"
        ).alias("m")
    )
    sources = (
        edges.crossJoin(F.broadcast(pm))
        .where(F.expr("c % m = 0"))
        .select(F.col("c").alias("s"))
        .distinct()
    )
    e1 = edges.select(F.col("c").alias("c1"), "p")
    hop1 = e1.join(
        F.broadcast(sources), F.col("c1") == F.col("s")
    ).select("s", "p")
    reach = (
        hop1.join(edges, "p")
        .where(F.col("c") != F.col("s"))
        .groupBy("s")
        .agg(F.countDistinct("c").cast("long").alias("n_reach"))
    )
    return (
        reach.groupBy(
            F.expr("CAST(n_reach div 20 AS BIGINT)").alias(
                "reach_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.min("n_reach").cast("long").alias("min_reach"),
            F.max("n_reach").cast("long").alias("max_reach"),
        )
        .orderBy("reach_bucket")
    )


@query(
    "finance_rounding_mode_battery",
    oracle="""
        WITH vals AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT)
                   * (100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100
                             AS BIGINT)) AS v
            FROM lineitem
        ), modes AS (
            SELECT v,
                   v // 100 AS r_trunc,
                   (v + 50) // 100 AS r_half_up,
                   CASE WHEN v % 100 > 50 THEN v // 100 + 1
                        WHEN v % 100 < 50 THEN v // 100
                        ELSE v // 100 + (v // 100) % 2 END
                       AS r_half_even,
                   (v + 99) // 100 AS r_ceil
            FROM vals
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN v % 100 = 50 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_exact_half,
               CAST(SUM(r_trunc) AS BIGINT) AS total_trunc_cents,
               CAST(SUM(r_half_up) AS BIGINT) AS total_half_up_cents,
               CAST(SUM(r_half_even) AS BIGINT)
                   AS total_half_even_cents,
               CAST(SUM(r_ceil) AS BIGINT) AS total_ceil_cents,
               CAST(SUM(r_half_up) - SUM(r_half_even) AS BIGINT)
                   AS half_up_vs_bankers_drift_cents
        FROM modes
    """,
    description="The invoicing rounding-law battery: discounted "
    "revenue ext_cents x (100 - disc_pct) is EXACT in hundredths of "
    "a cent, and all four textbook modes — trunc, half-up, half-even "
    "(banker's), ceil — are integer formulas ((v+50) div 100; the "
    "half-even tie branch adds the quotient's parity), with NO "
    "engine round() anywhere, so the result is free of either "
    "engine's rounding law. Emits per-mode ledger totals, the "
    "exactly-half population (the only rows where half-up and "
    "banker's can differ), and their accumulated drift in cents — "
    "the systematic upward bias auditors actually look for. 100 TB "
    "shape: per-row integer arithmetic folded into one map-side "
    "partial agg; positive-domain divisions throughout.",
)
def finance_rounding_mode_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " * (100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100"
        " AS BIGINT)) AS v"
    )
    modes = vals.selectExpr(
        "v",
        "v div 100 AS r_trunc",
        "(v + 50) div 100 AS r_half_up",
        "CASE WHEN v % 100 > 50 THEN v div 100 + 1"
        " WHEN v % 100 < 50 THEN v div 100"
        " ELSE v div 100 + (v div 100) % 2 END AS r_half_even",
        "(v + 99) div 100 AS r_ceil",
    )
    return modes.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.expr("v % 100 = 50"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_half"),
        F.sum("r_trunc").cast("long").alias("total_trunc_cents"),
        F.sum("r_half_up").cast("long").alias("total_half_up_cents"),
        F.sum("r_half_even")
        .cast("long")
        .alias("total_half_even_cents"),
        F.sum("r_ceil").cast("long").alias("total_ceil_cents"),
        (F.sum("r_half_up") - F.sum("r_half_even"))
        .cast("long")
        .alias("half_up_vs_bankers_drift_cents"),
    )
