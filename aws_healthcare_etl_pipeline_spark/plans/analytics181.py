"""Wave-207 (round 5): the graph observability card.

``graph_health_card`` — the one-row structural summary a graph
platform publishes per snapshot: node counts on both sides of the
co-purchase bipartite graph, edge count and density (ppm of the
complete bipartite), degree extremes with the argmax keys
(deterministic tie-breaks), the friendship-paradox strictness gap,
and the edge-per-node load factors — every number exact, every
input one edge-dedup shuffle plus degree aggregates. The card is
what you alert on when an ingest bug doubles edges or drops a
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "graph_health_card",
    oracle="""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), cd AS MATERIALIZED (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY c
        ), pdg AS MATERIALIZED (
            SELECT p, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY p
        ), tops AS (
            SELECT (SELECT c FROM cd ORDER BY d DESC, c LIMIT 1)
                       AS top_customer,
                   (SELECT MAX(d) FROM cd) AS max_cust_degree,
                   (SELECT p FROM pdg ORDER BY d DESC, p LIMIT 1)
                       AS top_part,
                   (SELECT MAX(d) FROM pdg) AS max_part_degree
        ), mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nc,
                   CAST(SUM(d) AS HUGEINT) AS s1,
                   CAST(SUM(d * d) AS HUGEINT) AS s2
            FROM cd
        ), base AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges)
                       AS n_edges,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cd)
                       AS n_customers,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pdg)
                       AS n_parts
        )
        SELECT b.n_customers, b.n_parts, b.n_edges,
               CAST(CAST(b.n_edges AS HUGEINT) * 1000000
                    // (CAST(b.n_customers AS HUGEINT) * b.n_parts)
                   AS BIGINT) AS density_ppm,
               t.top_customer, t.max_cust_degree,
               t.top_part, t.max_part_degree,
               CAST(b.n_edges * 1000 // b.n_customers AS BIGINT)
                   AS edges_per_customer_permille,
               CAST((m.s2 * m.nc - m.s1 * m.s1) * 1000
                    // (m.s1 * m.s1) AS BIGINT)
                   AS paradox_gap_permille
        FROM base b CROSS JOIN tops t CROSS JOIN mom m
    """,
    description="The graph observability card, one exact row: node "
    "counts on both bipartite sides, edge count, density in ppm of "
    "the complete bipartite graph, degree extremes with argmax keys "
    "(deterministic key tie-breaks), edges-per-customer load, and "
    "the friendship-paradox strictness gap (S2*n - S1^2 over S1^2, "
    "the degree-variance signature). An ingest bug that doubles "
    "edges, drops a partition, or flattens a hub moves at least "
    "one of these numbers — which is the point: alert on the card, "
    "not on the raw table. 100 TB shape: one edge-dedup shuffle, "
    "two degree aggs, bounded scalars; the same card works per "
    "snapshot for time-series diffing.",
)
def graph_health_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)  # degrees + counts
    )
    cd = edges.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).localCheckpoint(eager=False)  # tops + moments + count
    pdg = edges.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).localCheckpoint(eager=False)
    wc = Window.orderBy(F.col("d").desc(), F.col("c"))
    top_c = (
        cd.withColumn("r", F.row_number().over(wc))
        .where(F.col("r") == 1)
        .selectExpr("c AS top_customer", "d AS max_cust_degree")
    )
    wp = Window.orderBy(F.col("d").desc(), F.col("p"))
    top_p = (
        pdg.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") == 1)
        .selectExpr("p AS top_part", "d AS max_part_degree")
    )
    mom = cd.agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("d").cast("decimal(38,0)").alias("s1"),
        F.expr("SUM(CAST(d AS DECIMAL(38,0)) * d)").alias("s2"),
    )
    base = (
        edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(
            F.broadcast(
                cd.agg(
                    F.count(F.lit(1)).cast("long").alias("n_customers")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                pdg.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
            )
        )
    )
    return (
        base.crossJoin(F.broadcast(top_c))
        .crossJoin(F.broadcast(top_p))
        .crossJoin(F.broadcast(mom))
        .selectExpr(
            "n_customers",
            "n_parts",
            "n_edges",
            "CAST(CAST(n_edges AS DECIMAL(38,0)) * 1000000"
            " div (CAST(n_customers AS DECIMAL(38,0)) * n_parts)"
            " AS BIGINT) AS density_ppm",
            "top_customer",
            "max_cust_degree",
            "top_part",
            "max_part_degree",
            "CAST(n_edges * 1000 div n_customers AS BIGINT)"
            " AS edges_per_customer_permille",
            "CAST((s2 * nc - s1 * s1) * 1000 div (s1 * s1)"
            " AS BIGINT) AS paradox_gap_permille",
        )
    )
