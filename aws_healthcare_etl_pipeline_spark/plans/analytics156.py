"""Wave-182 (round 5): the friendship paradox + NULL-semantics law.

* ``graph_friendship_paradox`` — "your friends have more friends
  than you", proven exactly on the co-purchase graph: mean degree
  is S1/n, mean NEIGHBOR degree is S2/S1 (S2 = sum of squared
  degrees), and the paradox S2/S1 >= S1/n is Cauchy-Schwarz — the
  query emits both means as cross-multiplied exact rationals plus
  the strictness gap in permille, entirely from one degree table.

* ``sql_null_semantics_battery`` — ANSI NULL law, pinned: planted
  NULLs flow through arithmetic (+ propagates), string concat (||
  propagates), comparisons (= yields NULL, IS DISTINCT FROM does
  not), GREATEST/LEAST (both engines IGNORE NULLs — the documented
  non-ANSI corner), COALESCE/NULLIF, and aggregate null-skipping
  (COUNT(col) vs COUNT(*), SUM over all-null slices). Every row of
  output is a law; the hash match proves both engines implement
  the same one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "graph_friendship_paradox",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), degs AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY c
        ), moments AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(deg) AS HUGEINT) AS s1,
                   CAST(SUM(deg * deg) AS HUGEINT) AS s2
            FROM degs
        )
        SELECT CAST(n AS BIGINT) AS n_nodes,
               CAST(s1 AS BIGINT) AS degree_sum,
               CAST(s1 * 1000 // n AS BIGINT)
                   AS mean_degree_permille,
               CAST(s2 * 1000 // s1 AS BIGINT)
                   AS mean_neighbor_degree_permille,
               s2 * n > s1 * s1 AS paradox_strict,
               CAST((s2 * n - s1 * s1) * 1000 // (s1 * s1)
                   AS BIGINT) AS strictness_gap_permille
        FROM moments
    """,
    description="The friendship paradox, exact: on the customer-part "
    "co-purchase graph, mean degree is S1/n and mean NEIGHBOR degree "
    "is S2/S1 (S2 = sum of squared degrees, because each node is "
    "counted by each of its deg neighbors) — the paradox "
    "S2/S1 >= S1/n is Cauchy-Schwarz, and its STRICTNESS is a "
    "measurable property of degree variance. Emitted as cross-"
    "multiplied integer comparisons (S2*n vs S1^2 in HUGEINT/"
    "DECIMAL38) plus permille means and the strictness gap — no "
    "division-ordering ambiguity anywhere. 100 TB shape: one edge "
    "dedup shuffle, one degree agg, three scalars; the sampling-"
    "bias fact (edge-sampled nodes skew high-degree) that every "
    "graph crawler and contact-tracing design must correct for.",
)
def graph_friendship_paradox(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    degs = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    moments = degs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("deg").cast("decimal(38,0)").alias("s1"),
        F.expr("SUM(CAST(deg AS DECIMAL(38,0)) * deg)").alias("s2"),
    )
    return moments.selectExpr(
        "CAST(n AS BIGINT) AS n_nodes",
        "CAST(s1 AS BIGINT) AS degree_sum",
        "CAST(s1 * 1000 div n AS BIGINT) AS mean_degree_permille",
        "CAST(s2 * 1000 div s1 AS BIGINT)"
        " AS mean_neighbor_degree_permille",
        "s2 * n > s1 * s1 AS paradox_strict",
        "CAST((s2 * n - s1 * s1) * 1000 div (s1 * s1) AS BIGINT)"
        " AS strictness_gap_permille",
    )


@query(
    "sql_null_semantics_battery",
    oracle="""
        WITH planted AS (
            SELECT c_custkey AS k,
                   CASE WHEN c_custkey % 3 = 0 THEN NULL
                        ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2))
                             * 100 AS BIGINT) END AS a,
                   CASE WHEN c_custkey % 5 = 0 THEN NULL
                        ELSE c_custkey END AS b
            FROM customer
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(a) AS BIGINT) AS count_a,
               CAST(COUNT(b) AS BIGINT) AS count_b,
               CAST(SUM(CASE WHEN a + b IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS plus_nulls,
               CAST(SUM(CASE WHEN CAST(a AS VARCHAR) || 'x' IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS concat_nulls,
               CAST(SUM(CASE WHEN (a = b) IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS eq_unknowns,
               CAST(SUM(CASE WHEN a IS DISTINCT FROM b
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS distinct_from_true,
               CAST(SUM(CASE WHEN GREATEST(a, b) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS greatest_nulls,
               CAST(SUM(CASE WHEN COALESCE(a, b, 0) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS coalesce_nulls,
               CAST(SUM(CASE WHEN NULLIF(b, b) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS nullif_self_nulls,
               CAST(SUM(CASE WHEN a IS NULL AND b IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS both_null_rows,
               CAST(SUM(a) AS BIGINT) AS sum_a_skips_nulls
        FROM planted
    """,
    description="ANSI NULL law pinned across engines on planted "
    "NULLs: + propagates (a+b NULL when either side is), || "
    "propagates, a = b yields UNKNOWN (counted via IS NULL on the "
    "comparison), IS DISTINCT FROM never does, GREATEST/LEAST "
    "IGNORE NULLs in BOTH engines (the documented non-ANSI corner — "
    "GREATEST(a,b) is NULL only when both are), COALESCE/NULLIF "
    "behave, COUNT(col) skips while COUNT(*) doesn't, and SUM "
    "ignores NULL rows. Each output column is one law; the hash "
    "match is the cross-engine proof. 100 TB shape: one scan, one "
    "map-side partial agg — the semantics regression suite every "
    "engine migration should run first.",
)
def sql_null_semantics_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    planted = cust.selectExpr(
        "c_custkey AS k",
        "CASE WHEN c_custkey % 3 = 0 THEN NULL"
        " ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " END AS a",
        "CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END"
        " AS b",
    )
    return planted.selectExpr(
        "a",
        "b",
        "a + b AS apb",
        "CAST(a AS STRING) || 'x' AS cat",
        "(a = b) AS eqv",
        "a IS DISTINCT FROM b AS idf",
        "GREATEST(a, b) AS gr",
        "COALESCE(a, b, 0) AS co",
        "NULLIF(b, b) AS ni",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("a").cast("long").alias("count_a"),
        F.count("b").cast("long").alias("count_b"),
        F.sum(F.when(F.col("apb").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("plus_nulls"),
        F.sum(F.when(F.col("cat").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("concat_nulls"),
        F.sum(F.when(F.col("eqv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("eq_unknowns"),
        F.sum(F.when(F.col("idf"), 1).otherwise(0))
        .cast("long")
        .alias("distinct_from_true"),
        F.sum(F.when(F.col("gr").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("greatest_nulls"),
        F.sum(F.when(F.col("co").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("coalesce_nulls"),
        F.sum(F.when(F.col("ni").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nullif_self_nulls"),
        F.sum(
            F.when(F.col("a").isNull() & F.col("b").isNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_null_rows"),
        F.sum("a").cast("long").alias("sum_a_skips_nulls"),
    )
