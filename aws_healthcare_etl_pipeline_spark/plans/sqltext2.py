"""Wave-31: SQL front-end depth — the two ANSI features Spark 4 added
that close the gap with warehouse SQL dialects.

  sql_recursive_month_spine   WITH RECURSIVE seed/step CTE (Spark 4
                              recursion) generating the calendar spine
  sql_lateral_topn_per_nation correlated LATERAL subquery with
                              ORDER BY ... LIMIT (decorrelated by the
                              planner, not re-executed per row)

Oracle conventions per plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .registry import query


@query(
    "sql_recursive_month_spine",
    oracle="""
        WITH RECURSIVE spine(m) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM spine
            WHERE m < TIMESTAMP '2001-08-01'
        )
        SELECT m AS month,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                   AS revenue
        FROM spine LEFT JOIN orders
          ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        ORDER BY m
    """,
    description="Recursive CTE through the SQL parser (Spark 4 WITH "
    "RECURSIVE): the seed/step recursion generates the 80-month "
    "calendar spine, LEFT-joined to orders so months with no rows "
    "still appear — the gap-free-reporting idiom that previously "
    "required sequence()/explode on the DataFrame path "
    "(timeseries_gapfill_ffill). Recursion depth is the spine length "
    "(bounded, driver-side plan iteration); the join and aggregate "
    "are ordinary distributed operators, so the pattern scales with "
    "the fact table, not the recursion.",
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM spine
            WHERE m < TIMESTAMP '2001-08-01'
        )
        SELECT m AS month,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                   AS revenue
        FROM spine LEFT JOIN orders
          ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        ORDER BY m
        """
    )


@query(
    "sql_lateral_topn_per_nation",
    oracle="""
        SELECT n.n_name, l.c_name,
               CAST(l.c_acctbal AS DOUBLE) AS c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) l
        ORDER BY n.n_name, c_acctbal DESC, l.c_name
    """,
    description="Correlated LATERAL subquery with ORDER BY ... LIMIT "
    "(top-3 customers by balance per nation) through the SQL parser. "
    "Catalyst decorrelates this to the same ranked-window shape as "
    "window_topk_parts_per_brand rather than re-executing the "
    "subquery per outer row — the difference between one pass and "
    "|nation| passes over customer at 100 TB. Ties broken by "
    "c_custkey so the row set is deterministic.",
)
def sql_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n.n_name, l.c_name,
               CAST(l.c_acctbal AS DOUBLE) AS c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) l
        ORDER BY n.n_name, c_acctbal DESC, l.c_name
        """
    )
