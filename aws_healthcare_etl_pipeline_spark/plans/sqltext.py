"""Wave-15: the SQL-text front end. The reference's users queried via
Athena SQL (README.md:98-101 of the reference); these queries enter
through ``spark.sql`` over registered views — parser, analyzer and
decorrelation on the SQL path, not the DataFrame builder — and pin
that both front ends reach the same plans and values.

  sql_lateral_view_tokens   LATERAL VIEW explode over split tokens
  sql_named_window_shares   named WINDOW clause reused by two functions
  sql_pivot_syntax          SQL PIVOT (FOR ... IN ...) with aliases
  sql_inline_values_join    inline VALUES relation joined to a view

Oracle conventions per plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .registry import query


@query(
    "sql_lateral_view_tokens",
    oracle=r"""
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS token
            FROM documents
        )
        SELECT lang, token, COUNT(*) AS n
        FROM tok
        WHERE length(token) >= 6
        GROUP BY lang, token
        ORDER BY n DESC, lang, token
        LIMIT 20
    """,
    description="LATERAL VIEW explode through the SQL parser (the "
    "HiveQL-compatible generator syntax) — long-token frequencies per "
    "language. Same generate-then-aggregate plan the DataFrame "
    "explode path produces; pins parser-path parity for the token "
    "pipelines.",
)
def sql_lateral_view_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        r"""
        SELECT lang, token, COUNT(*) AS n
        FROM documents
        LATERAL VIEW explode(split(trim(lower(text)), '\\s+')) t AS token
        WHERE length(token) >= 6
        GROUP BY lang, token
        ORDER BY n DESC, lang, token
        LIMIT 20
        """
    )


@query(
    "sql_named_window_shares",
    oracle="""
        WITH monthly AS (
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mon,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
            FROM orders GROUP BY 1, 2
        )
        SELECT yr, mon,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER w_run AS DOUBLE) AS ytd_revenue,
               row_number() OVER w_rank AS month_rank_in_year
        FROM monthly
        WINDOW w_run  AS (PARTITION BY yr ORDER BY mon
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW),
               w_rank AS (PARTITION BY yr ORDER BY rev DESC, mon)
        ORDER BY yr, mon
    """,
    description="Named WINDOW clause (WINDOW w AS ...) reused by a "
    "running exact-DECIMAL year-to-date sum and a revenue rank — the "
    "SQL-text spelling of the frame/rank coverage; both windows "
    "share the year partitioning, one shuffle.",
)
def sql_named_window_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH monthly AS (
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mon,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
            FROM orders GROUP BY 1, 2
        )
        SELECT yr, mon,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER w_run AS DOUBLE) AS ytd_revenue,
               row_number() OVER w_rank AS month_rank_in_year
        FROM monthly
        WINDOW w_run  AS (PARTITION BY yr ORDER BY mon
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW),
               w_rank AS (PARTITION BY yr ORDER BY rev DESC, mon)
        ORDER BY yr, mon
        """
    )


@query(
    "sql_pivot_syntax",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O'
                             THEN CAST(o_totalprice AS DECIMAL(15,2)) END)
                    AS DOUBLE) AS open_rev,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(15,2)) END)
                    AS DOUBLE) AS filled_rev,
               CAST(SUM(CASE WHEN o_orderstatus = 'P'
                             THEN CAST(o_totalprice AS DECIMAL(15,2)) END)
                    AS DOUBLE) AS pending_rev
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="SQL PIVOT syntax (FOR status IN (... AS alias)) — "
    "revenue by priority pivoted across order statuses. Spark plans "
    "PIVOT as the same conditional aggregation the oracle states "
    "(one pass, map-side combinable), never a self-join per column.",
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(open_rev AS DOUBLE) AS open_rev,
               CAST(filled_rev AS DOUBLE) AS filled_rev,
               CAST(pending_rev AS DOUBLE) AS pending_rev
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(15,2)) AS price
            FROM orders
        )
        PIVOT (
            SUM(price)
            FOR o_orderstatus IN ('O' AS open_rev,
                                  'F' AS filled_rev,
                                  'P' AS pending_rev)
        )
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_inline_values_join",
    oracle="""
        WITH tiers (r_name, tier) AS (
            VALUES ('AMERICA', 'core'), ('EUROPE', 'core'),
                   ('ASIA', 'growth'), ('AFRICA', 'growth'),
                   ('MIDDLE EAST', 'growth')
        )
        SELECT tier,
               COUNT(DISTINCT n_nationkey) AS n_nations,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN tiers    ON region.r_name = tiers.r_name
        GROUP BY tier ORDER BY tier
    """,
    description="Inline VALUES relation in SQL text (the ad-hoc "
    "mapping-table idiom analysts reach for instead of uploading a "
    "CSV) joined through the star to revenue by tier. The literal "
    "relation is a LocalRelation — broadcast for free, constant-"
    "folded, no scan.",
)
def sql_inline_values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders", "customer", "nation", "region"])
    return spark.sql(
        """
        WITH tiers (r_name, tier) AS (
            VALUES ('AMERICA', 'core'), ('EUROPE', 'core'),
                   ('ASIA', 'growth'), ('AFRICA', 'growth'),
                   ('MIDDLE EAST', 'growth')
        )
        SELECT tier,
               COUNT(DISTINCT n_nationkey) AS n_nations,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN tiers    ON region.r_name = tiers.r_name
        GROUP BY tier ORDER BY tier
        """
    )
