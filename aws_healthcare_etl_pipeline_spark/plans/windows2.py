"""Window/grouping coverage tail: forward as-of, explicit GROUPING SETS,
and interval RANGE frames (SURVEY.md §2.3/§2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table, register_views
from .registry import query


@query(
    "asof_forward_next_purchase",
    oracle="""
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS next_purchase_ts, p.value AS next_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.event_id
    """,
    description="Forward as-of: for each click, the next purchase by the "
    "same user — direction='forward' vs DuckDB ASOF with <=.",
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_time"),
        F.col("ts").alias("next_purchase_ts"),
        F.col("value").alias("next_purchase_value"),
    )
    return (
        asof_join(
            clicks,
            purchases,
            on="user_id",
            left_time="ts",
            right_time="p_time",
            direction="forward",
        )
        .select("event_id", "user_id", "ts", "next_purchase_ts", "next_purchase_value")
        .orderBy("event_id")
    )


@query(
    "grouping_sets_explicit",
    oracle="""
        SELECT r_name, c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST
    """,
    description="Explicit GROUPING SETS (disjoint dimensions + grand "
    "total) through the SQL API.",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer", "nation", "region"])
    return spark.sql(
        """
        SELECT r_name, c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
        """
    )


@query(
    "window_range_interval_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_90d_spend
        FROM orders
        WHERE o_custkey < 20
        ORDER BY o_custkey, o_orderkey
    """,
    description="RANGE frame with a time interval: trailing-90-day spend "
    "per customer (peer rows included — deterministic under date ties).",
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_90d_spend
        FROM orders
        WHERE o_custkey < 20
        ORDER BY o_custkey, o_orderkey
        """
    )
