"""Window functions, top-k-per-group, as-of join, sessionization
(SURVEY.md §2.4-2.5 [EXT]) — each with a DuckDB oracle (DuckDB has
native ASOF JOIN, which makes a strong independent check for our
union+window implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.topk import top_k_per_group
from ..sources.tables import load_table
from ..streaming.windows import sessionize
from .registry import SQL_DISC_PRICE, disc_price, query


@query(
    "window_topk_parts_per_brand",
    oracle="""
        SELECT p_brand, p_partkey, p_name, p_retailprice, rn
        FROM (
            SELECT p_brand, p_partkey, p_name, p_retailprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey
                   ) AS rn
            FROM part
        ) t
        WHERE rn <= 3
        ORDER BY p_brand, rn
    """,
    description="Top-3 priciest parts per brand: ranking window + "
    "WindowGroupLimit pushdown.",
)
def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        top_k_per_group(
            part,
            ["p_brand"],
            [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
            k=3,
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@query(
    "window_lag_order_deltas",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               RANK() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC
               ) AS price_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    description="Analytic windows: lag/lead over order history + rank.",
)
def window_lag_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(wr).alias("price_rank"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_running_supplier_revenue",
    oracle=f"""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM({SQL_DISC_PRICE}) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue
        FROM lineitem
        WHERE l_suppkey < 5
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
    description="Running-total frame (ROWS UNBOUNDED PRECEDING) with exact "
    "decimal accumulation; total order via (shipdate, orderkey, linenumber).",
)
def window_running_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(disc_price()).over(w).cast("double").alias("running_revenue"),
        "l_shipdate",
    ).orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber").drop("l_shipdate")


@query(
    "asof_purchase_last_click",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.ts AS click_ts, c.value AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    description="As-of join (nearest earlier click per purchase) — "
    "union+window implementation checked against DuckDB's native ASOF JOIN.",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # the right-side time column is consumed by the join; pass a payload
    # copy (click_ts) so the matched click's timestamp reaches the output
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_time"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return (
        asof_join(
            purchases,
            clicks,
            on="user_id",
            left_time="ts",
            right_time="click_time",
        )
        .select("event_id", "user_id", "ts", "value", "click_ts", "click_value")
        .orderBy("event_id")
    )


@query(
    "sessionize_user_events",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    description="Sessionization: native session_window vs gaps-and-islands "
    "SQL oracle (30-minute inactivity gap).",
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, gap="30 minutes").orderBy("user_id", "session_start")
