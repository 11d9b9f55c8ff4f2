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


@query(
    "funnel_click_to_purchase",
    oracle="""
        SELECT COUNT(*) AS n_purchases,
               COUNT(*) FILTER (
                   WHERE EXISTS (
                       SELECT 1 FROM events c
                       WHERE c.event_type = 'click'
                         AND c.user_id = p.user_id
                         AND c.ts < p.ts
                         AND c.ts >= p.ts - INTERVAL 1 HOUR
                   )
               ) AS converted_within_1h,
               round(CAST(COUNT(*) FILTER (
                   WHERE EXISTS (
                       SELECT 1 FROM events c
                       WHERE c.event_type = 'click'
                         AND c.user_id = p.user_id
                         AND c.ts < p.ts
                         AND c.ts >= p.ts - INTERVAL 1 HOUR
                   )
               ) AS DOUBLE) / COUNT(*), 9) AS conversion_rate
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    """,
    description="Funnel analysis: purchases preceded by a click within 1h "
    "(correlated temporal EXISTS -> semi join).",
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    converted = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts < purchases.ts)
        & (clicks.c_ts >= purchases.ts - F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    n_conv = converted.agg(F.count(F.lit(1)).alias("c"))
    n_all = purchases.agg(F.count(F.lit(1)).alias("n"))
    return (
        n_all.crossJoin(n_conv)
        .select(
            F.col("n").alias("n_purchases"),
            F.col("c").alias("converted_within_1h"),
            F.round(F.col("c").cast("double") / F.col("n"), 9).alias(
                "conversion_rate"
            ),
        )
    )


@query(
    "top_ngrams_per_lang",
    oracle="""
        WITH toks AS (
            SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents
        ), counts AS (
            SELECT lang, w, COUNT(*) AS n FROM toks GROUP BY lang, w
        )
        SELECT lang, w, n, rn
        FROM (
            SELECT lang, w, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n DESC, w
                   ) AS rn
            FROM counts
        ) t
        WHERE rn <= 5
        ORDER BY lang, rn
    """,
    description="Top-5 tokens per language: explode -> count -> per-group "
    "top-k (WindowGroupLimit over an aggregate).",
)
def top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import top_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        top_k_per_group(counts, ["lang"], [F.col("n").desc(), F.col("w").asc()], k=5)
        .select("lang", "w", "n", "rn")
        .orderBy("lang", "rn")
    )


@query(
    "events_daily_active_users",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               COUNT(DISTINCT user_id) AS dau,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    description="Daily active users: exact distinct per day + event volume "
    "(the canonical engagement rollup).",
)
def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("day")
    )


@query(
    "feature_zscore_prices",
    oracle="""
        WITH stats AS (
            SELECT o_orderpriority AS prio,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))
                            * CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sxx
            FROM orders GROUP BY 1
        )
        SELECT o_orderkey, o_orderpriority,
               round((o_totalprice - sx / n)
                     / sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS price_zscore
        FROM orders JOIN stats ON o_orderpriority = stats.prio
        WHERE o_orderkey < 1000
        ORDER BY o_orderkey
    """,
    description="Feature engineering: per-group z-score from exact decimal "
    "moments (broadcast stats join; 4-dp rounding absorbs the sub-ulp "
    "divergence of huge decimal->double conversions).",
)
def feature_zscore_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import dec

    orders = load_table(spark, sf_dir, "orders")
    x = dec("o_totalprice")
    stats = orders.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    return (
        orders.filter(F.col("o_orderkey") < 1000)
        .join(F.broadcast(stats), orders.o_orderpriority == stats.prio)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("o_totalprice") - F.col("sx") / F.col("n"))
                / F.sqrt(
                    (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                    / (F.col("n") - F.lit(1))
                ),
                4,
            ).alias("price_zscore"),
        )
        .orderBy("o_orderkey")
    )
