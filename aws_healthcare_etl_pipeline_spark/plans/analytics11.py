"""Wave-16: gaps-and-islands — consecutive-run detection over sparse
integer domains, the remaining classic window pattern.

  customer_purchase_streaks  longest consecutive-month order streak
                             per customer, histogrammed
  orderkey_gap_islands       contiguous-run census of the sparse
                             orderkey space (sequence-integrity audit)

Both use the rank-difference trick (value - row_number() is constant
within a consecutive run), so island assembly is one sort window plus
one aggregation — no self-joins, no recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "customer_purchase_streaks",
    oracle="""
        WITH months AS (
            SELECT DISTINCT o_custkey AS c,
                   12 * year(o_orderdate) + month(o_orderdate) AS m
            FROM orders
        ), grouped AS (
            SELECT c, m,
                   m - row_number() OVER (PARTITION BY c ORDER BY m)
                       AS island
            FROM months
        ), streaks AS (
            SELECT c, COUNT(*) AS len
            FROM grouped GROUP BY c, island
        ), longest AS (
            SELECT c, MAX(len) AS best FROM streaks GROUP BY c
        )
        SELECT CAST(best AS INT) AS streak_months,
               COUNT(*) AS n_customers
        FROM longest GROUP BY best ORDER BY streak_months
    """,
    description="Purchase-streak analysis: per customer the longest "
    "run of consecutive months with at least one order, via the "
    "rank-difference islands trick (month_index - row_number is "
    "constant exactly within a consecutive run), then the streak-"
    "length histogram. One customer-keyed window over the distinct "
    "(customer, month) frame — month grain caps the window input at "
    "customers x months regardless of order volume — and two "
    "rollups. The retention-adjacent pattern behind billing streaks, "
    "login streaks, and SLA runs.",
)
def customer_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    months = orders.select(
        F.col("o_custkey").alias("c"),
        (12 * F.year("o_orderdate") + F.month("o_orderdate")).alias("m"),
    ).distinct()
    grouped = months.select(
        "c",
        "m",
        (
            F.col("m")
            - F.row_number().over(Window.partitionBy("c").orderBy("m"))
        ).alias("island"),
    )
    streaks = grouped.groupBy("c", "island").agg(F.count(F.lit(1)).alias("len"))
    longest = streaks.groupBy("c").agg(F.max("len").alias("best"))
    return (
        longest.groupBy(F.col("best").cast("int").alias("streak_months"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("streak_months")
    )


@query(
    "orderkey_gap_islands",
    oracle="""
        WITH keys AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
        ), grouped AS (
            SELECT k, k - row_number() OVER (ORDER BY k) AS island
            FROM keys
        ), islands AS (
            SELECT island, COUNT(*) AS run_len,
                   MIN(k) AS run_start, MAX(k) AS run_end
            FROM grouped GROUP BY island
        )
        SELECT COUNT(*) AS n_islands,
               CAST(MAX(run_len) AS BIGINT) AS longest_run,
               CAST(SUM(run_len) AS BIGINT) AS present_keys,
               CAST(MAX(run_end) - MIN(run_start) + 1 - SUM(run_len)
                    AS BIGINT) AS missing_in_span
        FROM islands
    """,
    description="Sequence-integrity audit of the sparse orderkey "
    "domain: contiguous-run census (island count, longest run, "
    "present keys, holes inside the observed span) via the "
    "rank-difference trick, with the global rank computed by the "
    "two-level decomposition (operators/cumsum.py over key-range "
    "buckets) — per-bucket partitioned windows plus a bounded "
    "bucket-spine carry, never a single-task sort of the key column. "
    "The audit answers 'did ingestion drop a key range' without "
    "joining against a generated spine of the full domain.",
)
def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cumsum import distributed_running_total

    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("k")).distinct()
    # rank-difference islands with the rank computed by the two-level
    # decomposition (r3): row_number over an unpartitioned window was
    # a single-task sort of the whole key column; running COUNT via
    # key-range buckets (floor(k / 2^17), monotone in k) is the same
    # rank, computed with partitioned per-bucket windows + a bounded
    # bucket-spine carry.
    bucketed = keys.withColumn(
        "_kb", F.floor(F.col("k") / F.lit(1 << 17)).cast("bigint")
    )
    ranked = distributed_running_total(
        bucketed,
        value=F.lit(1).cast("bigint"),
        bucket_col="_kb",
        order_cols=["k"],
        out_col="_rn",
        zero=F.lit(0).cast("bigint"),
    )
    grouped = ranked.select("k", (F.col("k") - F.col("_rn")).alias("island"))
    islands = grouped.groupBy("island").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("k").alias("run_start"),
        F.max("k").alias("run_end"),
    )
    return islands.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        F.sum("run_len").cast("bigint").alias("present_keys"),
        (
            F.max("run_end") - F.min("run_start") + 1 - F.sum("run_len")
        )
        .cast("bigint")
        .alias("missing_in_span"),
    )


TOLERANCE = "2 hours"


@query(
    "asof_tolerance_attribution",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ), c AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ), matched AS (
            SELECT p.event_id, p.value,
                   (SELECT MAX(c.ts) FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts,
                   p.ts AS pts
            FROM p
        )
        SELECT CASE WHEN click_ts IS NOT NULL
                     AND pts - click_ts <= INTERVAL 2 HOUR
                    THEN 'attributed' ELSE 'unattributed' END AS attribution,
               COUNT(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE)
                   AS purchase_value
        FROM matched GROUP BY 1 ORDER BY 1
    """,
    description="Bounded-window attribution: purchases as-of joined to "
    "the last preceding click with a 2-hour tolerance (operators/"
    "asof.py, merge_asof-style inclusive bound applied AFTER nearest-"
    "match selection) — matches beyond the window null out and the "
    "purchase lands in the unattributed bucket. The oracle re-derives "
    "the same via a correlated MAX subquery plus the interval test. "
    "Same one-shuffle union+window plan as the unbounded as-of; the "
    "tolerance is a map-side comparison, not a second join.",
)
def asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_time"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_time",
        tolerance=TOLERANCE,
    )
    return (
        joined.select(
            F.when(F.col("click_ts").isNotNull(), "attributed")
            .otherwise("unattributed")
            .alias("attribution"),
            "value",
        )
        .groupBy("attribution")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(15,2)"))
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("attribution")
    )
