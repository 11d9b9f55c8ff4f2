"""Wave-13 analytics: financial-grade exact arithmetic and behavioral
timing — concentration analysis, reconciliation, money allocation,
conversion lag, and graph degree profiles.

  pareto_80_20_customers      customers needed to cover 80% of revenue
  reconcile_order_totals      header-vs-lines consistency audit
  money_allocation_largest_remainder  exact cents allocation with
                                      largest-remainder rounding
  funnel_conversion_lag_stats click->purchase time-to-convert quartiles
  degree_distribution_suppliers  bipartite degree histogram

Oracle conventions per plans/registry.py. The 80% threshold and the
cents allocation stay in integer/decimal arithmetic end-to-end
(5*cum >= 4*total instead of cum >= 0.8*total; div/% on cents), so
no rounding boundary can flip a row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.money import allocate_largest_remainder
from ..sources.tables import load_table
from .registry import charge, dec, query, SQL_CHARGE


@query(
    "pareto_80_20_customers",
    oracle="""
        WITH spend AS (
            SELECT c_mktsegment AS seg, c_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT seg, x,
                   SUM(x) OVER (PARTITION BY seg
                                ORDER BY x DESC, c_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
                   SUM(x) OVER (PARTITION BY seg) AS total
            FROM spend
        )
        SELECT seg,
               COUNT(*) AS n_customers,
               CAST(1 + COUNT(CASE WHEN 5 * cum < 4 * total THEN 1 END)
                    AS BIGINT) AS n_top_for_80pct,
               round(CAST(1 + COUNT(CASE WHEN 5 * cum < 4 * total THEN 1 END)
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS top_share_of_customers,
               CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN cum END)
                    AS DOUBLE) AS revenue_covered
        FROM ranked GROUP BY seg ORDER BY seg
    """,
    description="Pareto 80/20 concentration: per market segment, how "
    "many top customers (by spend, custkey tiebreak) cover 80% of "
    "revenue. The threshold test is 5*cum >= 4*total in exact DECIMAL "
    "— no 0.8 float multiply, so the crossing row is engine-exact. "
    "One fact shuffle to customer grain, one per-segment sort window, "
    "one reduce; the concentration diagnostic behind sampling and "
    "stratification choices.",
)
def pareto_80_20_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("x"))
    )
    cum_w = (
        Window.partitionBy("seg")
        .orderBy(F.desc("x"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("seg")
    ranked = spend.select(
        "seg",
        "x",
        F.sum("x").over(cum_w).alias("cum"),
        F.sum("x").over(tot_w).alias("total"),
    )
    below = F.count(F.when(F.lit(5) * F.col("cum") < F.lit(4) * F.col("total"), 1))
    return (
        ranked.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.lit(1) + below).cast("bigint").alias("n_top_for_80pct"),
            F.round(
                (F.lit(1) + below).cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("top_share_of_customers"),
            F.min(
                F.when(
                    F.lit(5) * F.col("cum") >= F.lit(4) * F.col("total"),
                    F.col("cum"),
                )
            )
            .cast("double")
            .alias("revenue_covered"),
        )
        .orderBy("seg")
    )


@query(
    "reconcile_order_totals",
    oracle=f"""
        WITH line_sums AS (
            SELECT l_orderkey,
                   COUNT(*) AS n_lines,
                   SUM({SQL_CHARGE}) AS line_total
            FROM lineitem GROUP BY 1
        ), classified AS (
            SELECT o_orderstatus AS status,
                   CASE
                     WHEN n_lines IS NULL THEN 'no_lines'
                     WHEN abs(CAST(o_totalprice AS DECIMAL(15,2))
                              - line_total)
                          <= CAST(0.01 AS DECIMAL(15,2)) THEN 'matched'
                     WHEN 100 * abs(CAST(o_totalprice AS DECIMAL(15,2))
                                    - line_total)
                          <= CAST(o_totalprice AS DECIMAL(15,2))
                         THEN 'within_1pct'
                     ELSE 'off'
                   END AS bucket,
                   COALESCE(n_lines, 0) AS n_lines,
                   CAST(abs(CAST(o_totalprice AS DECIMAL(15,2))
                            - COALESCE(line_total, CAST(0 AS DECIMAL(15,2))))
                        AS DOUBLE) AS abs_diff
            FROM orders LEFT JOIN line_sums ON o_orderkey = l_orderkey
        )
        SELECT status, bucket,
               COUNT(*) AS n_orders,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines,
               round(MAX(abs_diff), 2) AS max_abs_diff
        FROM classified GROUP BY status, bucket
        ORDER BY status, bucket
    """,
    description="Header-vs-detail reconciliation: order totals against "
    "the exact-DECIMAL sum of line charges (price*(1-disc)*(1+tax)), "
    "bucketed into matched / within-1% / off / no-lines per status. "
    "The 1% band is 100*|diff| <= total in DECIMAL — no float "
    "threshold. One orderkey-grain aggregation and one co-keyed left "
    "join; the accounting-consistency audit run before publishing "
    "revenue rollups from either side.",
)
def reconcile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line_sums = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(charge()).alias("line_total"),
    )
    o_dec = dec("o_totalprice")
    zero = F.lit(0).cast("decimal(15,2)")
    diff = F.abs(o_dec - F.col("line_total"))
    classified = orders.join(
        line_sums, orders.o_orderkey == line_sums.l_orderkey, "left"
    ).select(
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("n_lines").isNull(), "no_lines")
        .when(diff <= F.lit(0.01).cast("decimal(15,2)"), "matched")
        .when(F.lit(100) * diff <= o_dec, "within_1pct")
        .otherwise("off")
        .alias("bucket"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.abs(o_dec - F.coalesce(F.col("line_total"), zero))
        .cast("double")
        .alias("abs_diff"),
    )
    return (
        classified.groupBy("status", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.round(F.max("abs_diff"), 2).alias("max_abs_diff"),
        )
        .orderBy("status", "bucket")
    )


@query(
    "money_allocation_largest_remainder",
    oracle="""
        WITH lines AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS w
            FROM lineitem
        ), keyed AS (
            SELECT l.l_orderkey, l.l_linenumber, l.w,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
                   SUM(l.w) OVER (PARTITION BY l.l_orderkey) AS sum_w
            FROM lines l JOIN orders ON l.l_orderkey = o_orderkey
        ), based AS (
            SELECT *,
                   (total_cents * w) // sum_w AS base,
                   (total_cents * w) % sum_w AS rem,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY (total_cents * w) % sum_w DESC, l_linenumber
                   ) AS rr
            FROM keyed
        ), alloc AS (
            SELECT l_orderkey, total_cents,
                   base + CASE WHEN rr <= total_cents
                                         - SUM(base) OVER (
                                               PARTITION BY l_orderkey)
                               THEN 1 ELSE 0 END AS cents
            FROM based
        ), per_order AS (
            SELECT o.o_orderstatus AS status, a.l_orderkey,
                   MAX(a.total_cents) AS total_cents,
                   SUM(a.cents) AS allocated,
                   COUNT(*) AS n_lines
            FROM alloc a JOIN orders o ON a.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        )
        SELECT status,
               COUNT(*) AS n_orders,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines,
               CAST(SUM(allocated) AS BIGINT) AS allocated_cents,
               CAST(SUM(total_cents) AS BIGINT) AS order_cents,
               COUNT(*) = COUNT(CASE WHEN allocated = total_cents THEN 1 END)
                   AS conservation_exact
        FROM per_order GROUP BY status ORDER BY status
    """,
    description="Exact money allocation: distribute each order's total "
    "(in integer cents) across its lines proportionally to extended "
    "price, largest-remainder method — base = total*w div sum_w, the "
    "leftover cents go to the largest division remainders "
    "(linenumber tiebreak). Pure int64 arithmetic (max product ~6e14, "
    "no overflow), so every engine allocates the identical cent and "
    "conservation (sum of allocations == order total) holds exactly, "
    "which the result self-checks per status. Two orderkey-local "
    "windows over one shuffle; the pattern behind invoice splitting, "
    "budget spreading, and any must-sum-exactly disaggregation.",
)
def money_allocation_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    keyed = lines.join(
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
        ),
        lines.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "w", "total_cents", "o_orderstatus")
    alloc = allocate_largest_remainder(
        keyed,
        key="l_orderkey",
        weight="w",
        total="total_cents",
        tiebreak="l_linenumber",
        out="cents",
    ).select("l_orderkey", "total_cents", "o_orderstatus", "cents")
    per_order = alloc.groupBy(
        F.col("o_orderstatus").alias("status"), "l_orderkey"
    ).agg(
        F.max("total_cents").alias("total_cents"),
        F.sum("cents").alias("allocated"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_order.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.sum("allocated").cast("bigint").alias("allocated_cents"),
            F.sum("total_cents").cast("bigint").alias("order_cents"),
            (
                F.count(F.lit(1))
                == F.count(F.when(F.col("allocated") == F.col("total_cents"), 1))
            ).alias("conservation_exact"),
        )
        .orderBy("status")
    )


@query(
    "funnel_conversion_lag_stats",
    oracle="""
        WITH first_click AS (
            SELECT user_id, MIN(ts) AS fc
            FROM events WHERE event_type = 'click' GROUP BY 1
        ), conv AS (
            SELECT e.user_id,
                   MIN(epoch_ns(e.ts) // 1000
                       - epoch_ns(f.fc) // 1000) AS lag_us
            FROM events e JOIN first_click f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= f.fc
            GROUP BY e.user_id
        )
        SELECT COUNT(*) AS n_converters,
               round(quantile_cont(lag_us, 0.25) / 3600000000.0, 6)
                   AS p25_hours,
               round(quantile_cont(lag_us, 0.50) / 3600000000.0, 6)
                   AS p50_hours,
               round(quantile_cont(lag_us, 0.75) / 3600000000.0, 6)
                   AS p75_hours
        FROM conv
    """,
    description="Time-to-convert distribution: per user the lag from "
    "first click to the earliest subsequent purchase, in exact "
    "integer microseconds, then interpolated quartiles rendered in "
    "hours. Two user-keyed aggregations and one co-keyed join — the "
    "conversion-latency companion to the funnel-rate query, telling "
    "you not just who converts but how long attribution windows must "
    "be to see it.",
)
def funnel_conversion_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("fc"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts") - F.unix_micros("fc")).alias("lag_us"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.expr("percentile(lag_us, 0.25)") / 3600000000.0, 6).alias(
            "p25_hours"
        ),
        F.round(F.expr("percentile(lag_us, 0.50)") / 3600000000.0, 6).alias(
            "p50_hours"
        ),
        F.round(F.expr("percentile(lag_us, 0.75)") / 3600000000.0, 6).alias(
            "p75_hours"
        ),
    )


@query(
    "degree_distribution_suppliers",
    oracle="""
        WITH deg AS (
            SELECT l_suppkey,
                   COUNT(DISTINCT c_nationkey) AS degree
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        )
        SELECT degree, COUNT(*) AS n_suppliers
        FROM deg GROUP BY degree ORDER BY degree
    """,
    description="Bipartite degree distribution: per supplier the "
    "number of distinct customer nations it ships to, histogrammed. "
    "The two-hop star join reduces immediately to (suppkey, "
    "nationkey) distinct pairs — Spark's Expand + partial distinct "
    "keeps the shuffle at pair grain — then two tiny rollups. The "
    "graph-shape profile run before choosing between broadcast and "
    "partitioned strategies for entity-linking joins.",
)
def degree_distribution_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    deg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_suppkey")
        .agg(F.countDistinct("c_nationkey").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("degree")
    )
