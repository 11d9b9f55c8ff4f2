"""Second relational coverage wave: subquery patterns (scalar, EXISTS,
HAVING join-back, min-per-group), unpivot, interval range join, exact
percentiles, date functions, conditional aggregation, token explosion,
and distinct-on — each oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import dec, dsum, query, sql_dsum


@query(
    "having_large_orders",
    oracle=f"""
        SELECT c_name, o_orderkey, o_totalprice, total_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN (
            SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 150
        ) big ON o_orderkey = big.l_orderkey
        ORDER BY o_orderkey
    """,
    description="TPC-H Q18 shape: aggregate-then-join-back with HAVING "
    "(orders whose lineitems exceed 150 total quantity).",
)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy("o_orderkey")
    )


@query(
    "min_price_parts_per_brand",
    oracle="""
        WITH m AS (
            SELECT p_brand AS b, MIN(p_retailprice) AS min_price
            FROM part GROUP BY p_brand
        )
        SELECT p.p_brand, p.p_partkey, p.p_retailprice
        FROM part p
        JOIN m ON p.p_brand = m.b AND p.p_retailprice = m.min_price
        ORDER BY p_brand, p_partkey
    """,
    description="TPC-H Q2 pattern: min-per-group computed once and joined "
    "back (correlated-subquery decorrelation shape).",
)
def min_price_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    m = part.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(m),
            (part.p_brand == m.b) & (part.p_retailprice == m.min_price),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                   / COUNT(*) * 1.5
            FROM orders
        )
        ORDER BY o_orderkey
    """,
    description="Scalar subquery: orders 50% above the global average price "
    "(broadcast single-row aggregate).",
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    threshold = orders.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1)) * 1.5).alias(
            "thr"
        )
    )
    return (
        orders.join(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "sql_exists_recent_buyers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        ORDER BY c_custkey
    """,
    description="Correlated EXISTS through the SQL API — Catalyst "
    "decorrelates to a left-semi join (SURVEY.md §4).",
)
def sql_exists_recent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        ORDER BY c_custkey
        """
    )


@query(
    "unpivot_lineitem_measures",
    oracle=f"""
        SELECT measure,
               {sql_dsum('value')} AS total,
               COUNT(*) AS n
        FROM (
            SELECT 'disc' AS measure, l_discount AS value FROM lineitem
            UNION ALL
            SELECT 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'qty', l_quantity FROM lineitem
        ) u
        GROUP BY measure
        ORDER BY measure
    """,
    description="Unpivot (stack) three measure columns into rows, then "
    "re-aggregate per measure.",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.selectExpr(
            "stack(3, 'disc', l_discount, 'price', l_extendedprice, 'qty', l_quantity)"
            " AS (measure, value)"
        )
        .groupBy("measure")
        .agg(dsum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy("measure")
    )


@query(
    "range_join_purchase_context",
    oracle="""
        SELECT p.event_id,
               COUNT(c.event_id) AS n_recent_clicks
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts < p.ts
        GROUP BY p.event_id
        ORDER BY p.event_id
    """,
    description="Interval range join: clicks within the 10 minutes before "
    "each purchase (equi-join on user + range residual).",
)
def range_join_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= p.ts - F.expr("INTERVAL 10 MINUTES"))
            & (c.c_ts < p.ts),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("c_event").alias("n_recent_clicks"))
        .orderBy("event_id")
    )


@query(
    "token_frequencies",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents
        ) t
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """,
    description="Array explosion: tokenize -> explode -> global top-20 token "
    "frequencies (deterministic tiebreak).",
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@query(
    "conditional_aggregation",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_full_price,
               CAST(COALESCE(
                   SUM(CAST(l_extendedprice AS DECIMAL(15,2)))
                       FILTER (WHERE l_discount > 0.05),
                   0) AS DOUBLE) AS discounted_revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Conditional aggregation (FILTER / sum-of-CASE duality).",
)
def conditional_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(disc, 1)).alias("n_discounted"),
            F.count(F.when(F.col("l_discount") == 0.0, 1)).alias("n_full_price"),
            F.coalesce(
                F.sum(F.when(disc, dec("l_extendedprice"))),
                F.lit(0).cast("decimal(15,2)"),
            )
            .cast("double")
            .alias("discounted_revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "date_function_battery",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                    AS INT) AS days_since_epoch_start,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(quarter(o_orderdate) AS INT) AS q,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
    description="Date/time scalar functions (datediff, last_day, quarter, "
    "interval arithmetic).",
)
def date_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # date-typed columns are returned as yyyy-MM-dd STRINGS: DuckDB's
    # client surfaces DATE as midnight datetimes, which would make a
    # value-level compare ambiguous even when the dates are equal.
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus30"),
    ).orderBy("o_orderkey")


@query(
    "exact_percentiles",
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
               round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 6) AS p75
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="Exact interpolated percentiles per group (Spark percentile "
    "== DuckDB quantile_cont, linear interpolation).",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "distinct_on_latest_order",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        ) t
        WHERE rn = 1
        ORDER BY o_custkey
    """,
    description="DISTINCT ON / argmax: each customer's latest order "
    "(window k=1, WindowGroupLimit pushdown).",
)
def distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


@query(
    "null_handling_battery",
    oracle="""
        SELECT c_custkey,
               COALESCE(MAX(o_totalprice), -1.0) AS max_price_or_neg1,
               NULLIF(COUNT(o_orderkey), 0) AS n_orders_or_null,
               CASE WHEN COUNT(o_orderkey) = 0 THEN 'inactive' ELSE 'active' END
                   AS status
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    description="NULL-handling scalars (coalesce, nullif, case) over an "
    "outer-join aggregate.",
)
def null_handling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    n = F.count("o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.max("o_totalprice"), F.lit(-1.0)).alias("max_price_or_neg1"),
            F.nullif(n, F.lit(0)).alias("n_orders_or_null"),
            F.when(n == 0, "inactive").otherwise("active").alias("status"),
        )
        .orderBy("c_custkey")
    )
