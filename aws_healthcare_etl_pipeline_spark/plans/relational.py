"""Relational operator coverage [EXT] (SURVEY.md §2.2-2.6): scans,
filters, projections, the join family, aggregation family, set ops,
scalar functions — each as a named query with a DuckDB oracle.

Physical-plan posture: dimension tables are broadcast (explicit
``F.broadcast`` where it matters — at 100 TB the fact table must never
shuffle for a dim join); aggregations rely on partial+final hash agg;
AQE coalesces post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec,
    disc_price,
    dsum,
    query,
    sql_dsum,
)

Q1_CUTOFF = "2000-12-01"


@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
               {sql_dsum('l_quantity')} / COUNT(*) AS avg_qty,
               {sql_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
               {sql_dsum('l_discount', 'DECIMAL(8,2)')} / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: scan-filter + 8-aggregate hash agg "
    "(partial+final, whole-stage codegen).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", "decimal(8,2)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 shape: broadcast dim join -> agg -> global top-10 "
    "(deterministic tiebreak on l_orderkey).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
        SELECT r_name,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    description="5-table star join (fact + 4 broadcast dims) -> revenue per "
    "region. The flagship query.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name")
    )


@query(
    "join_brand_supplier_volume",
    oracle=f"""
        SELECT p_brand, s_name,
               {sql_dsum('l_quantity')} AS total_qty,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY p_brand, s_name
        ORDER BY p_brand, s_name
    """,
    description="Fact + two broadcast dims on independent keys.",
)
def join_brand_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(dsum("l_quantity").alias("total_qty"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand", "s_name")
    )


@query(
    "semi_customers_with_big_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        )
        ORDER BY c_custkey
    """,
    description="Left-semi join (EXISTS): customers holding any order over "
    "400k.",
)
def semi_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "anti_customers_without_recent_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        ORDER BY c_custkey
    """,
    description="Left-anti join (NOT EXISTS): customers with no 2001 order.",
)
def anti_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "left_join_order_counts",
    oracle="""
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(15,2))), 0) AS DOUBLE)
                   AS total_spent
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    description="Left outer join preserving zero-order customers.",
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(15,2)"))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "full_outer_nation_balances",
    oracle="""
        WITH cb AS (
            SELECT c_nationkey AS nationkey,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS cust_bal
            FROM customer GROUP BY c_nationkey
        ), sb AS (
            SELECT s_nationkey AS nationkey,
                   CAST(SUM(CAST(s_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS supp_bal
            FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(cb.nationkey, sb.nationkey) AS nationkey,
               cust_bal, supp_bal
        FROM cb FULL OUTER JOIN sb ON cb.nationkey = sb.nationkey
        ORDER BY nationkey
    """,
    description="Full outer join of two aggregates (nations with only "
    "customers or only suppliers keep NULLs).",
)
def full_outer_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.sum(dec("c_acctbal")).cast("double").alias("cust_bal"))
    )
    sb = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.sum(dec("s_acctbal")).cast("double").alias("supp_bal"))
    )
    return (
        cb.join(sb, "nationkey", "full_outer")
        .select("nationkey", "cust_bal", "supp_bal")
        .orderBy("nationkey")
    )


@query(
    "theta_price_bands",
    oracle="""
        SELECT band, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
        FROM part
        JOIN (VALUES ('low', 900.0, 925.0), ('mid', 925.0, 950.0),
                     ('high', 950.0, 975.0), ('premium', 975.0, 1000.0))
             AS bands(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
        ORDER BY band
    """,
    description="Theta (range-predicate) join against a tiny broadcast band "
    "table — BroadcastNestedLoop on purpose.",
)
def theta_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 925.0), ("mid", 925.0, 950.0), ("high", 950.0, 975.0),
         ("premium", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("total_price"),
        )
        .orderBy("band")
    )


@query(
    "agg_rollup_region_nation",
    oracle="""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    description="ROLLUP grouping-set aggregation over two dim levels.",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@query(
    "agg_cube_flag_status",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="CUBE over returnflag x linestatus.",
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_distinct_suppliers_per_flag",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Exact distinct aggregation (expand + two-phase agg in Spark).",
)
def agg_distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats_orders",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)
                   AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="min/max/sum/avg/count battery per priority class.",
)
def agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice").alias("sum_price"),
            davg("o_totalprice").alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "setop_custkeys_1995_except_1996",
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        ORDER BY o_custkey
    """,
    description="EXCEPT (distinct) set op.",
)
def setop_custkeys_1995_except_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    # subtract = EXCEPT DISTINCT (exceptAll is multiset difference — a
    # key with more 1995 than 1996 orders would wrongly survive it)
    return year(1995).subtract(year(1996)).orderBy("o_custkey")


@query(
    "setop_custkeys_intersect",
    oracle="""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        ORDER BY o_custkey
    """,
    description="INTERSECT set op.",
)
def setop_custkeys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@query(
    "setop_union_ids",
    oracle="""
        SELECT id, COUNT(*) AS n
        FROM (
            SELECT user_id AS id FROM events
            UNION ALL
            SELECT o_custkey AS id FROM orders
        ) u
        GROUP BY id
        ORDER BY id
    """,
    description="UNION ALL + re-aggregation across heterogeneous sources.",
)
def setop_union_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    return (
        events.unionByName(orders)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("id")
    )


@query(
    "scalar_string_date_math",
    oracle="""
        SELECT o_orderkey,
               upper(substr(o_orderpriority, 3)) AS priority_word,
               length(o_orderpriority) AS prio_len,
               concat(CAST(o_custkey AS VARCHAR), '-', CAST(o_orderkey AS VARCHAR))
                   AS order_tag,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kilo,
               abs(o_totalprice - 250000.0) AS dist_from_250k
        FROM orders
        WHERE o_orderkey < 1000
        ORDER BY o_orderkey
    """,
    description="Scalar-function battery: string, date-part, arithmetic "
    "(SURVEY.md §2.6).",
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("priority_word"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat(
            F.col("o_custkey").cast("string"), F.lit("-"), F.col("o_orderkey").cast("string")
        ).alias("order_tag"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_kilo"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_from_250k"),
    ).orderBy("o_orderkey")


@query(
    "json_events_props",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Semi-structured access: JSON path extraction + typed "
    "filter/agg (get_json_object; SURVEY.md §2.6 from_json target).",
)
def json_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.withColumn("k_val", k)
        .filter(F.col("k_val") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").alias("sum_k"),
            F.min("k_val").alias("min_k"),
            F.max("k_val").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "pivot_segment_status",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Pivot (orderstatus -> columns) per market segment.",
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pivoted = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    return pivoted.select(
        "c_mktsegment",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    ).orderBy("c_mktsegment")
