"""Coverage tail: disjunctive predicates (TPC-H Q19 shape), value window
functions, distribution window functions, boolean aggregates, and the
string/math scalar batteries (exactly-rounded functions only — see
``math_function_battery`` for why exp/ln are deliberately absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query, sql_dsum


@query(
    "q19_disjunctive_filter",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice')} AS revenue, COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 25)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
    """,
    description="TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across "
    "both join sides (tests predicate normalization + partial pushdown).",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "window_value_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice) OVER w AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
               NTILE(4) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS quartile,
               round(PERCENT_RANK() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), 9) AS pct_rank,
               round(CUME_DIST() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), 9) AS cume
        FROM orders
        WHERE o_custkey < 25
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
        ORDER BY o_custkey, o_orderkey
    """,
    description="Value + distribution window functions over an explicit "
    "full-partition frame (first/last/nth deterministic by construction).",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 25)
    order_spec = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = order_spec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(full).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.ntile(4).over(order_spec).alias("quartile"),
        F.round(F.percent_rank().over(order_spec), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(order_spec), 9).alias("cume"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "bool_aggregates",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_discount <= 0.1) AS all_low_discount,
               bool_or(l_quantity >= 49) AS any_bulk,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Boolean aggregates (bool_and / bool_or).",
)
def bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_discount"),
            F.bool_or(F.col("l_quantity") >= 49).alias("any_bulk"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "string_function_battery2",
    oracle="""
        SELECT p_partkey,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
               reverse(p_brand) AS rev_brand,
               translate(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
               left(p_name, 5) AS name_prefix,
               right(p_name, 3) AS name_suffix,
               replace(p_brand, 'Brand#', 'B-') AS short_brand,
               split_part(p_type, ' ', 1) AS type_head
        FROM part
        WHERE p_partkey < 100
        ORDER BY p_partkey
    """,
    description="Second string battery: pad, reverse, translate, left/"
    "right, replace, split_part.",
)
def string_function_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("rev_brand"),
        F.translate("p_type", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.substring(F.col("p_name"), -3, 3).alias("name_suffix"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B-")).alias("short_brand"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    ).orderBy("p_partkey")


@query(
    "math_function_battery",
    oracle="""
        SELECT o_orderkey,
               sqrt(o_totalprice) AS sqrt_price,
               abs(o_totalprice - 250000.0) AS abs_dist,
               CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sign_dist,
               CAST(o_orderkey % 7 AS BIGINT) AS mod7,
               CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_kilo_ceil,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kilo_floor,
               round(o_totalprice / 3.0, 2) AS third
        FROM orders
        WHERE o_orderkey < 300
        ORDER BY o_orderkey
    """,
    description="Math battery restricted to IEEE exactly-rounded ops "
    "(sqrt/abs/sign/mod/ceil/floor; exp/ln/pow are NOT correctly-rounded "
    "and may differ 1 ulp between JVM Math and libm — deliberately "
    "excluded from hash-checked queries).",
)
def math_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.sqrt(d).alias("sqrt_price"),
        F.abs(d - 250000.0).alias("abs_dist"),
        F.signum(d - 250000.0).alias("sign_dist"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("mod7"),
        F.ceil(d / 1000).cast("bigint").alias("price_kilo_ceil"),
        F.floor(d / 1000).cast("bigint").alias("price_kilo_floor"),
        F.round(d / 3.0, 2).alias("third"),
    ).orderBy("o_orderkey")
