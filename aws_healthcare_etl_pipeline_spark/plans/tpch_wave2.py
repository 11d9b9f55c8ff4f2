"""Second TPC-H wave (SURVEY.md §2 relational completion): Q8 market
share, Q13 order-count distribution, Q15 top supplier (subquery-max),
Q17 small-quantity revenue (correlated avg subquery), Q18 large-volume
customers (IN-subquery over a grouped HAVING) — adapted to the
fixture's slimmed schemas (no partsupp/phone/receiptdate columns, so
Q2/Q9/Q11/Q16/Q20-Q22 have no faithful rendition; these five cover the
remaining JOIN/subquery shapes).

All money sums follow the exact DECIMAL(15,2) convention from
plans/registry.py so hashes are engine- and order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import SQL_DISC_PRICE, dec, disc_price, query

SHARE_NATION = "NATION_7"  # an ASIA nation: market-share numerator


@query(
    "q8_market_share",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN sn.n_name = '{SHARE_NATION}'
                             THEN {SQL_DISC_PRICE}
                             ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE)
               / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY o_year
    """,
    description="TPC-H Q8 (market share): two-role nation join — the "
    "supplier nation's share of revenue delivered into ASIA customers "
    "per year. Exact decimal numerator/denominator, double ratio.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
    )
    zero = F.lit(0).cast("decimal(15,2)")
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == SHARE_NATION, disc_price())
                    .otherwise(zero)
                ).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderstatus <> 'F'
            GROUP BY c_custkey
        ) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13: customer order-count distribution — LEFT "
    "join with an extra join-side predicate (not a WHERE filter), "
    "double aggregation. Zero-order customers must appear in the "
    "c_count=0 bucket.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    description="TPC-H Q15: top supplier by quarterly revenue via a "
    "scalar MAX subquery over a derived revenue view (ties all kept).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(disc_price()).cast("double").alias("total_revenue"))
    )
    # max-with-ties via a 1-row aggregate broadcast back onto the
    # revenue frame (r3): rank() over an unpartitioned window funnels
    # the whole supplier-grain aggregate through one task; the
    # max+filter form is two parallel passes and keeps ties exactly
    # (equality of identical doubles)
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
        WITH target AS (
            SELECT p_partkey FROM part
            WHERE p_brand = 'Brand#11' AND p_size < 15
        ), avgq AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
            FROM lineitem JOIN target ON l_partkey = p_partkey
            GROUP BY l_partkey
        )
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN target ON l_partkey = p_partkey
        JOIN avgq   ON lineitem.l_partkey = avgq.l_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
    description="TPC-H Q17: small-quantity order revenue — correlated "
    "per-part AVG subquery (planned as an aggregate + self-join, the "
    "scalable decorrelation) with exact decimal sums on both sides of "
    "the comparison.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 15)
    )
    target = F.broadcast(part.select("p_partkey"))
    li_t = li.join(target, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = li_t.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li_t.join(F.broadcast(avgq), li_t.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
                   AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    description="TPC-H Q18 (large-volume customers): IN-subquery over a "
    "grouped HAVING on the fact table itself, planned as an aggregate + "
    "left-semi join (the scalable decorrelation — no correlated "
    "re-scan), then the 3-way star join and top-100. o_orderkey "
    "tie-break keeps the LIMIT deterministic across engines.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "scd2_customer_balance_history",
    oracle="""
        WITH changed AS (
            SELECT DISTINCT c_custkey FROM customer
            JOIN orders ON o_custkey = c_custkey
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        ), versions AS (
            -- unchanged keys: the original open row
            SELECT c_mktsegment, c_acctbal, TRUE AS is_current
            FROM customer
            WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
            UNION ALL
            -- changed keys: closed original + new open version
            SELECT c_mktsegment, c_acctbal, FALSE
            FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
            UNION ALL
            SELECT c_mktsegment, round(c_acctbal + 100.0, 2), TRUE
            FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_versions,
               CAST(SUM(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_current,
               CAST(SUM(CASE WHEN is_current THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_closed,
               CAST(SUM(CASE WHEN is_current
                             THEN CAST(c_acctbal AS DECIMAL(15,2))
                             ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE)
                   AS current_balance_sum
        FROM versions
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="SCD2 (type-2 slowly-changing dimension) applied to the "
    "customer dimension: customers who ordered in 1997 get a +100.00 "
    "balance revision effective 1997-07-01 — the operator closes the "
    "current version and appends the new one (operators/scd.py, the "
    "MERGE-INTO emulation for plain parquet). Output: per-segment "
    "version/current/closed counts and the exact current balance sum.",
)
def scd2_customer_balance_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed_keys = (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    changes = (
        cust.join(changed_keys, "c_custkey", "left_semi")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
            F.lit("1997-07-01").cast("timestamp").alias("eff"),
        )
    )
    hist = scd2_apply(dim, changes, key="c_custkey", effective_col="eff")
    zero = F.lit(0).cast("decimal(15,2)")
    return (
        hist.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(F.col("is_current").cast("long")).alias("n_current"),
            F.sum((~F.col("is_current")).cast("long")).alias("n_closed"),
            F.sum(
                F.when(
                    F.col("is_current"), F.col("c_acctbal").cast("decimal(15,2)")
                ).otherwise(zero)
            )
            .cast("double")
            .alias("current_balance_sum"),
        )
        .orderBy("c_mktsegment")
    )
