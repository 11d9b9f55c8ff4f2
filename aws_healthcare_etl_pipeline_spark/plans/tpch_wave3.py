"""Wave-17: the remaining classic TPC-H plan shapes the fixture schema
can express — Q21's double-correlated EXISTS/NOT-EXISTS, Q2's
correlated-min scalar subquery, Q11's HAVING-vs-global-scalar, Q16's
NOT-IN supplier exclusion with COUNT DISTINCT, and Q20's
dominant-share nested aggregation.

The fixture has no ``partsupp`` table and lineitem carries no
commit/receipt dates, so each query keeps the ORIGINAL query's plan
shape (the part Catalyst must de-correlate / the aggregation nesting)
re-keyed onto available columns; the headers note the mapping.

Scale notes: every correlated subquery is expressed as an explicit
semi/anti or aggregate-join (what Catalyst would rewrite to anyway),
dims (supplier/part/nation) broadcast, and global scalars arrive via a
broadcast 1-row aggregate instead of a window-over-() full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query


@query(
    "q21_sole_late_supplier",
    oracle="""
        WITH late AS (
            SELECT l.l_suppkey, l.l_orderkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    description="TPC-H Q21 shape (suppliers who kept orders waiting): "
    "the fixture has no commit/receipt dates, so 'late' is shipped "
    ">365 days after the order date on a finished order. Correlated "
    "EXISTS (another supplier touched the order) + NOT EXISTS (no "
    "OTHER supplier was also late) become one left-semi and one "
    "left-anti join against the same `late` relation, both keyed on "
    "l_orderkey with a non-equi suppkey<>suppkey residual — the exact "
    "de-correlation Catalyst performs for Q21. `late` is computed once "
    "and reused; supplier is a broadcast dim.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = load_table(spark, sf_dir, "supplier")

    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select("l_suppkey", "l_orderkey")
    )

    l1 = late.alias("l1")
    l2 = li.alias("l2")
    l3 = late.alias("l3")
    sole_late = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supplier), F.col("l1.l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q2_shaped_cheapest_supplier",
    oracle="""
        WITH mp AS (
            SELECT l_partkey AS pk, MIN(l_extendedprice) AS min_price
            FROM lineitem GROUP BY 1
        )
        SELECT DISTINCT s_name, p_name, l.l_extendedprice AS min_price
        FROM lineitem l
        JOIN mp ON l.l_partkey = mp.pk AND l.l_extendedprice = mp.min_price
        JOIN supplier ON s_suppkey = l.l_suppkey
        JOIN part ON p_partkey = l.l_partkey
        WHERE p_size >= 20
        ORDER BY min_price, p_name, s_name
        LIMIT 100
    """,
    description="TPC-H Q2 shape (min-cost supplier): no partsupp table, "
    "so the correlated scalar subquery MIN(ps_supplycost) becomes "
    "MIN(l_extendedprice) per part over lineitem; the join-back on "
    "(partkey, price = min) is the standard de-correlation into an "
    "aggregate + equi-join. DISTINCT collapses a supplier hitting the "
    "min on several lines; the (price, p_name, s_name) sort is a total "
    "order so LIMIT 100 is deterministic. Double equality is safe: "
    "both engines compare the identical parquet-read bit patterns.",
)
def q2_shaped_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)

    mp = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(mp, (li.l_partkey == mp.pk) & (li.l_extendedprice == mp.min_price))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("s_name", "p_name", F.col("l_extendedprice").alias("min_price"))
        .distinct()
        .orderBy("min_price", "p_name", "s_name")
        .limit(100)
    )


@query(
    "q11_shaped_high_value_parts",
    oracle="""
        WITH pv AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                       * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS v
            FROM lineitem GROUP BY 1
        ), tot AS (SELECT SUM(v) AS tv, COUNT(*) AS np FROM pv)
        SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
        FROM pv, tot
        WHERE 5 * np * v > 6 * tv
        ORDER BY part_value DESC, l_partkey
    """,
    description="TPC-H Q11 shape (important stock): no partsupp, so a "
    "part's 'value' is its exact-decimal discounted lineitem revenue; "
    "the HAVING-vs-global-scalar-subquery becomes a broadcast 1-row "
    "aggregate joined back, with the >1.2x-mean threshold expressed as "
    "the integer cross-multiplication 5*np*v > 6*tv — exact decimal "
    "arithmetic on both engines, no float fraction to diverge on. One "
    "shuffle (the per-part agg); the scalar is broadcast, not a "
    "window-over-() re-shuffle.",
)
def q11_shaped_high_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,2)"))).alias("v")
    )
    tot = pv.agg(F.sum("v").alias("tv"), F.count(F.lit(1)).alias("np"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.lit(5) * F.col("np") * F.col("v") > F.lit(6) * F.col("tv"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q16_shaped_supplier_diversity",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500.0
        )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="TPC-H Q16 shape (supplier diversity per part attrs): "
    "COUNT(DISTINCT supplier) per (brand, type, size), excluding a "
    "NOT-IN supplier subquery (low-balance suppliers standing in for "
    "Q16's complaint filter; s_acctbal has no NULLs — fixture-checked "
    "— so NOT IN's null trap can't fire and anti-join semantics "
    "coincide). Spark plans the NOT IN as a broadcast left-anti join "
    "before the distinct-agg, so excluded rows never enter the "
    "two-phase distinct shuffle.",
)
def q16_shaped_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1500.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_shaped_dominant_supplier",
    oracle="""
        WITH per AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ), tot AS (
            SELECT l_partkey, SUM(q) AS tq, COUNT(*) AS ns
            FROM per GROUP BY 1
        )
        SELECT s_name, n_name, COUNT(*) AS n_parts_dominated
        FROM per
        JOIN tot USING (l_partkey)
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE ns > 1 AND 2 * q > tq
        GROUP BY 1, 2
        ORDER BY n_parts_dominated DESC, s_name
    """,
    description="TPC-H Q20 shape (excess-stock suppliers): availqty > "
    "half-of-shipped becomes 'supplier shipped >50% of a contested "
    "part's 1997 volume'. The nested aggregation (per part+supplier, "
    "then per part) reuses the first shuffle's partitioning for the "
    "second agg; the >50% test is the integer comparison 2*q > tq on "
    "exact decimals. supplier+nation broadcast at the end, after the "
    "data is already one row per (part, supplier).",
)
def q20_shaped_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("q")
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum("q").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    return (
        per.join(tot, "l_partkey")
        .filter((F.col("ns") > 1) & (F.lit(2) * F.col("q") > F.col("tq")))
        .join(F.broadcast(supplier), per.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
        .orderBy(F.desc("n_parts_dominated"), "s_name")
    )
