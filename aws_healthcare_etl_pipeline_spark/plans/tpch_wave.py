"""Classic TPC-H query shapes adapted to the fixture schema — each is a
distinct plan pattern the engine must handle well at scale (SURVEY.md
§2.3-2.5 [EXT]); all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import SQL_DISC_PRICE, dec, disc_price, query


@query(
    "q4_order_priority_check",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="TPC-H Q4: correlated EXISTS with a cross-column predicate "
    "-> left-semi join, then priority counts.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                        * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan-filter-aggregate; every predicate must "
    "reach the parquet scan.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", "decimal(8,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="TPC-H Q10: who returned the most revenue — multi-join, "
    "group on customer, global top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle="""
        SELECT l_linestatus,
               COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                   AS high_line_count,
               COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                   AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    description="TPC-H Q12 shape: join + CASE-bucketed conditional counts.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_share",
    oracle=f"""
        SELECT CAST(
                 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN {SQL_DISC_PRICE}
                                       ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE)
                 / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE)
               AS DOUBLE) AS promo_revenue_pct,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    description="TPC-H Q14: promo revenue share — conditional decimal sums "
    "ratioed in double.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    promo = F.col("p_type").like("PROMO%")
    dp = disc_price()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(promo, dp).otherwise(F.lit(0).cast("decimal(15,2)")))
                .cast("double")
                / F.sum(dp).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "pipeline_training_data_prep",
    oracle="""
        WITH norm AS (
            SELECT doc_id, lang, source,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ), keep AS (
            SELECT *, md5(ntext) AS fp,
                   ROW_NUMBER() OVER (PARTITION BY md5(ntext) ORDER BY doc_id) AS rn
            FROM norm
            WHERE n_tokens >= 16 AND lang IN ('en', 'de', 'fr', 'es')
        )
        SELECT lang,
               COUNT(*) AS docs_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
               COUNT(DISTINCT source) AS n_sources
        FROM keep
        WHERE rn = 1
        GROUP BY lang
        ORDER BY lang
    """,
    description="Composite LLM training-data prep pipeline: normalize -> "
    "length & language filters -> exact dedup (keep lowest doc_id) -> "
    "per-language corpus stats. The end-to-end shape a 100 TB text "
    "pipeline runs daily.",
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalize_text, token_count
    from ..operators.dedup import drop_exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    filtered = (
        docs.withColumn("n_tokens", token_count(F.col("text")).cast("bigint"))
        .withColumn("ntext", normalize_text(F.col("text")))
        .filter(
            (F.col("n_tokens") >= 16) & F.col("lang").isin("en", "de", "fr", "es")
        )
    )
    deduped = drop_exact_duplicates(filtered, "text", "doc_id")
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@query(
    "q7_nation_trade_pairs",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name < cn.n_name
        GROUP BY sn.n_name, cn.n_name
        ORDER BY supp_nation, cust_nation
    """,
    description="TPC-H Q7 shape: one dimension (nation) joined under two "
    "roles (supplier's and customer's) with an inter-role predicate.",
)
def q7_nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


@query(
    "agg_variance_exact",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               round(
                   (CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))
                             * CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                    - CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                      * CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                      / COUNT(*))
                   / (COUNT(*) - 1),
               0) AS var_samp_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="Sample variance assembled from EXACT decimal moments "
    "(sum x, sum x^2) so the result is order-insensitive and engine-"
    "portable — the built-in var_samp streams doubles and is neither.",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = dec("o_totalprice")
    n = F.count(F.lit(1))
    sx = F.sum(x).cast("double")
    sxx = F.sum(x * x).cast("double")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            n.alias("n"),
            # rounded to WHOLE units: the variance is ~2e10, so double
            # carries only ~5 fractional digits of absolute precision and
            # the last-ulp divergence of huge decimal->double conversions
            # lands around 1e-4 — far from the 0.5 rounding boundary
            F.round((sxx - sx * sx / n) / (n - F.lit(1)), 0).alias("var_samp_price"),
        )
        .orderBy("o_orderpriority")
    )
