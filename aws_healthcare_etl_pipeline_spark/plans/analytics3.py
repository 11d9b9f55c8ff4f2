"""Wave-7 analytics: fuzzy string matching, time-hierarchy OLAP
rollup, co-occurrence mining, histogram binning.

  fuzzy_name_matches      blocked levenshtein self-join (entity
                          resolution / fuzzy dedup on short strings)
  time_hierarchy_rollup   year > quarter > month ROLLUP in one pass
  basket_part_pairs       market-basket pair co-occurrence support
  price_histogram         equi-width histogram via arithmetic binning

Oracle conventions follow plans/registry.py (exact decimal sums, one
double division at the end, deterministic orderings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.editdist import edit_distance_candidates
from ..sources.tables import load_table
from .registry import dec, query, sql_dsum

MAX_EDIT_DISTANCE = 2


@query(
    "fuzzy_name_matches",
    oracle=f"""
        SELECT a.c_nationkey AS nationkey,
               COUNT(*) AS n_pairs,
               CAST(SUM(levenshtein(a.c_name, b.c_name)) AS BIGINT)
                   AS total_distance
        FROM customer a
        JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= {MAX_EDIT_DISTANCE}
        GROUP BY a.c_nationkey
        ORDER BY nationkey
    """,
    description="Fuzzy self-match on customer names at levenshtein "
    "distance <= 2, per-nation pair counts. Candidates come from "
    "symmetric-delete blocking (operators/editdist.py): strings "
    "within distance 2 must share a <= 2-deletion variant, and "
    "variant cardinality scales with the number of distinct names — "
    "unlike the naive (nation, segment) blocking whose 125 constant "
    "cells leave block sizes O(N) and pair counts O(N^2), the "
    "deferred-quadratic 100 TB anti-pattern (and unlike q-gram "
    "blocking, which caps at |charset|^q blocks on these zero-padded "
    "digit names). (nation, segment) equality stays as a residual "
    "predicate, and the verify is the threshold-bounded levenshtein: "
    "Spark's banded DP early-exits once the distance provably "
    "exceeds the bound and returns -1, so the hot filter is O(len*k) "
    "per pair instead of O(len^2). Spark levenshtein == DuckDB "
    "levenshtein (unit-cost edits); blocking is provably lossless "
    "for distance <= 2, so the all-pairs oracle sees the identical "
    "pair set.",
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    cand = edit_distance_candidates(
        cust,
        id_col="c_custkey",
        str_col="c_name",
        k=MAX_EDIT_DISTANCE,
        # nation+segment equality folded into the blocking key: on
        # sequential zero-padded names the attribute restriction is a
        # 125x candidate reducer, so it must gate generation, not
        # post-filter
        block_cols=("c_nationkey", "c_mktsegment"),
    )
    pairs = cand.select(
        F.col("a_c_nationkey").alias("nationkey"),
        F.levenshtein(
            F.col("a_c_name"), F.col("b_c_name"), MAX_EDIT_DISTANCE
        ).alias("dist"),
    )
    return (
        pairs.filter(F.col("dist") >= 0)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("dist").cast("bigint").alias("total_distance"),
        )
        .orderBy("nationkey")
    )


@query(
    "time_hierarchy_rollup",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(month(o_orderdate) AS INT) AS mon,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY ROLLUP (yr, qtr, mon)
        ORDER BY yr NULLS FIRST, qtr NULLS FIRST, mon NULLS FIRST
    """,
    description="Calendar-hierarchy ROLLUP (year > quarter > month) "
    "over two years of orders in ONE aggregation pass — month totals, "
    "quarter and year subtotals, and the grand total come from the "
    "same shuffle (Expand x4), not four scans. Exact decimal revenue.",
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.month("o_orderdate").cast("int").alias("mon"),
            "o_totalprice",
        )
        .rollup("yr", "qtr", "mon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("yr").asc_nulls_first(),
            F.col("qtr").asc_nulls_first(),
            F.col("mon").asc_nulls_first(),
        )
    )


# the fixture's part space is wide relative to basket count, so pair
# support tops out at 3-5 across scale factors; 2 keeps the result
# populated at every sf (driver checks sf0.01, bench runs sf0.1)
MIN_SUPPORT = 2


@query(
    "basket_part_pairs",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING COUNT(*) >= {MIN_SUPPORT}
        ORDER BY support DESC, part_a, part_b
        LIMIT 20
    """,
    description="Market-basket co-occurrence: part pairs appearing in "
    "the same order, min-support filtered, top-20. The self-join is "
    "keyed on l_orderkey, so pair expansion is bounded by basket size "
    "squared per order (baskets are ~4 items) — never a global cross "
    "product; the (part_a, part_b) aggregation is the only wide "
    "shuffle. The frequent-itemset generation primitive (FP-growth's "
    "first pass).",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(20)
    )


N_BINS = 20
PRICE_LO = 0.0
PRICE_HI = 600_000.0


@query(
    "price_histogram",
    oracle=f"""
        SELECT LEAST(CAST(floor((o_totalprice - {PRICE_LO})
                          / (({PRICE_HI} - {PRICE_LO}) / {N_BINS}))
                          AS INT), {N_BINS - 1}) AS bin,
               COUNT(*) AS n_orders,
               round(MIN(o_totalprice), 2) AS bin_min,
               round(MAX(o_totalprice), 2) AS bin_max,
               {sql_dsum('o_totalprice')} AS bin_revenue
        FROM orders
        GROUP BY bin
        ORDER BY bin
    """,
    description="Equi-width histogram of order totals (20 fixed bins, "
    "top bin clamped): arithmetic binning is a pure projection, so the "
    "histogram is one map-side-combinable aggregation — no sort, no "
    "percentile pass. Per-bin count, observed min/max, exact decimal "
    "revenue.",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    width = (PRICE_HI - PRICE_LO) / N_BINS
    bin_col = F.least(
        F.floor((F.col("o_totalprice") - PRICE_LO) / width).cast("int"),
        F.lit(N_BINS - 1),
    ).alias("bin")
    return (
        orders.groupBy(bin_col)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
            F.sum(dec("o_totalprice")).cast("double").alias("bin_revenue"),
        )
        .orderBy("bin")
    )
