"""Wave-163 (round 5): per-key sequential DP + ranking under
uncertainty.

* ``seq_lis_per_customer`` — longest strictly-increasing subsequence
  of each customer's order-value sequence, the canonical order-
  sensitive recurrence. Spark side runs the O(n log n) patience
  algorithm inside ``keyed_pandas_scan`` (ONE mapInPandas pass per
  partition with cross-batch group carry — the measured 10-100x win
  over per-group applyInPandas); the DuckDB oracle proves it against
  the textbook chain-extension DP as a recursive CTE (state =
  (customer, position, value, length), UNION-deduped). The hash match
  certifies the scan operator end to end on a new recurrence.

* ``rank_wilson_lower_bound`` — "sort by rating" done right: rank
  part brands by return rate vs by the Wilson-score LOWER bound
  (z = 2), the standard fix for small-sample rate ranking. The bound
  is quantized integer algebra: one floor(IEEE sqrt) on the million-
  scaled radicand (< 2^53 at sf1000) plus truncating divs, identical
  in both engines; the query emits both rankings and the shift.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import query


@query(
    "seq_lis_per_customer",
    oracle="""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT o_custkey AS ck,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS i,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), chains AS (
            SELECT ck, i, v, 1 AS len FROM s
            UNION
            SELECT s.ck, s.i, s.v, c.len + 1
            FROM chains c
            JOIN s ON s.ck = c.ck AND s.i > c.i AND s.v > c.v
        ), lis AS (
            SELECT ck, MAX(len) AS lis_len FROM chains GROUP BY ck
        )
        SELECT CAST(lis_len AS BIGINT) AS lis_len,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM lis GROUP BY lis_len ORDER BY lis_len
    """,
    description="Longest strictly-increasing subsequence of each "
    "customer's order-value sequence (date order, cents-exact): the "
    "canonical order-sensitive recurrence that no window function "
    "expresses. Runs the O(n log n) patience algorithm inside "
    "keyed_pandas_scan — one repartition(key) + sortWithinPartitions "
    "+ a single mapInPandas pass per partition with cross-batch "
    "group carry, the measured 10-100x win over per-group "
    "applyInPandas Arrow exchanges. The oracle replays the textbook "
    "chain-extension DP as a recursive CTE (state = (customer, pos, "
    "value, len), UNION-dedup), so the hash match certifies the scan "
    "operator on a new recurrence. 100 TB shape: one shuffle on the "
    "key, per-key sequential work (the information-theoretic minimum "
    "for LIS), parallel across partitions, histogram output — the "
    "escalating-spend / growing-document-length detector.",
)
def seq_lis_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("ok"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        import bisect

        tails: list[int] = []
        for v in g["v"]:
            j = bisect.bisect_left(tails, int(v))
            if j == len(tails):
                tails.append(int(v))
            else:
                tails[j] = int(v)
        return pd.DataFrame(
            {"ck": [g["ck"].iloc[0]], "lis_len": [len(tails)]}
        )

    lis = keyed_pandas_scan(
        seq,
        key="ck",
        order=["d", "ok"],
        per_group=per_group,
        out_schema="ck long, lis_len long",
    )
    return (
        lis.groupBy("lis_len")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("lis_len")
    )


@query(
    "rank_wilson_lower_bound",
    oracle="""
        WITH rates AS (
            SELECT p.p_brand AS brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        ), bounds AS (
            SELECT brand, n, k,
                   k * 1000 // n AS naive_pm,
                   ((k + 2) * 1000
                    - 2 * CAST(FLOOR(SQRT(CAST(
                          1000000 * ((k * (n - k)) // n + 1)
                          AS DOUBLE))) AS BIGINT))
                   // (n + 4) AS wilson_pm
            FROM rates
        ), ranked AS (
            SELECT brand, n, k, naive_pm, wilson_pm,
                   CAST(ROW_NUMBER() OVER (ORDER BY naive_pm DESC,
                        brand) AS BIGINT) AS rank_naive,
                   CAST(ROW_NUMBER() OVER (ORDER BY wilson_pm DESC,
                        brand) AS BIGINT) AS rank_wilson
            FROM bounds
        )
        SELECT brand, n, k, naive_pm, wilson_pm, rank_naive,
               rank_wilson,
               rank_naive - rank_wilson AS rank_shift
        FROM ranked
        ORDER BY brand
    """,
    description="Ranking under uncertainty: part brands ordered by "
    "raw return rate vs by the Wilson-score LOWER confidence bound "
    "(z = 2, the 'sort by rating' fix that stops tiny-sample rates "
    "from topping the chart). The bound is exact quantized algebra: "
    "LB_permille = ((k+2)*1000 - 2*floor(sqrt(1e6*((k(n-k) div n)+1)"
    ")))) div (n+4) — ONE floor(IEEE-correct sqrt) on an integer "
    "radicand quantized BEFORE the million-scaling so every "
    "intermediate stays in int64 at sf1000, truncating divs "
    "elsewhere, so both engines emit the identical bound and "
    "identical rank shift. 100 TB shape: one join-agg to brand "
    "grain (partial-agg friendly), then bounded-row arithmetic on "
    "25 brands; the leaderboard-integrity pattern for review "
    "scores, defect rates, and model win-rates.",
)
def rank_wilson_lower_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rates = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    bounds = rates.select(
        "brand",
        "n",
        "k",
        F.expr("k * 1000 div n").alias("naive_pm"),
        F.expr(
            "((k + 2) * 1000"
            " - 2 * CAST(FLOOR(SQRT(CAST("
            "       1000000 * ((k * (n - k)) div n + 1)"
            "       AS DOUBLE))) AS BIGINT))"
            " div (n + 4)"
        ).alias("wilson_pm"),
    )
    rn = Window.orderBy(F.col("naive_pm").desc(), F.col("brand"))
    rv = Window.orderBy(F.col("wilson_pm").desc(), F.col("brand"))
    return (
        bounds.withColumn(
            "rank_naive", F.row_number().over(rn).cast("long")
        )
        .withColumn("rank_wilson", F.row_number().over(rv).cast("long"))
        .withColumn(
            "rank_shift", F.col("rank_naive") - F.col("rank_wilson")
        )
        .orderBy("brand")
    )
