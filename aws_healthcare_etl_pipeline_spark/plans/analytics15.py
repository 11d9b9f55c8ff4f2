"""Wave-21: sketch-surface coverage — exact distinct via bucketed
bitmaps, mergeable HLL rollups (the re-aggregatable form
approx_count_distinct lacks), and a Benford first-digit audit.

Oracle strategy: bitmap and HLL binary sketches can't cross engines,
so the bitmap query outputs the exact COUNT DISTINCT it reproduces
(value-identical to the oracle's COUNT(DISTINCT)), and the HLL query
outputs the exact companion plus a self-graded tolerance boolean —
the same structural-oracle pattern as the ANN queries. Benford uses
integer-cents string digits (no log/pow on the data path) and embeds
the Benford expected probabilities as IDENTICAL literals in both
engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# log10(1 + 1/d) for d = 1..9, as repr'd doubles shared by both sides
BENFORD_P = [math.log10(1 + 1 / d) for d in range(1, 10)]


@query(
    "agg_bitmap_distinct",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Exact distinct counting via Spark's bitmap aggregate "
    "surface (bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_count): keys bucket into 32k-bit "
    "bitmaps, partial aggregation ORs fixed-size bitmaps instead of "
    "shuffling every distinct key, and the final count is a sum of "
    "per-bucket popcounts. Same answer as COUNT(DISTINCT) — the "
    "oracle — at a fraction of the shuffle width when keys repeat "
    "heavily. The two-level groupBy reuses the segment partitioning.",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    per_bucket = cust.groupBy(
        "c_mktsegment",
        F.expr("bitmap_bucket_number(c_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(c_custkey))").alias("bm")
    )
    return (
        per_bucket.groupBy("c_mktsegment")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "approx_hll_mergeable",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', ts) AS m, user_id FROM events
        )
        SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS n_month_sketches,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total_users,
               TRUE AS hll_within_5pct
        FROM monthly
    """,
    description="Mergeable distinct sketches: one HLL sketch per month "
    "(hll_sketch_agg), unioned with hll_union_agg into a total-period "
    "estimate — the re-aggregatable rollup approx_count_distinct "
    "cannot do (its partials aren't exposed). This is how a 100 TB "
    "daily rollup serves monthly/quarterly uniques without re-reading "
    "raw data. Sketch bytes aren't engine-portable, so the query "
    "emits the exact companion plus a self-graded 5% tolerance "
    "boolean (HLL lgK=12 standard error ~1.6%); the oracle pins the "
    "exact values and the flag.",
)
def approx_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    monthly = events.select(
        F.date_trunc("month", F.col("ts")).alias("m"), "user_id"
    )
    sketches = monthly.groupBy("m").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    merged = sketches.agg(
        F.count(F.lit(1)).alias("n_month_sketches"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    exact = monthly.agg(F.count_distinct("user_id").alias("exact_total_users"))
    return merged.crossJoin(exact).select(
        "n_month_sketches",
        "exact_total_users",
        (
            F.abs(F.col("est") - F.col("exact_total_users"))
            <= 0.05 * F.col("exact_total_users")
        ).alias("hll_within_5pct"),
    )


@query(
    "audit_benford_first_digit",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                                     AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
            FROM orders
        ), obs AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
        ), tot AS (SELECT SUM(n) AS total FROM obs)
        SELECT d, n,
               CAST(total AS DOUBLE) *
                 CASE d {' '.join(f"WHEN {i + 1} THEN {p!r}" for i, p in enumerate(BENFORD_P))} END
                   AS expected,
               (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) *
                 CASE d {' '.join(f"WHEN {i + 1} THEN {p!r}" for i, p in enumerate(BENFORD_P))} END)
               / sqrt(CAST(total AS DOUBLE) *
                 CASE d {' '.join(f"WHEN {i + 1} THEN {p!r}" for i, p in enumerate(BENFORD_P))} END)
                   AS std_residual
        FROM obs, tot
        ORDER BY d
    """,
    description="Benford's-law first-digit audit (the classic "
    "fabricated-data screen): first digits come from the integer-cents "
    "STRING (exact; no log/pow touches data), expected counts from "
    "log10(1+1/d) literals repr'd identically into both engines, and "
    "each digit gets its standardized residual (obs-exp)/sqrt(exp) — "
    "same double expression tree both sides. One groupBy on 9 keys "
    "plus a broadcast 1-row total.",
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p = F.col("d")
    expected_factor = F.when(p == 1, F.lit(BENFORD_P[0]))
    for i in range(1, 9):
        expected_factor = expected_factor.when(p == i + 1, F.lit(BENFORD_P[i]))
    exp_c = F.col("total").cast("double") * expected_factor
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            exp_c.alias("expected"),
            ((F.col("n").cast("double") - exp_c) / F.sqrt(exp_c)).alias("std_residual"),
        )
        .orderBy("d")
    )


@query(
    "concurrency_sweepline_daily",
    oracle="""
        WITH pts AS (
            SELECT ts AS t, 1 AS delta, event_id FROM events
            UNION ALL
            SELECT ts + INTERVAL 30 MINUTE, -1, event_id FROM events
        ), swept AS (
            SELECT t, delta,
                   SUM(delta) OVER (ORDER BY t, delta, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS live
            FROM pts
        )
        SELECT CAST(t AS DATE)::TIMESTAMP AS day,
               CAST(MAX(live) AS BIGINT) AS max_concurrent
        FROM swept
        WHERE delta = 1
        GROUP BY 1
        ORDER BY day
    """,
    description="Sweep-line concurrency: each event opens a 30-minute "
    "presence interval [ts, ts+30m); +1/-1 endpoint deltas are swept "
    "in (t, delta, event_id) order — ends sort before starts at equal "
    "t, matching the half-open interval — and the running sum at each "
    "START is the live concurrency, maxed per day. The classic "
    "max-overlap shape (rooms/connections/sessions) with no join: one "
    "union, one prefix sum — computed by the two-level decomposition "
    "(operators/cumsum.py, r3): day-bucket delta sums, carry-in over "
    "the bounded day spine, day-PARTITIONED within-bucket windows. "
    "The endpoint-grain frame never funnels through one task (r2 ran "
    "the textbook single-partition sweep; the oracle still IS that "
    "form, so the hash match proves the decomposition equal). "
    "day = date(t) is monotone in t, so (day, t, delta, event_id) "
    "order equals the global (t, delta, event_id) order.",
)
def concurrency_sweepline_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cumsum import distributed_running_total

    events = load_table(spark, sf_dir, "events")
    starts = events.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = events.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionByName(ends).withColumn("_day", F.col("t").cast("date"))
    swept = distributed_running_total(
        pts,
        value=F.col("delta").cast("bigint"),
        bucket_col="_day",
        order_cols=["t", "delta", "event_id"],
        out_col="live",
        zero=F.lit(0).cast("bigint"),
    )
    return (
        swept.filter(F.col("delta") == 1)
        .groupBy(F.col("_day").cast("timestamp").alias("day"))
        .agg(F.max("live").alias("max_concurrent"))
        .orderBy("day")
    )


@query(
    "approx_theta_set_algebra",
    oracle="""
        WITH a AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
             b AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
                    AS BIGINT) AS exact_union,
               CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
                    AS BIGINT) AS exact_intersect,
               TRUE AS union_within_5pct,
               TRUE AS intersect_within_10pct
    """,
    description="Distinct-set ALGEBRA via theta sketches (Spark 4 "
    "theta_sketch_agg / theta_union / theta_intersection): 1995 and "
    "1996 buyer sets sketch independently, and union/intersection "
    "cardinalities come from sketch combination — the question "
    "mergeable HLL cannot answer (HLL unions but never intersects). "
    "At 100 TB this serves audience-overlap queries from per-segment "
    "sketches without re-scanning raw data. Estimates self-grade "
    "against in-plan exact counts (5%/10% — intersections carry "
    "compounded error); sketch bytes aren't engine-portable, so the "
    "oracle pins exact counts and the grade flags.",
)
def approx_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    sk = (
        y95.agg(F.expr("theta_sketch_agg(o_custkey)").alias("sa"))
        .crossJoin(y96.agg(F.expr("theta_sketch_agg(o_custkey)").alias("sb")))
        .select(
            F.expr("theta_sketch_estimate(sa)").alias("est_a"),
            F.expr("theta_sketch_estimate(sb)").alias("est_b"),
            F.expr("theta_sketch_estimate(theta_union(sa, sb))").alias("est_union"),
            F.expr("theta_sketch_estimate(theta_intersection(sa, sb))").alias(
                "est_intersect"
            ),
        )
    )
    exact = (
        y95.distinct().agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(y96.distinct().agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(
            y95.union(y96).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        )
        .crossJoin(
            y95.distinct()
            .intersect(y96.distinct())
            .agg(F.count(F.lit(1)).alias("exact_intersect"))
        )
    )
    return exact.crossJoin(sk).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersect",
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            <= 0.05 * F.col("exact_union")
        ).alias("union_within_5pct"),
        (
            F.abs(F.col("est_intersect") - F.col("exact_intersect"))
            <= 0.10 * F.col("exact_intersect")
        ).alias("intersect_within_10pct"),
    )
