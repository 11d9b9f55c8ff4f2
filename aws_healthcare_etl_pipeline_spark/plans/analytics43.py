"""Wave-69 (round 5): content-addressed integrity + shape-constrained fit.

* ``audit_merkle_month_digests`` — two-level Merkle digests of the
  orders table: per-row content hash -> per-day digest (md5 of the
  sorted row hashes) -> per-month digest (md5 of the day digests in
  day order). The replication-integrity primitive: two replicas
  compare month digests first and drill into day digests only where
  they differ, so verifying 100 TB costs one scan + metadata-sized
  exchange. md5 is the repo's one cross-engine hash; sorting the row
  hashes makes the digest order-insensitive to scan order.
* ``isotonic_regression_exact`` — isotonic (monotone nondecreasing)
  regression of monthly revenue against time, computed EXACTLY via
  the minimax formula fit_i = max_{j<=i} min_{k>=j} avg(y[j..k]):
  prefix-sum rationals (num, den) compared through the IEEE-portable
  int64/int64 double quotient with integer tiebreaks (the Theil-Sen
  device), output floored to millicents. PAVA's sequential
  pool-adjacent scan is replaced by the closed form — O(m^2) pairs on
  the bounded month spine — so no stateful pass exists at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Merkle month digests


@query(
    "audit_merkle_month_digests",
    oracle="""
        WITH rows_h AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   strftime(o_orderdate, '%Y-%m') AS month,
                   md5(CAST(o_orderkey AS VARCHAR) || ':'
                       || CAST(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                               AS BIGINT) AS VARCHAR) || ':'
                       || strftime(o_orderdate, '%Y-%m-%d')) AS h
            FROM orders
        ), days AS (
            SELECT month, day,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   md5(string_agg(h, '' ORDER BY h)) AS day_digest
            FROM rows_h GROUP BY month, day
        )
        SELECT month,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               md5(string_agg(day_digest, '' ORDER BY day)) AS digest
        FROM days GROUP BY month ORDER BY month
    """,
    description="Two-level Merkle digests of the orders table: md5 "
    "row-content hashes folded into per-day digests (sorted-hash "
    "concat, so the digest is invariant to scan order) and day "
    "digests folded into per-month digests in calendar order — the "
    "content-addressed integrity tree replication systems use to "
    "verify a 100 TB table with one scan and a metadata-sized "
    "exchange, drilling into day digests only where month digests "
    "disagree. md5 is the repo's one cross-engine hash; all folds are "
    "partial-agg shuffles at (month, day) then month grain, no "
    "windows, no global sort.",
)
def audit_merkle_month_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rows_h = orders.select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.md5(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                (F.col("o_totalprice").cast("decimal(15,2)") * 100)
                .cast("long")
                .cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            )
        ).alias("h"),
    )
    days = rows_h.groupBy("month", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias(
            "day_digest"
        ),
    )
    return (
        days.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("day", "day_digest"))
                        ),
                        lambda s: s["day_digest"],
                    ),
                )
            ).alias("digest"),
        )
        .orderBy("month")
    )


# ------------------------------------------------ exact isotonic fit


@query(
    "isotonic_regression_exact",
    oracle="""
        WITH monthly AS (
            SELECT (EXTRACT(year FROM o_orderdate) * 12
                    + EXTRACT(month FROM o_orderdate)) AS mi,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), seq AS (
            SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY mi) AS rn,
                   SUM(cents) OVER (ORDER BY mi) AS s
            FROM monthly
        ), pref AS (
            SELECT rn, cents, s,
                   COALESCE(LAG(s) OVER (ORDER BY rn), 0) AS s_before
            FROM seq
        ), spans AS (
            SELECT j.rn AS j, k.rn AS k,
                   k.s - j.s_before AS num,
                   CAST(k.rn - j.rn + 1 AS BIGINT) AS den
            FROM pref j JOIN pref k ON k.rn >= j.rn
        ), mins AS (
            SELECT j, num, den FROM (
                SELECT j, num, den,
                       ROW_NUMBER() OVER (PARTITION BY j
                           ORDER BY CAST(num AS DOUBLE) / den, num, den)
                           AS rk
                FROM spans
            ) WHERE rk = 1
        ), fits AS (
            SELECT i.rn, i.cents, m.num, m.den FROM (
                SELECT i.rn AS irn, m.j AS mj,
                       ROW_NUMBER() OVER (PARTITION BY i.rn
                           ORDER BY CAST(m.num AS DOUBLE) / m.den DESC,
                                    m.num DESC, m.den) AS rk
                FROM pref i JOIN mins m ON m.j <= i.rn
            ) t JOIN pref i ON i.rn = t.irn
              JOIN mins m ON m.j = t.mj
            WHERE t.rk = 1
        )
        SELECT CAST(rn AS BIGINT) AS month_idx,
               cents AS actual_cents,
               CAST((num * 1000) // den AS BIGINT) AS fit_millicents,
               ((num * 1000) // den) <> (cents * 1000) AS pooled
        FROM fits ORDER BY month_idx
    """,
    description="Exact isotonic (monotone nondecreasing) regression "
    "of monthly revenue on time via the minimax closed form fit_i = "
    "max_j<=i min_k>=j avg(y[j..k]): span averages stay exact "
    "rationals (prefix-sum numerator, length denominator) ordered by "
    "the IEEE-portable int64/int64 double quotient with integer "
    "tiebreaks (distinct rationals here differ by >> one ulp, "
    "documented), output floored to millicents — PAVA's sequential "
    "pooling scan replaced by a set-based O(m^2) form with NO "
    "stateful pass. The shape-constrained fit behind calibration "
    "curves and monotone dose-response. At 100 TB the only data-"
    "scale pass is the month rollup; the span join runs on the "
    "bounded month spine (~tens of rows squared).",
)
def isotonic_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("mi")
    seq = monthly.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "s"
        ),
    )
    pref = seq.select(
        "rn",
        "cents",
        "s",
        F.coalesce(
            F.lag("s").over(Window.orderBy("rn")), F.lit(0).cast("long")
        ).alias("s_before"),
    )
    j, k = pref.alias("j"), pref.alias("k")
    spans = j.join(k, F.col("k.rn") >= F.col("j.rn")).select(
        F.col("j.rn").alias("jj"),
        (F.col("k.s") - F.col("j.s_before")).alias("num"),
        (F.col("k.rn") - F.col("j.rn") + 1).cast("long").alias("den"),
    )
    w_min = Window.partitionBy("jj").orderBy(
        F.col("num").cast("double") / F.col("den"), "num", "den"
    )
    mins = (
        spans.withColumn("rk", F.row_number().over(w_min))
        .filter(F.col("rk") == 1)
        .select("jj", "num", "den")
    )
    i = pref.alias("i")
    m = mins.alias("m")
    w_max = Window.partitionBy("irn").orderBy(
        (F.col("num").cast("double") / F.col("den")).desc(),
        F.desc("num"),
        "den",
    )
    fits = (
        i.join(m, F.col("m.jj") <= F.col("i.rn"))
        .select(
            F.col("i.rn").alias("irn"),
            F.col("i.cents").alias("cents"),
            "num",
            "den",
        )
        .withColumn("rk", F.row_number().over(w_max))
        .filter(F.col("rk") == 1)
    )
    return fits.select(
        F.col("irn").cast("long").alias("month_idx"),
        F.col("cents").alias("actual_cents"),
        F.expr("(num * 1000) div den").cast("long").alias("fit_millicents"),
        (F.expr("(num * 1000) div den") != F.col("cents") * 1000).alias(
            "pooled"
        ),
    ).orderBy("month_idx")
