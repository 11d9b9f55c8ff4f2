"""Wave-202 (round 5): full-outer rewrite + ingestion completeness.

* ``sql_full_outer_rewrite_equivalence`` — the skew-mitigation
  rewrite, proven on data: FULL OUTER JOIN computed natively and as
  the manual decomposition (LEFT JOIN unioned with the right side's
  anti-join), with row counts and value checksums from BOTH paths
  and their equality flags in the result. At 100 TB this rewrite is
  how you salt a skewed full-outer that AQE can't split — this
  query is the proof it's semantics-preserving.

* ``dq_ingestion_gap_detector`` — per-day ingestion completeness
  from the dense event_id sequence: within each day, the id span
  (max - min + 1) minus the row count is the number of silently
  dropped events, and cross-day continuity (next day's min = this
  day's max + 1) catches losses at batch boundaries. Zero everywhere
  = the pipeline kept its at-least-once promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "sql_full_outer_rewrite_equivalence",
    oracle="""
        WITH l AS MATERIALIZED (
            SELECT o_custkey AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_orderdate < DATE '1997-01-01'
            GROUP BY 1
        ), r AS MATERIALIZED (
            SELECT o_custkey AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_orderdate >= DATE '1997-01-01'
            GROUP BY 1
        ), native AS (
            SELECT COALESCE(l.k, r.k) AS k,
                   COALESCE(l.n_orders, 0) AS a,
                   COALESCE(r.n_orders, 0) AS b
            FROM l FULL OUTER JOIN r ON r.k = l.k
        ), rewrite AS (
            SELECT l.k, l.n_orders AS a,
                   COALESCE(r.n_orders, 0) AS b
            FROM l LEFT JOIN r ON r.k = l.k
            UNION ALL
            SELECT r.k, 0, r.n_orders
            FROM r ANTI JOIN l ON l.k = r.k
        ), sn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS ksum,
                   CAST(SUM(a * 31 + b) AS BIGINT) AS vsum
            FROM native
        ), sr AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS ksum,
                   CAST(SUM(a * 31 + b) AS BIGINT) AS vsum
            FROM rewrite
        )
        SELECT sn.n AS native_rows, sr.n AS rewrite_rows,
               sn.ksum AS native_keysum, sr.ksum AS rewrite_keysum,
               sn.vsum AS native_valsum, sr.vsum AS rewrite_valsum,
               sn.n = sr.n AND sn.ksum = sr.ksum
                   AND sn.vsum = sr.vsum AS rewrite_equivalent
        FROM sn CROSS JOIN sr
    """,
    description="The full-outer skew rewrite, proven semantics-"
    "preserving on data: per-customer order counts before/after a "
    "date split joined FULL OUTER natively, and again as the "
    "decomposition LEFT JOIN union RIGHT-anti — row counts, key "
    "sums, and a value checksum from both paths sit side by side "
    "with the equivalence flag. Why it matters at 100 TB: AQE "
    "cannot split a skewed FULL OUTER's build side, but it CAN "
    "handle the rewrite's left join and anti join independently — "
    "this query is the regression test that makes the manual "
    "rewrite safe to deploy. One shuffle per side either way.",
)
def sql_full_outer_rewrite_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    l = (
        orders.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .localCheckpoint(eager=False)  # both paths
    )
    r = (
        orders.where(
            F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
        )
        .groupBy(F.col("o_custkey").alias("k2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders2"))
        .localCheckpoint(eager=False)
    )
    native = l.join(r, F.col("k2") == F.col("k"), "full_outer").select(
        F.coalesce(F.col("k"), F.col("k2")).alias("kk"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("a"),
        F.coalesce(F.col("n_orders2"), F.lit(0)).alias("b"),
    )
    left = l.join(r, F.col("k2") == F.col("k"), "left").select(
        F.col("k").alias("kk"),
        F.col("n_orders").alias("a"),
        F.coalesce(F.col("n_orders2"), F.lit(0)).alias("b"),
    )
    right_only = r.join(
        l, F.col("k") == F.col("k2"), "left_anti"
    ).select(
        F.col("k2").alias("kk"),
        F.lit(0).cast("long").alias("a"),
        F.col("n_orders2").alias("b"),
    )
    rewrite = left.unionAll(right_only)

    def summarize(df, p):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"{p}_rows"),
            F.sum("kk").cast("long").alias(f"{p}_keysum"),
            F.sum(F.col("a") * 31 + F.col("b"))
            .cast("long")
            .alias(f"{p}_valsum"),
        )

    sn = summarize(native, "native")
    sr = summarize(rewrite, "rewrite")
    return sn.crossJoin(F.broadcast(sr)).selectExpr(
        "native_rows",
        "rewrite_rows",
        "native_keysum",
        "rewrite_keysum",
        "native_valsum",
        "rewrite_valsum",
        "native_rows = rewrite_rows AND native_keysum ="
        " rewrite_keysum AND native_valsum = rewrite_valsum"
        " AS rewrite_equivalent",
    )


@query(
    "dq_ingestion_gap_detector",
    oracle="""
        WITH days AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(event_id) AS BIGINT) AS lo,
                   CAST(MAX(event_id) AS BIGINT) AS hi
            FROM events GROUP BY 1
        ), seq AS (
            SELECT d, n, lo, hi,
                   hi - lo + 1 - n AS intra_gap,
                   lo - LAG(hi) OVER (ORDER BY d) - 1 AS boundary_gap
            FROM days
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(intra_gap) AS BIGINT) AS intra_day_missing,
               CAST(SUM(CASE WHEN boundary_gap > 0
                        THEN boundary_gap ELSE 0 END) AS BIGINT)
                   AS boundary_missing,
               CAST(SUM(CASE WHEN boundary_gap < 0
                        THEN -boundary_gap ELSE 0 END) AS BIGINT)
                   AS boundary_overlap
        FROM seq
    """,
    description="Ingestion completeness from the dense event_id "
    "sequence: per day, span (max - min + 1) minus the row count is "
    "the silently-dropped count inside the day, and the lag between "
    "one day's max id and the next day's min id exposes losses (gap "
    "> 0) or replays (overlap < 0) at batch boundaries — the "
    "at-least-once/exactly-once forensic that runs right after "
    "every backfill. All integer arithmetic on the bounded day "
    "spine. 100 TB shape: one partial agg to days (min/max/count "
    "all combine map-side), one bounded lag window, one scalar "
    "rollup — completeness for a trillion events at the cost of "
    "one scan.",
)
def dq_ingestion_gap_detector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    days = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("event_id").cast("long").alias("lo"),
        F.max("event_id").cast("long").alias("hi"),
    )
    w = Window.orderBy("d")
    seq = days.select(
        "n",
        (F.col("hi") - F.col("lo") + 1 - F.col("n")).alias(
            "intra_gap"
        ),
        (F.col("lo") - F.lag("hi").over(w) - 1).alias("boundary_gap"),
    )
    return seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_events"),
        F.sum("intra_gap").cast("long").alias("intra_day_missing"),
        F.sum(
            F.when(F.col("boundary_gap") > 0, F.col("boundary_gap"))
            .otherwise(0)
        )
        .cast("long")
        .alias("boundary_missing"),
        F.sum(
            F.when(F.col("boundary_gap") < 0, -F.col("boundary_gap"))
            .otherwise(0)
        )
        .cast("long")
        .alias("boundary_overlap"),
    )
