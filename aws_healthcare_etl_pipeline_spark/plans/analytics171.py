"""Wave-197 (round 5): distribution-free intervals + AIOps lift.

* ``stats_median_ci_orderstat`` — the distribution-free confidence
  interval for the median that needs NO normality and NO bootstrap:
  order statistics at ranks n/2 -+ floor(sqrt(n)) bracket the median
  with ~95% coverage by the binomial argument, and all three ranks
  come from ONE histogram-refinement selection (the multi-rank
  operator shares its passes). Interval width in permille of the
  median is the stability read-out.

* ``ops_incident_cooccurrence_lift`` — which event types fire
  together? Distinct (5-minute bucket, type) occurrences, pair
  counts by bucket self-join (the type alphabet is tiny, the bucket
  key is the shuffle), and lift = P(a,b)/(P(a)P(b)) as the exact
  cross-multiplied integer n_ab * B * 1000 div (n_a * n_b) — the
  alert-correlation matrix that seeds every incident-grouping rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.selection import kth_smallest_multi
from ..sources.tables import load_table
from .registry import query


@query(
    "stats_median_ci_orderstat",
    oracle="""
        WITH vals AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), ranked AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rnk,
                   COUNT(*) OVER () AS n
            FROM vals
        ), marks AS (
            SELECT n,
                   (n + 1) // 2 AS k_med,
                   (n + 1) // 2
                   - CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)
                       AS k_lo,
                   (n + 1) // 2
                   + CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)
                       AS k_hi
            FROM ranked LIMIT 1
        )
        SELECT m.n AS n_orders,
               (SELECT v FROM ranked WHERE rnk = m.k_med)
                   AS median_cents,
               (SELECT v FROM ranked WHERE rnk = m.k_lo)
                   AS ci_lo_cents,
               (SELECT v FROM ranked WHERE rnk = m.k_hi)
                   AS ci_hi_cents,
               CAST(((SELECT v FROM ranked WHERE rnk = m.k_hi)
                     - (SELECT v FROM ranked WHERE rnk = m.k_lo))
                    * 1000
                    // (SELECT v FROM ranked WHERE rnk = m.k_med)
                   AS BIGINT) AS ci_width_permille
        FROM marks m
    """,
    description="Distribution-free median confidence interval from "
    "order statistics: ranks (n+1) div 2 -+ floor(sqrt(n)) bracket "
    "the median with ~95% coverage by the binomial argument — no "
    "normality, no bootstrap, no resampling. All three ranks come "
    "from ONE multi-rank histogram-refinement selection (shared "
    "passes, bounded driver state, no global sort); the oracle is "
    "the textbook window-rank form, so the hash match again proves "
    "the selection operator. Width in permille of the median is "
    "the stability read-out dashboards actually want next to the "
    "point estimate. 100 TB shape: a handful of full-scan histogram "
    "aggs regardless of how many ranks are requested.",
)
def stats_median_ci_orderstat(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v"
    ).localCheckpoint(eager=False)  # selection passes share the scan
    n = vals.count()
    import math

    k_med = (n + 1) // 2
    half = math.isqrt(n)
    ks = {k_med - half, k_med, k_med + half}
    got = kth_smallest_multi(vals, "v", sorted(ks))
    med = got[k_med]
    lo = got[k_med - half]
    hi = got[k_med + half]
    return vals.sparkSession.createDataFrame(
        [
            (
                n,
                med,
                lo,
                hi,
                (hi - lo) * 1000 // med,
            )
        ],
        "n_orders long, median_cents long, ci_lo_cents long,"
        " ci_hi_cents long, ci_width_permille long",
    )


_OCL_BUCKET_US = 300 * 1_000_000  # 5 minutes


@query(
    "ops_incident_cooccurrence_lift",
    oracle=f"""
        WITH occ AS MATERIALIZED (
            SELECT DISTINCT epoch_us(ts) // {_OCL_BUCKET_US} AS b,
                   event_type AS t
            FROM events
        ), buckets AS (
            SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM occ
        ), singles AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM occ
            GROUP BY t
        ), pairs AS (
            SELECT a.t AS t1, c.t AS t2,
                   CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM occ a JOIN occ c ON c.b = a.b AND c.t > a.t
            GROUP BY a.t, c.t
        )
        SELECT p.t1, p.t2, p.n_ab, s1.n AS n_1, s2.n AS n_2,
               CAST(p.n_ab * b.nb * 1000 // (s1.n * s2.n) AS BIGINT)
                   AS lift_permille
        FROM pairs p
        JOIN singles s1 ON s1.t = p.t1
        JOIN singles s2 ON s2.t = p.t2
        CROSS JOIN buckets b
        ORDER BY p.t1, p.t2
    """,
    description="Alert-correlation lift: which event types co-occur "
    "within the same 5-minute bucket more than independence "
    "predicts? Distinct (bucket, type) occurrences, pair counts via "
    "a bucket-keyed self-join (the type alphabet is tiny — the "
    "shuffle key is the bucket, the pair fan-out is bounded by "
    "|types|^2 per bucket), and lift = P(ab)/(P(a)P(b)) evaluated "
    "as the exact integer n_ab * B * 1000 div (n_a * n_b). Lift >> "
    "1000 pairs are the incident-grouping rules an AIOps system "
    "should propose. 100 TB shape: one dedup shuffle to (bucket, "
    "type), one self-join with constant per-bucket fan-out, "
    "bounded pair output.",
)
def ops_incident_cooccurrence_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    occ = (
        events.selectExpr(
            f"unix_micros(ts) div {_OCL_BUCKET_US} AS b",
            "event_type AS t",
        )
        .distinct()
        .localCheckpoint(eager=False)  # singles + pair join sides
    )
    buckets = occ.agg(
        F.countDistinct("b").cast("long").alias("nb")
    )
    singles = occ.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    c = occ.selectExpr("b AS b2", "t AS t2")
    pairs = (
        occ.join(
            c,
            (F.col("b2") == F.col("b")) & (F.col("t2") > F.col("t")),
        )
        .groupBy(F.col("t").alias("t1"), "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    s1 = singles.selectExpr("t AS tt1", "n AS n_1")
    s2 = singles.selectExpr("t AS tt2", "n AS n_2")
    return (
        pairs.join(F.broadcast(s1), F.col("tt1") == F.col("t1"))
        .join(F.broadcast(s2), F.col("tt2") == F.col("t2"))
        .crossJoin(F.broadcast(buckets))
        .selectExpr(
            "t1",
            "t2",
            "n_ab",
            "n_1",
            "n_2",
            "CAST(n_ab * nb * 1000 div (n_1 * n_2) AS BIGINT)"
            " AS lift_permille",
        )
        .orderBy("t1", "t2")
    )
