"""Wave-143 (round 5): log-rank survival test + Allen interval census.

* ``survival_logrank_test`` — the two-group log-rank test on top of
  the wave-60 KM machinery: users split into an id-parity holdout
  (the deterministic A/B assignment), churn spans built exactly as in
  ``survival_km_hazard_table``, and at every distinct duration t the
  observed events O, expected events E_t = d_t * n_at / n_t and
  variance V_t = d_t * n_at * n_bt * (n_t - d_t) / (n_t^2 * (n_t-1))
  accumulated.  E and V are irrational ratios with per-t denominators,
  so each term is quantized to integer MICROS via truncating division
  before summing (the established cross-engine idiom); the chi-square
  statistic (O_a - E_a)^2 / V lands as an exact permille.  Arithmetic
  runs in DECIMAL(38,0) on the Spark side and HUGEINT in the oracle —
  the products reach ~1e30 at sf1, far past BIGINT.
* ``interval_allen_census`` — Allen's interval-algebra relation census
  over order fulfillment windows [o_orderdate, max(l_shipdate)] paired
  within their customer.  Pairs are canonicalized by (start, end)
  lexicographic order, which folds the 13 asymmetric Allen relations
  into 6 canonical ones (precedes / meets / overlaps / starts /
  finished_by / contains) + ``equals``; ties on the full (s, e) pair
  are counted separately as C(k,2) per identical-interval group, so no
  row identity is ever needed.  Inverted windows (the fixture permits
  shipdate < orderdate) are canonicalized by LEAST/GREATEST;
  zero-length ones use the fixed CASE-order convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ log-rank test

_LR_CENSOR_GAP_DAYS = 3  # same churn rule as survival_km_hazard_table


@query(
    "survival_logrank_test",
    oracle=f"""
        WITH horizon AS (
            SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events
        ), spans AS (
            SELECT user_id,
                   date_diff('day', MIN(CAST(ts AS DATE)),
                             MAX(CAST(ts AS DATE))) AS dur,
                   MAX(CAST(ts AS DATE)) AS last_day
            FROM events GROUP BY user_id
        ), labeled AS (
            SELECT s.dur,
                   CASE WHEN date_diff('day', s.last_day, h.hmax)
                             > {_LR_CENSOR_GAP_DAYS}
                        THEN 1 ELSE 0 END AS churned,
                   CASE WHEN s.user_id % 2 = 0 THEN 1 ELSE 0 END AS ga
            FROM spans s, horizon h
        ), per_t AS (
            SELECT dur AS t,
                   CAST(SUM(ga) AS BIGINT) AS leave_a,
                   CAST(SUM(1 - ga) AS BIGINT) AS leave_b,
                   CAST(SUM(churned * ga) AS BIGINT) AS d_a,
                   CAST(SUM(churned * (1 - ga)) AS BIGINT) AS d_b
            FROM labeled GROUP BY dur
        ), risk AS (
            SELECT t, d_a, d_b,
                   CAST(SUM(leave_a) OVER (ORDER BY t DESC)
                        AS BIGINT) AS n_a,
                   CAST(SUM(leave_b) OVER (ORDER BY t DESC)
                        AS BIGINT) AS n_b
            FROM per_t
        ), terms AS (
            SELECT d_a, d_b,
                   CAST((d_a + d_b) * n_a AS HUGEINT) * 1000000
                       // (n_a + n_b) AS e_a_micro,
                   CAST((d_a + d_b) * n_b AS HUGEINT) * 1000000
                       // (n_a + n_b) AS e_b_micro,
                   CASE WHEN n_a + n_b > 1 THEN
                        CAST(d_a + d_b AS HUGEINT) * n_a * n_b
                            * (n_a + n_b - d_a - d_b) * 1000000
                            // (CAST(n_a + n_b AS HUGEINT)
                                * (n_a + n_b) * (n_a + n_b - 1))
                   ELSE 0 END AS v_micro
            FROM risk
        ), sums AS (
            SELECT CAST(SUM(d_a) AS BIGINT) AS o_a,
                   CAST(SUM(d_b) AS BIGINT) AS o_b,
                   CAST(SUM(e_a_micro) AS BIGINT) AS e_a_micro,
                   CAST(SUM(e_b_micro) AS BIGINT) AS e_b_micro,
                   CAST(SUM(v_micro) AS BIGINT) AS v_micro
            FROM terms
        )
        SELECT o_a, o_b, e_a_micro, e_b_micro, v_micro,
               CASE WHEN v_micro > 0 THEN
                    CAST(CAST(o_a * 1000000 - e_a_micro AS HUGEINT)
                         * (o_a * 1000000 - e_a_micro) * 1000
                         // (CAST(v_micro AS HUGEINT) * 1000000)
                         AS BIGINT)
               ELSE 0 END AS chi2_permille
        FROM sums
    """,
    description="Two-group log-rank survival test: users split by the "
    "deterministic id-parity holdout, churn spans per the KM life-"
    "table rule, and at every distinct duration the observed events "
    "O, the expected events E_t = d_t*n_at/n_t and the hypergeometric "
    "variance V_t accumulated — each term quantized to integer "
    "micros by truncating division before summing so both engines "
    "agree bit-for-bit, the chi-square (O_a-E_a)^2/V emitted as an "
    "exact permille. Arithmetic runs in DECIMAL(38,0)/HUGEINT: the "
    "variance product reaches ~1e30 at sf1, far past BIGINT. 100 TB "
    "shape: one per-user span aggregation (the only data-scale "
    "shuffle), a duration spine bounded by the observation window's "
    "day span, reverse cumsums + term algebra on that bounded spine, "
    "and a 1-row result.",
)
def survival_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spans = events.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("dur"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    horizon = events.agg(F.max(F.col("ts").cast("date")).alias("hmax"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.datediff("hmax", "last_day") > _LR_CENSOR_GAP_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ga"),
    )
    per_t = labeled.groupBy(F.col("dur").alias("t")).agg(
        F.sum("ga").cast("long").alias("leave_a"),
        F.sum(1 - F.col("ga")).cast("long").alias("leave_b"),
        F.sum(F.col("churned") * F.col("ga")).cast("long").alias("d_a"),
        F.sum(F.col("churned") * (1 - F.col("ga")))
        .cast("long")
        .alias("d_b"),
    )
    # reverse running sums over the bounded duration spine (same shape
    # as survival_km_hazard_table — tens of rows by construction)
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t",
        "d_a",
        "d_b",
        F.sum("leave_a").over(w).alias("n_a"),
        F.sum("leave_b").over(w).alias("n_b"),
    )
    terms = risk.select(
        "d_a",
        "d_b",
        F.expr(
            "CAST((d_a + d_b) * n_a AS DECIMAL(38,0)) * 1000000"
            " div (n_a + n_b)"
        ).alias("e_a_micro"),
        F.expr(
            "CAST((d_a + d_b) * n_b AS DECIMAL(38,0)) * 1000000"
            " div (n_a + n_b)"
        ).alias("e_b_micro"),
        F.expr(
            "CASE WHEN n_a + n_b > 1 THEN"
            " CAST(d_a + d_b AS DECIMAL(38,0)) * n_a * n_b"
            " * (n_a + n_b - d_a - d_b) * 1000000"
            " div (CAST(n_a + n_b AS DECIMAL(38,0))"
            "      * (n_a + n_b) * (n_a + n_b - 1))"
            " ELSE 0 END"
        ).alias("v_micro"),
    )
    sums = terms.agg(
        F.sum("d_a").cast("long").alias("o_a"),
        F.sum("d_b").cast("long").alias("o_b"),
        F.sum("e_a_micro").cast("long").alias("e_a_micro"),
        F.sum("e_b_micro").cast("long").alias("e_b_micro"),
        F.sum("v_micro").cast("long").alias("v_micro"),
    )
    return sums.select(
        "o_a",
        "o_b",
        "e_a_micro",
        "e_b_micro",
        "v_micro",
        F.expr(
            "CASE WHEN v_micro > 0 THEN"
            " CAST(CAST(o_a * 1000000 - e_a_micro AS DECIMAL(38,0))"
            "      * (o_a * 1000000 - e_a_micro) * 1000"
            "      div (CAST(v_micro AS DECIMAL(38,0)) * 1000000)"
            "      AS BIGINT)"
            " ELSE 0 END"
        ).alias("chi2_permille"),
    )


# ------------------------------------------- Allen relation census


@query(
    "interval_allen_census",
    oracle="""
        WITH fin AS (
            SELECT l_orderkey, MAX(l_shipdate) AS mx
            FROM lineitem GROUP BY l_orderkey
        ), iv AS (
            SELECT o.o_custkey AS ok,
                   LEAST(o.o_orderdate, f.mx) AS s,
                   GREATEST(o.o_orderdate, f.mx) AS e
            FROM orders o JOIN fin f ON f.l_orderkey = o.o_orderkey
        ), pairs AS (
            SELECT a.s AS sa, a.e AS ea, b.s AS sb, b.e AS eb
            FROM iv a JOIN iv b
              ON b.ok = a.ok
                 AND (a.s < b.s OR (a.s = b.s AND a.e < b.e))
        ), classified AS (
            SELECT CASE
                     WHEN ea < sb THEN 'precedes'
                     WHEN ea = sb THEN 'meets'
                     WHEN sa = sb THEN 'starts'
                     WHEN ea < eb THEN 'overlaps'
                     WHEN ea = eb THEN 'finished_by'
                     ELSE 'contains'
                   END AS relation
            FROM pairs
        ), named AS (
            SELECT relation, CAST(COUNT(*) AS BIGINT) AS pair_count
            FROM classified GROUP BY relation
            UNION ALL
            SELECT 'equals' AS relation,
                   CAST(COALESCE(SUM(k * (k - 1) // 2), 0) AS BIGINT)
                       AS pair_count
            FROM (SELECT COUNT(*) AS k FROM iv GROUP BY ok, s, e)
        ), tot AS (
            SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_pairs
            FROM (SELECT COUNT(*) AS n FROM iv GROUP BY ok)
        )
        SELECT relation, pair_count,
               CAST(pair_count * 1000 // n_pairs AS BIGINT)
                   AS share_permille
        FROM named, tot
        WHERE pair_count > 0
        ORDER BY relation
    """,
    description="Allen interval-algebra relation census over order "
    "fulfillment windows [o_orderdate, max(l_shipdate)] paired "
    "within their customer: pairs canonicalized by (start, end) "
    "lexicographic order fold the 13 asymmetric Allen relations into "
    "6 canonical ones (precedes/meets/overlaps/starts/finished_by/"
    "contains), and identical intervals are counted as C(k,2) per "
    "(customer, s, e) group — no row identity needed, so duplicate "
    "rows cannot bite; zero-length and inverted (ship < order date, "
    "which the fixture permits) windows are canonicalized by LEAST/"
    "GREATEST and follow the fixed CASE-order convention. 100 TB "
    "shape: one lineitem max-shipdate aggregation co-keyed with the "
    "orders join, a self-join co-partitioned on o_custkey with fan-"
    "out bounded by per-customer order count, equals/total legs as "
    "plain aggregations on the same key, and a 7-row census.",
)
def interval_allen_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fin = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx")
    )
    iv = orders.join(
        fin, fin.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("ok"),
        F.least("o_orderdate", "mx").alias("s"),
        F.greatest("o_orderdate", "mx").alias("e"),
    )
    a = iv.select(
        "ok", F.col("s").alias("sa"), F.col("e").alias("ea")
    )
    b = iv.select(
        "ok", F.col("s").alias("sb"), F.col("e").alias("eb")
    )
    pairs = a.join(b, "ok").where(
        (F.col("sa") < F.col("sb"))
        | ((F.col("sa") == F.col("sb")) & (F.col("ea") < F.col("eb")))
    )
    classified = pairs.select(
        F.when(F.col("ea") < F.col("sb"), "precedes")
        .when(F.col("ea") == F.col("sb"), "meets")
        .when(F.col("sa") == F.col("sb"), "starts")
        .when(F.col("ea") < F.col("eb"), "overlaps")
        .when(F.col("ea") == F.col("eb"), "finished_by")
        .otherwise("contains")
        .alias("relation")
    )
    named = classified.groupBy("relation").agg(
        F.count(F.lit(1)).cast("long").alias("pair_count")
    )
    equals = (
        iv.groupBy("ok", "s", "e")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.coalesce(
                F.sum(F.expr("k * (k - 1) div 2")), F.lit(0)
            )
            .cast("long")
            .alias("pair_count")
        )
        .select(F.lit("equals").alias("relation"), "pair_count")
    )
    tot = (
        iv.groupBy("ok")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.expr("n * (n - 1) div 2"))
            .cast("long")
            .alias("n_pairs")
        )
    )
    return (
        named.unionByName(equals)
        .crossJoin(F.broadcast(tot))
        .where(F.col("pair_count") > 0)
        .select(
            "relation",
            "pair_count",
            F.expr("pair_count * 1000 div n_pairs")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("relation")
    )
