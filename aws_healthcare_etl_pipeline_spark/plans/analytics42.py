"""Wave-68 (round 5): aggregation-pitfall detection + exact moments.

* ``stats_simpsons_paradox_scan`` — Simpson's-paradox detector: for
  every pair of customer segments, compare urgent-order rates overall
  AND within each nation stratum, all by integer cross-multiplication
  (u_a * n_b vs u_b * n_a — no rate ever materializes), and flag
  pairs whose aggregate ordering is contradicted by a majority of
  strata — the canonical "your dashboard's topline reverses under a
  groupby" audit.
* ``stats_exact_raw_moments`` — exact raw power sums (n, sum x,
  sum x^2, sum x^3) of lineitem price cents per return flag, carried
  in DECIMAL(38,0) and emitted as VARCHAR because sum x^3 exceeds
  2^53 (the documented DECIMAL->DOUBLE divergence class) — the
  sufficient statistics from which mean/variance/skewness derive,
  proving the engine can keep third moments exact at fact-table
  scale in one mergeable pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Simpson's paradox scan


@query(
    "stats_simpsons_paradox_scan",
    oracle="""
        WITH base AS (
            SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS u
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        ), seg_tot AS (
            SELECT seg, SUM(n) AS n, SUM(u) AS u FROM base GROUP BY seg
        ), pairs AS (
            SELECT a.seg AS seg_a, b.seg AS seg_b,
                   CASE WHEN a.u * b.n > b.u * a.n THEN 1
                        WHEN a.u * b.n < b.u * a.n THEN -1
                        ELSE 0 END AS overall_sign
            FROM seg_tot a JOIN seg_tot b ON b.seg > a.seg
        ), strata AS (
            SELECT a.seg AS seg_a, b.seg AS seg_b,
                   CASE WHEN a.u * b.n > b.u * a.n THEN 1
                        WHEN a.u * b.n < b.u * a.n THEN -1
                        ELSE 0 END AS sign
            FROM base a JOIN base b
              ON b.nat = a.nat AND b.seg > a.seg
        ), agg AS (
            SELECT seg_a, seg_b,
                   CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(CASE WHEN sign = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS strata_a_ahead,
                   CAST(SUM(CASE WHEN sign = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS strata_b_ahead
            FROM strata GROUP BY 1, 2
        )
        SELECT p.seg_a, p.seg_b,
               CAST(p.overall_sign AS BIGINT) AS overall_sign,
               g.n_strata, g.strata_a_ahead, g.strata_b_ahead,
               (p.overall_sign = 1 AND 2 * g.strata_b_ahead > g.n_strata)
               OR (p.overall_sign = -1
                   AND 2 * g.strata_a_ahead > g.n_strata) AS paradox
        FROM pairs p JOIN agg g
          ON g.seg_a = p.seg_a AND g.seg_b = p.seg_b
        ORDER BY p.seg_a, p.seg_b
    """,
    description="Simpson's-paradox scan over segment pairs: urgent-"
    "order rates compared overall and within every nation stratum "
    "purely by integer cross-multiplication (u_a*n_b vs u_b*n_a — no "
    "division, no floats), flagging pairs where the aggregate winner "
    "loses in a majority of strata — the canonical aggregation "
    "pitfall every metrics platform should surface before a topline "
    "ships. At 100 TB: one partial-agg shuffle to (segment, nation) "
    "counts; the pair scan runs on the metadata-sized segment x "
    "nation grid, so detection cost is independent of fact volume.",
)
def stats_simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    base = (
        orders.join(F.broadcast(cust), cust["c_custkey"] == orders["o_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("u"),
        )
    )
    seg_tot = base.groupBy("seg").agg(
        F.sum("n").alias("n"), F.sum("u").alias("u")
    )

    def sign(au, an, bu, bn):
        return (
            F.when(au * bn > bu * an, 1)
            .when(au * bn < bu * an, -1)
            .otherwise(0)
        )

    a, b = seg_tot.alias("a"), seg_tot.alias("b")
    pairs = a.join(b, F.col("b.seg") > F.col("a.seg")).select(
        F.col("a.seg").alias("seg_a"),
        F.col("b.seg").alias("seg_b"),
        sign(
            F.col("a.u"), F.col("a.n"), F.col("b.u"), F.col("b.n")
        ).alias("overall_sign"),
    )
    sa, sb = base.alias("a"), base.alias("b")
    strata = sa.join(
        sb,
        (F.col("b.nat") == F.col("a.nat")) & (F.col("b.seg") > F.col("a.seg")),
    ).select(
        F.col("a.seg").alias("seg_a"),
        F.col("b.seg").alias("seg_b"),
        sign(
            F.col("a.u"), F.col("a.n"), F.col("b.u"), F.col("b.n")
        ).alias("sign"),
    )
    agg = strata.groupBy("seg_a", "seg_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(F.when(F.col("sign") == 1, 1).otherwise(0))
        .cast("long")
        .alias("strata_a_ahead"),
        F.sum(F.when(F.col("sign") == -1, 1).otherwise(0))
        .cast("long")
        .alias("strata_b_ahead"),
    )
    return (
        pairs.join(agg, ["seg_a", "seg_b"])
        .select(
            "seg_a",
            "seg_b",
            F.col("overall_sign").cast("long").alias("overall_sign"),
            "n_strata",
            "strata_a_ahead",
            "strata_b_ahead",
            (
                (
                    (F.col("overall_sign") == 1)
                    & (2 * F.col("strata_b_ahead") > F.col("n_strata"))
                )
                | (
                    (F.col("overall_sign") == -1)
                    & (2 * F.col("strata_a_ahead") > F.col("n_strata"))
                )
            ).alias("paradox"),
        )
        .orderBy("seg_a", "seg_b")
    )


# ------------------------------------------------ exact raw moments


@query(
    "stats_exact_raw_moments",
    oracle="""
        WITH x AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS c
            FROM lineitem
        )
        SELECT flag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                    AS VARCHAR) AS sum1,
               CAST(CAST(SUM(CAST(c AS DECIMAL(38,0))
                             * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0))
                    AS VARCHAR) AS sum2,
               CAST(CAST(SUM(CAST(c * c AS DECIMAL(38,0))
                             * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0))
                    AS VARCHAR) AS sum3
        FROM x GROUP BY flag ORDER BY flag
    """,
    description="Exact raw power sums of price cents per return flag: "
    "n, sum x, sum x^2, sum x^3 carried in DECIMAL(38,0) and emitted "
    "as VARCHAR because the third moment exceeds 2^53 (the documented "
    "DECIMAL->DOUBLE divergence class — routing through text is the "
    "only bit-safe transport). These are the mergeable sufficient "
    "statistics from which mean, variance, and skewness derive; "
    "keeping them exact means a 100 TB scan can compute distribution "
    "shape in ONE partial-agg pass with no numeric drift, no Welford "
    "ordering sensitivity, and no second pass for centered moments.",
)
def stats_exact_raw_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    d38 = F.col("c").cast("decimal(38,0)")
    d19 = F.col("c").cast("decimal(19,0)")
    return (
        line.groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(d38).cast("decimal(38,0)").cast("string").alias("sum1"),
            F.sum(d38 * d19).cast("decimal(38,0)").cast("string").alias(
                "sum2"
            ),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)") * d19)
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum3"),
        )
        .orderBy("flag")
    )
