"""Wave-214b (round 10): completing the nonparametric-statistics lane.

Three oracle-backed queries that finish the two-sample / k-sample
battery the engine already carries (KS, Cramér-von Mises, Wasserstein,
Kruskal-Wallis, Mood): exact ENERGY DISTANCE and MANN-WHITNEY /
CLIFF'S DELTA — both computed from the same sorted value-spine
prefix-sum identity, entirely in exact integers — and the FRIEDMAN
blocked-rank test with midranks kept integer in doubled units.

House rules: no transcendental in the hash path; doubles appear only
in single shared final expressions over exact integers, floor-
quantized. The value spine (distinct cents) is domain-bounded — the
same bounded-spine window argument as stat_wasserstein_1d_exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------ exact energy distance


@query(
    "stats_energy_distance_exact",
    oracle="""
        WITH x AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   o_orderstatus AS st
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ), vals AS (
            SELECT v,
                   CAST(COUNT(*) FILTER (st = 'F') AS BIGINT) AS cx,
                   CAST(COUNT(*) FILTER (st = 'O') AS BIGINT) AS cy
            FROM x GROUP BY v
        ), pre AS (
            SELECT v, cx, cy,
                   SUM(cx) OVER w AS cxc, SUM(cy) OVER w AS cyc,
                   SUM(cx * v) OVER w AS sxc, SUM(cy * v) OVER w AS syc
            FROM vals
            WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), tot AS (
            SELECT CAST(SUM(cx) AS BIGINT) AS nx,
                   CAST(SUM(cy) AS BIGINT) AS ny,
                   CAST(SUM(cx * v) AS BIGINT) AS sx,
                   CAST(SUM(cy * v) AS BIGINT) AS sy
            FROM vals
        ), terms AS (
            SELECT
                CAST(cx AS DECIMAL(19,0))
                    * CAST(v * cyc - syc + (sy - syc) - v * (ny - cyc)
                           AS DECIMAL(19,0)) AS txy,
                CAST(cx AS DECIMAL(19,0))
                    * CAST(v * cxc - sxc + (sx - sxc) - v * (nx - cxc)
                           AS DECIMAL(19,0)) AS txx,
                CAST(cy AS DECIMAL(19,0))
                    * CAST(v * cyc - syc + (sy - syc) - v * (ny - cyc)
                           AS DECIMAL(19,0)) AS tyy
            FROM pre CROSS JOIN tot
        )
        SELECT nx, ny,
               CAST(FLOOR(1e6 * (
                   2.0 * CAST(sxy AS DOUBLE)
                       / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                   - CAST(sxx AS DOUBLE)
                       / (CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
                   - CAST(syy AS DOUBLE)
                       / (CAST(ny AS DOUBLE) * CAST(ny AS DOUBLE))
               )) AS BIGINT) AS energy_micro_cents
        FROM (SELECT SUM(txy) AS sxy, SUM(txx) AS sxx, SUM(tyy) AS syy
              FROM terms) CROSS JOIN tot
        WHERE nx > 0 AND ny > 0
    """,
    description="Exact two-sample energy distance between the order-"
    "total distributions of F- vs O-status orders: E = 2*E|X-Y| - "
    "E|X-X'| - E|Y-Y'| (V-statistic form), with every pairwise-"
    "distance sum computed EXACTLY from the sorted value-spine "
    "prefix-sum identity sum_j|v-yj| = v*C(v) - S(v) + (S_tot - S(v))"
    " - v*(n - C(v)) — no pair enumeration, one pass over the "
    "distinct-cents spine. All mass is exact integer (decimal "
    "products, decimal sums); the three expectations meet doubles "
    "only in the single shared final expression, floored at 1e6. "
    "Completes the two-sample lane next to KS / CvM / Wasserstein "
    "with the metric that detects scale as well as location shifts. "
    "Scale: one group-by to the domain-bounded spine; the cumsum "
    "window runs on that bounded relation (the wasserstein "
    "bounded-spine pattern).",
)
def stats_energy_distance_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("F", "O")
    )
    vals = (
        x.select(
            (dec("o_totalprice") * 100).cast("long").alias("v"),
            "o_orderstatus",
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("cx"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("long")
            .alias("cy"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pre = vals.select(
        "v",
        "cx",
        "cy",
        F.sum("cx").over(w).alias("cxc"),
        F.sum("cy").over(w).alias("cyc"),
        F.sum(F.col("cx") * F.col("v")).over(w).alias("sxc"),
        F.sum(F.col("cy") * F.col("v")).over(w).alias("syc"),
    )
    tot = vals.agg(
        F.sum("cx").cast("long").alias("nx"),
        F.sum("cy").cast("long").alias("ny"),
        F.sum(F.col("cx") * F.col("v")).cast("long").alias("sx"),
        F.sum(F.col("cy") * F.col("v")).cast("long").alias("sy"),
    )
    ty = (
        F.col("v") * F.col("cyc")
        - F.col("syc")
        + (F.col("sy") - F.col("syc"))
        - F.col("v") * (F.col("ny") - F.col("cyc"))
    ).cast("decimal(19,0)")
    tx = (
        F.col("v") * F.col("cxc")
        - F.col("sxc")
        + (F.col("sx") - F.col("sxc"))
        - F.col("v") * (F.col("nx") - F.col("cxc"))
    ).cast("decimal(19,0)")
    terms = pre.crossJoin(F.broadcast(tot)).select(
        (F.col("cx").cast("decimal(19,0)") * ty).alias("txy"),
        (F.col("cx").cast("decimal(19,0)") * tx).alias("txx"),
        (F.col("cy").cast("decimal(19,0)") * ty).alias("tyy"),
        "nx",
        "ny",
    )
    agg = terms.groupBy("nx", "ny").agg(
        F.sum("txy").alias("sxy"),
        F.sum("txx").alias("sxx"),
        F.sum("tyy").alias("syy"),
    )
    nx_d, ny_d = F.col("nx").cast("double"), F.col("ny").cast("double")
    energy = (
        F.lit(2.0) * F.col("sxy").cast("double") / (nx_d * ny_d)
        - F.col("sxx").cast("double") / (nx_d * nx_d)
        - F.col("syy").cast("double") / (ny_d * ny_d)
    )
    # nx/ny = 0 (an empty orderstatus class) would put Inf/NaN into the
    # final expression, where FLOOR/cast-to-long can diverge between
    # engines; drop that degenerate row (mirrored in the oracle's
    # WHERE nx > 0 AND ny > 0). Unreachable on TPC-H data.
    return agg.where((F.col("nx") > 0) & (F.col("ny") > 0)).select(
        "nx",
        "ny",
        F.floor(F.lit(1e6) * energy).cast("long").alias(
            "energy_micro_cents"
        ),
    )


# --------------------------------- Mann-Whitney U + Cliff's delta


@query(
    "stat_mann_whitney_cliffs_delta",
    oracle="""
        WITH x AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   l_returnflag AS f
            FROM lineitem WHERE l_returnflag IN ('R', 'N')
        ), vals AS (
            SELECT v,
                   CAST(COUNT(*) FILTER (f = 'R') AS BIGINT) AS cx,
                   CAST(COUNT(*) FILTER (f = 'N') AS BIGINT) AS cy
            FROM x GROUP BY v
        ), pre AS (
            SELECT v, cx, cy,
                   SUM(cy) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) - cy
                       AS cy_below
            FROM vals
        ), tot AS (
            SELECT CAST(SUM(cx) AS BIGINT) AS nx,
                   CAST(SUM(cy) AS BIGINT) AS ny
            FROM vals
        ), s AS (
            SELECT nx, ny,
                   CAST(SUM(CAST(cx AS DECIMAL(19,0)) * cy_below)
                        AS BIGINT) AS gt,
                   CAST(SUM(CAST(cx AS DECIMAL(19,0))
                            * (ny - cy_below - cy)) AS BIGINT) AS lt,
                   CAST(SUM(CAST(cx AS DECIMAL(19,0)) * cy)
                        AS BIGINT) AS ties
            FROM pre CROSS JOIN tot
            GROUP BY nx, ny
        )
        SELECT nx, ny, gt, lt, ties,
               2 * gt + ties AS u2_x,
               CAST(FLOOR(1e6 * (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                          / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
                    AS BIGINT) AS cliffs_delta_micro
        FROM s
    """,
    description="Mann-Whitney U and Cliff's delta for returned (R) vs "
    "delivered (N) lineitem prices — the effect-size companion the "
    "rank-sum lane (Kruskal-Wallis) lacks: gt/lt/ties are the exact "
    "pairwise dominance counts #(x>y)/#(x<y)/#(x=y), computed from "
    "the value-spine strictly-below cumulative (never pair "
    "enumeration), U in doubled units (2U = 2*gt + ties) stays "
    "integer, and delta = (gt-lt)/(nx*ny) is the only double, "
    "floored at 1e-6. Everything before the final row is exact "
    "integer arithmetic — hash-stable by construction. Scale: one "
    "group-by to the bounded cents spine; one spine window.",
)
def stat_mann_whitney_cliffs_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    vals = (
        x.select(
            (dec("l_extendedprice") * 100).cast("long").alias("v"),
            "l_returnflag",
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cx"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cy"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pre = vals.select(
        "v",
        "cx",
        "cy",
        (F.sum("cy").over(w) - F.col("cy")).alias("cy_below"),
    )
    tot = vals.agg(
        F.sum("cx").cast("long").alias("nx"),
        F.sum("cy").cast("long").alias("ny"),
    )
    cx_dec = F.col("cx").cast("decimal(19,0)")
    s = (
        pre.crossJoin(F.broadcast(tot))
        .groupBy("nx", "ny")
        .agg(
            F.sum(cx_dec * F.col("cy_below")).cast("long").alias("gt"),
            F.sum(
                cx_dec * (F.col("ny") - F.col("cy_below") - F.col("cy"))
            )
            .cast("long")
            .alias("lt"),
            F.sum(cx_dec * F.col("cy")).cast("long").alias("ties"),
        )
    )
    delta = (F.col("gt").cast("double") - F.col("lt").cast("double")) / (
        F.col("nx").cast("double") * F.col("ny").cast("double")
    )
    return s.select(
        "nx",
        "ny",
        "gt",
        "lt",
        "ties",
        (2 * F.col("gt") + F.col("ties")).alias("u2_x"),
        F.floor(F.lit(1e6) * delta).cast("long").alias(
            "cliffs_delta_micro"
        ),
    )


# ------------------------------------- Friedman blocked-rank test


@query(
    "stats_friedman_blocked_ranks",
    oracle="""
        WITH cell AS (
            SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
                       + EXTRACT(month FROM o_orderdate) - 1 AS m,
                   o_orderpriority AS pri,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1, 2
        ), complete AS (
            SELECT m FROM cell GROUP BY m HAVING COUNT(*) = 5
        ), ranked AS (
            SELECT c.m, c.pri,
                   2 * RANK() OVER (PARTITION BY c.m ORDER BY c.rev)
                       + CAST(COUNT(*) OVER (PARTITION BY c.m, c.rev)
                              AS BIGINT) - 1 AS r2
            FROM cell c JOIN complete USING (m)
        ), rsum AS (
            SELECT pri,
                   CAST(SUM(r2) AS BIGINT) AS r2_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM ranked GROUP BY pri
        ), q AS (
            SELECT MAX(n_blocks) AS n_blocks,
                   CAST(FLOOR(1e6 * (
                       CAST(SUM(CAST(r2_sum AS DECIMAL(19,0)) * r2_sum)
                            AS DOUBLE)
                       / (10.0 * CAST(MAX(n_blocks) AS DOUBLE))
                       - 18.0 * CAST(MAX(n_blocks) AS DOUBLE)))
                   AS BIGINT) AS q_micro
            FROM rsum
        )
        SELECT r.pri, r.r2_sum, q.n_blocks, q.q_micro
        FROM rsum r CROSS JOIN q
        ORDER BY r.pri
    """,
    description="Friedman test across the 5 order priorities blocked "
    "by month (monthly revenue as the blocked response, complete "
    "blocks only): within-block midranks kept INTEGER in doubled "
    "units (2*avg-rank = 2*RANK() + ties - 1), rank sums exact, and "
    "the k=5 statistic Q = sum(R^2)/(10n) - 18n (uncorrected-for-"
    "ties form on midranks, documented) is one shared double "
    "expression floored at 1e-6. Completes the k-sample lane next "
    "to Kruskal-Wallis (unblocked) with the repeated-measures "
    "design. Scale: one group-by to the bounded (month x priority) "
    "panel; the rank window partitions on month (5 rows each).",
)
def stats_friedman_blocked_ranks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(
        (
            (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
        ).alias("m"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.sum(dec("o_totalprice") * 100).cast("long").alias("rev"))
    complete = (
        cell.groupBy("m").count().where(F.col("count") == 5).select("m")
    )
    ranked = cell.join(complete, "m").select(
        "m",
        "pri",
        (
            2 * F.rank().over(Window.partitionBy("m").orderBy("rev"))
            + F.count(F.lit(1))
            .over(Window.partitionBy("m", "rev"))
            .cast("long")
            - 1
        ).alias("r2"),
    )
    rsum = ranked.groupBy("pri").agg(
        F.sum("r2").cast("long").alias("r2_sum"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    qrow = rsum.agg(
        F.max("n_blocks").alias("n_blocks"),
        F.floor(
            F.lit(1e6)
            * (
                F.sum(
                    F.col("r2_sum").cast("decimal(19,0)") * F.col("r2_sum")
                ).cast("double")
                / (F.lit(10.0) * F.max("n_blocks").cast("double"))
                - F.lit(18.0) * F.max("n_blocks").cast("double")
            )
        )
        .cast("long")
        .alias("q_micro"),
    )
    return (
        rsum.select("pri", "r2_sum")
        .crossJoin(F.broadcast(qrow))
        .orderBy("pri")
    )
